"""to_basespace + magic_simplify end-to-end on the example dataset.

The example reads are error-free 23kb substrings of dmel chr4 100k-200k, so the
final contig is checkable: every internal unitig junction must be exactly or
near-exactly stitched (the reference's cut rule, to_basespace.rs:213-224, is
approximate in raw space by design — its overlaps are 'very approximately
calculated'), and the single contig must cover ~97% of the 100kb region.
"""

import pytest

from rust_mdbg_tpu.core.pipeline import assemble
from rust_mdbg_tpu.io.fastx import read_records
from rust_mdbg_tpu.params import Params
from rust_mdbg_tpu.tools.magic_simplify import magic_simplify
from rust_mdbg_tpu.utils.seq import revcomp


@pytest.fixture(scope="module")
def simplified(tmp_path_factory):
    prefix = str(tmp_path_factory.mktemp("tb") / "ex")
    p = Params(k=7, l=10, density=0.0008, min_kmer_abundance=2, engine="host")
    assemble("/root/reference/example/reads-0.00.fa.gz", p, prefix)
    fa = magic_simplify(prefix)
    return prefix, fa


def test_single_contig_covers_region(simplified):
    prefix, fa = simplified
    contigs = []
    cur = []
    for line in open(fa):
        if line.startswith(">"):
            if cur:
                contigs.append("".join(cur))
            cur = []
        else:
            cur.append(line.strip())
    contigs.append("".join(cur))
    assert len(contigs) == 1
    assert 90000 < len(contigs[0]) < 105000


def test_contig_is_exact(simplified):
    """EVERY sliding 500bp window of the contig appears verbatim in some
    read: the default full-HPC-extent record spans (ops/hpc.extent_ends_np)
    make the to_basespace cut rule exact on raw inputs, where the
    reference's pos+l spans leave junctions a few bases off whenever a
    boundary l-mer crosses a homopolymer run (round-4 verdict item #2)."""
    prefix, fa = simplified
    contig = "".join(
        l.strip() for l in open(fa) if not l.startswith(">")
    )
    reads = [s.decode() for _, s in
             read_records("/root/reference/example/reads-0.00.fa.gz")]
    blob = " ".join(reads) + " " + " ".join(revcomp(r) for r in reads)
    hits = 0
    total = 0
    for i in range(0, len(contig) - 500, 499):
        total += 1
        if contig[i : i + 500] in blob:
            hits += 1
    assert hits == total, f"only {hits}/{total} windows exact"


def test_msimpl_gfa_has_sequences(simplified):
    prefix, _ = simplified
    for line in open(prefix + ".msimpl.gfa"):
        if line.startswith("S"):
            v = line.split("\t")
            assert v[2] != "*" and set(v[2]) <= set("ACGTN")
            assert "mc:f:" in line  # mean abundance tag (to_basespace.rs:288)
            break


def test_exact_junctions_mode_is_invariant(simplified, tmp_path):
    """--exact-junctions (anchor-matching cross-check) must now be a no-op:
    the default shift-cut path is itself exact, so the two modes produce the
    identical contig (round-4 verdict item #2 'Done' criterion)."""
    import shutil

    from rust_mdbg_tpu.tools.gfa import Gfa
    from rust_mdbg_tpu.tools.gfa_asm import unitigs as _unitigs
    from rust_mdbg_tpu.tools.gfa_break_loops import break_loops
    from rust_mdbg_tpu.tools.gfa_asm import run_ops
    from rust_mdbg_tpu.tools.magic_simplify import ROUND1
    from rust_mdbg_tpu.tools.to_basespace import to_basespace

    prefix, _ = simplified
    g = run_ops(Gfa.parse(prefix + ".gfa"), ROUND1, verbose=False)
    tmp1 = str(tmp_path / "t1.gfa")
    g.write(tmp1)
    tmp2 = str(tmp_path / "t2.gfa")
    break_loops(tmp1, tmp2)
    out = to_basespace(tmp2, prefix, out_path=str(tmp_path / "exact.gfa"),
                       exact=True)
    contig = None
    for line in open(out):
        if line.startswith("S"):
            contig = line.split("\t")[2]
            break
    assert contig and len(contig) > 90000
    reads = [s.decode() for s, in
             ((s,) for _, s in read_records(
                 "/root/reference/example/reads-0.00.fa.gz"))]
    blob = " ".join(reads) + " " + " ".join(revcomp(r) for r in reads)
    total = hits = 0
    for i in range(0, len(contig) - 500, 997):
        total += 1
        if contig[i : i + 500] in blob:
            hits += 1
    assert hits == total, f"{hits}/{total} exact windows"
    # invariance: the default (shift-cut) contig equals the anchor-refined
    # one — the refinement has nothing left to refine
    default_contig = "".join(
        l.strip() for l in open(simplified[1]) if not l.startswith(">"))
    assert contig in (default_contig, revcomp(default_contig))
