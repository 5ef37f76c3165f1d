"""Fuzz the pipeline against the test-only reference transliteration oracle.

tests/ref_oracle.py re-expresses the reference's windowing + add_kminmer
control flow literally (citations therein); here random read sets — errors,
reverse-complement strands, homopolymers, Ns, length edge cases — go through
BOTH the oracle and the real pipeline, asserting identical .sequences record
content and GFA node content (keyed by minimizer vector; indices are
id-invariant by design, see PARITY.md).
"""

import os

import numpy as np
import pytest

from rust_mdbg_tpu.core.pipeline import assemble
from rust_mdbg_tpu.io.sequences import iter_sequences
from rust_mdbg_tpu.params import Params

from ref_oracle import oracle_assemble


def synth_reads(rng, n_reads, genome_bp=20000, read_len=(60, 400),
                err=0.01, homopolymer=True, n_frac=0.002):
    """Reads off a random genome: both strands, substitution errors,
    homopolymer stretches (HPC stress), occasional Ns."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    bases = "ACGT"
    g = []
    i = 0
    while i < genome_bp:
        c = bases[rng.integers(0, 4)]
        run = int(rng.integers(1, 6)) if homopolymer and rng.random() < 0.1 \
            else 1
        g.append(c * run)
        i += run
    genome = "".join(g)[:genome_bp]
    reads = []
    for _ in range(n_reads):
        ln = int(rng.integers(read_len[0], read_len[1]))
        s = int(rng.integers(0, max(1, len(genome) - ln)))
        r = list(genome[s : s + ln])
        for j in range(len(r)):
            p = rng.random()
            if p < err:
                r[j] = bases[rng.integers(0, 4)]
            elif p < err + n_frac:
                r[j] = "N"
        r = "".join(r)
        if rng.random() < 0.5:
            r = "".join(comp[c] for c in reversed(r))
        reads.append(r)
    return reads


def write_fasta(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")


def node_content(prefix, params):
    """{vec: (seq, shift, LN, KC)} from .sequences + GFA."""
    gfa_meta = {}
    for line in open(prefix + ".gfa"):
        if line.startswith("S"):
            v = line.rstrip().split("\t")
            gfa_meta[int(v[1])] = (int(v[2 + 1][5:]), int(v[2 + 2][5:]))
    out = {}
    for r in iter_sequences(prefix):
        ln, kc = gfa_meta[r["index"]]
        out[tuple(r["minimizers"])] = (r["seq"], tuple(r["shift"]), ln, kc)
    assert len(gfa_meta) == len(out), "GFA nodes without .sequences records"
    return out


def oracle_content(table):
    out = {}
    for vec, (seq, shift) in table.records.items():
        e = table.entries[vec]
        if e[1] < table.minab:
            continue  # crossed --bf-less minab=1 entries below filter: n/a
        out[vec] = (seq, tuple(shift), e[2], e[1])
    return out


CONFIGS = [
    # exact=True fuzzes the DEFAULT .sequences semantics (full-HPC-extent
    # spans, ops/hpc.extent_ends_np) against the oracle's independent
    # derivation; exact=False pins seq_ref_cuts byte-parity with the literal
    # reference transliteration.  Both are identical when already_hpc.
    dict(min_abundance=1, use_bf=False, already_hpc=False, exact=True),
    dict(min_abundance=1, use_bf=False, already_hpc=False, exact=False),
    dict(min_abundance=2, use_bf=False, already_hpc=False, exact=True),
    dict(min_abundance=2, use_bf=True, already_hpc=False, exact=False),
    dict(min_abundance=2, use_bf=True, already_hpc=False, exact=True),
    dict(min_abundance=3, use_bf=False, already_hpc=True, exact=True),
    dict(min_abundance=3, use_bf=True, already_hpc=False, exact=True),
]


@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=[f"m{c['min_abundance']}"
                              f"{'bf' if c['use_bf'] else ''}"
                              f"{'hpc' if c['already_hpc'] else ''}"
                              f"{'' if c['exact'] else 'ref'}"
                              for c in CONFIGS])
def test_fuzz_host_vs_oracle(tmp_path, cfg):
    rng = np.random.default_rng(11 + cfg["min_abundance"]
                                + 7 * cfg["use_bf"])
    reads = synth_reads(rng, 3000, genome_bp=15000, read_len=(8, 320))
    path = str(tmp_path / "r.fa")
    write_fasta(path, reads)
    k, l, d = 4, 10, 0.02
    table = oracle_assemble(reads, k=k, l=l, density=d,
                            bloom_log2_bits=24,
                            min_abundance=cfg["min_abundance"],
                            use_bf=cfg["use_bf"],
                            already_hpc=cfg["already_hpc"],
                            exact_cuts=cfg["exact"])
    p = Params(k=k, l=l, density=d, engine="host",
               min_kmer_abundance=cfg["min_abundance"],
               use_bf=cfg["use_bf"], bloom_log2_bits=24,
               reads_already_hpc=cfg["already_hpc"],
               seq_ref_cuts=not cfg["exact"])
    prefix = str(tmp_path / "out")
    assemble(path, p, prefix)
    want = oracle_content(table)
    assert want, "degenerate fuzz input: oracle produced no nodes"
    assert node_content(prefix, p) == want


@pytest.mark.parametrize("engine,chunk,exact",
                         [("device", 0, True), ("device", 0, False),
                          ("device", 512, True), ("device", 512, False)])
def test_fuzz_device_vs_oracle(tmp_path, engine, chunk, exact):
    """Same fuzz through the device sort/segment counter and the chunked
    host-merge driver (forced multi-chunk), in both cut modes."""
    rng = np.random.default_rng(99)
    reads = synth_reads(rng, 2000, genome_bp=12000, read_len=(8, 300))
    path = str(tmp_path / "r.fa")
    write_fasta(path, reads)
    k, l, d = 4, 10, 0.02
    table = oracle_assemble(reads, k=k, l=l, density=d, min_abundance=2,
                            exact_cuts=exact)
    p = Params(k=k, l=l, density=d, engine=engine, min_kmer_abundance=2,
               chunk_reads=chunk, batch_reads=256, seq_ref_cuts=not exact)
    prefix = str(tmp_path / "out")
    assemble(path, p, prefix)
    assert node_content(prefix, p) == oracle_content(table)


def test_fuzz_100k_reads(tmp_path):
    """The >= 1e5-read CI bar: 100k reads, errors + both strands + Ns,
    against the oracle (host engine)."""
    rng = np.random.default_rng(5)
    reads = synth_reads(rng, 100_000, genome_bp=60_000, read_len=(40, 220),
                        err=0.005)
    path = str(tmp_path / "big.fa")
    write_fasta(path, reads)
    k, l, d = 3, 9, 0.015
    table = oracle_assemble(reads, k=k, l=l, density=d, min_abundance=2,
                            exact_cuts=True)
    p = Params(k=k, l=l, density=d, engine="host", min_kmer_abundance=2)
    prefix = str(tmp_path / "out")
    assemble(path, p, prefix)
    got = node_content(prefix, p)
    want = oracle_content(table)
    assert len(want) > 500
    assert got == want
