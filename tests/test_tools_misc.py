"""Small tools + filtered-scheme extraction semantics."""

import numpy as np

from rust_mdbg_tpu.models.schemes import CheckAndAddFilter, uhs_preparation
from rust_mdbg_tpu.ops.minimizers import extract_filtered_np
from rust_mdbg_tpu.ops.nthash import ntc64
from rust_mdbg_tpu.tools.hpc_compress import gfa_strip, hpc_compress
from rust_mdbg_tpu.utils.seq import encode_bases


def test_hpc_compress(tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_text(">a\nAAACCCGGGTTTN\n>b\nACGT\n")
    out = tmp_path / "out.fa"
    hpc_compress(str(fa), str(out))
    txt = out.read_text()
    assert ">a\nACGTN\n" in txt
    assert ">b\nACGT\n" in txt


def test_gfa_strip(tmp_path):
    g = tmp_path / "g.gfa"
    g.write_text("H\tVN:Z:1.0\nS\tx\tACGTACGT\tKC:i:5\nL\tx\t+\tx\t-\t2M\n")
    out = tmp_path / "s.gfa"
    gfa_strip(str(g), str(out))
    lines = out.read_text().splitlines()
    assert lines[1] == "S\tx\t*\tLN:i:8\tKC:i:5"
    assert lines[2].startswith("L\t")


def test_check_and_add_filter():
    f = CheckAndAddFilter()
    assert f.check_and_add(7) is False
    assert f.check_and_add(7) is True
    f.add(9)
    assert f.check_and_add(9) is True


def test_uhs_preparation_and_extraction(tmp_path):
    from rust_mdbg_tpu.params import Params

    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    p = Params(l=8, density=0.2)
    codes = encode_bases(seq)

    # filter preloaded with every l-mer of the read: every selected minimizer
    # passes on FIRST sight (hash already present)
    f = CheckAndAddFilter()
    for i in range(len(seq) - 8 + 1):
        f.add(ntc64(seq[i : i + 8], 8))
    pos, h = extract_filtered_np(codes, 8, p.hash_bound, f)
    from rust_mdbg_tpu.ops.minimizers import extract_density_np

    pos_d, h_d = extract_density_np(codes, 8, p.hash_bound)
    # filtered selection is a subset of density selection with HPC-space
    # positions (read.rs:151-152 pushes i, not the raw map)
    assert set(int(x) for x in h) <= set(int(x) for x in h_d)
    assert len(h) > 0

    # empty filter: keep-from-second-occurrence semantics
    f2 = CheckAndAddFilter()
    pos2, h2 = extract_filtered_np(codes, 8, p.hash_bound, f2)
    seen = set()
    expect = []
    for x in h_d:  # density selections in HPC order == same canon hashes
        if int(x) in seen:
            expect.append(int(x))
        seen.add(int(x))
    assert [int(x) for x in h2] == expect


def test_uhs_file_loader(tmp_path):
    f = tmp_path / "u.txt"
    f.write_text("ACGTACGTAC\nTTTTTTTTTT\nshort\n")

    class P:
        l = 10

    filt = uhs_preparation(P, str(f))
    assert filt.check_and_add(ntc64("ACGTACGTAC", 10)) is True
    assert filt.check_and_add(12345) is False


def test_cli_missing_input_friendly_error(capsys):
    from rust_mdbg_tpu.cli import main

    rc = main(["/nonexistent/reads.fa", "-k", "7", "-l", "10",
               "--density", "0.01"])
    assert rc == 2
    assert "not found" in capsys.readouterr().err


def test_uhs_bloom_divergence_quantified():
    """Quantifies PARITY divergence #6: the reference's 1-hash Bloom UHS
    filter admits first-seen non-UHS minimizers at ~load-factor rate; the
    exact filter admits none.  At a (scaled) load matching the reference's
    worst realistic case, the bloom run's extra selections match the
    predicted FP rate and every exact selection survives (no false
    negatives)."""
    import math

    import numpy as np

    from rust_mdbg_tpu.models.schemes import (BloomCheckAndAddFilter,
                                              CheckAndAddFilter)
    from rust_mdbg_tpu.ops.minimizers import extract_filtered_np

    rng = np.random.default_rng(5)
    l = 10
    # synthetic UHS: 6% of hash space marked universal
    uhs_hashes = set(int(h) for h in
                     rng.integers(0, 1 << 62, 4000, dtype=np.uint64))
    log2_bits = 16
    m = 1 << log2_bits

    def make_pair():
        exact, bloom = CheckAndAddFilter(), BloomCheckAndAddFilter(log2_bits)
        for h in uhs_hashes:
            exact.add(h)
            bloom.add(h)
        return exact, bloom

    exact_f, bloom_f = make_pair()
    load = sum(1 for b in np.unpackbits(bloom_f._bits) if b) / m
    fp_pred = load  # 1-hash bloom: FP prob == fraction of set bits

    codes = rng.integers(0, 4, 200_000).astype(np.uint8)
    bound = (1 << 64) - 1  # density 1.0: every l-mer queried
    pos_e, _ = extract_filtered_np(codes, l, bound, exact_f)
    pos_b, _ = extract_filtered_np(codes, l, bound, bloom_f)
    # no false negatives: every exact selection is in the bloom selection
    assert set(pos_e.tolist()) <= set(pos_b.tolist())
    extra = len(pos_b) - len(pos_e)
    n_queries = len(codes) - l + 1
    rate = extra / n_queries
    # FP-admitted first occurrences + their later repeats keep rate near
    # fp_pred; allow generous statistical slack
    assert 0.2 * fp_pred < rate < 3.0 * fp_pred, (rate, fp_pred)
    print(f"bloom load {load:.3f} -> extra-minimizer rate {rate:.4f}")
