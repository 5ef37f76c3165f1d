"""Device (JAX) extraction engine == host (numpy) oracle, window for window."""

import numpy as np
import pytest

from rust_mdbg_tpu.core.extract import extract_windows_host
from rust_mdbg_tpu.io import fastx
from rust_mdbg_tpu.ops.extract import DeviceExtractor
from rust_mdbg_tpu.params import Params

EXAMPLE = "/root/reference/example/reads-0.00.fa.gz"


def _batches(params, n=2):
    out = []
    for i, b in enumerate(fastx.batches(EXAMPLE, 64, 24 * 1024)):
        out.append(b)
        if i + 1 >= n:
            break
    return out


def assert_wb_equal(a, b):
    assert len(a.key_lo) == len(b.key_lo)
    for f in ("key_lo", "key_hi", "seqlen", "shift0", "shift1", "read_row",
              "start", "end"):
        assert np.array_equal(getattr(a, f), getattr(b, f)), f
    assert np.array_equal(a.reversed_, b.reversed_)
    assert np.array_equal(a.vecs, b.vecs)
    assert len(a.minimizers) == len(b.minimizers)
    for ma, mb in zip(a.minimizers, b.minimizers):
        if ma is None or mb is None:
            assert (ma is None) == (mb is None)
            continue
        assert np.array_equal(ma[0], mb[0])
        assert np.array_equal(ma[1], mb[1])


@pytest.mark.parametrize("density", [0.0008])
def test_device_matches_host_example(density):
    p = Params(k=7, l=10, density=density, engine="device")
    dev = DeviceExtractor(p)
    for batch in _batches(p):
        wb_h = extract_windows_host(batch, p)
        wb_d = dev(batch)
        assert_wb_equal(wb_h, wb_d)
        assert wb_h.n_windows > 0


def test_device_overflow_fallback():
    # force tiny capacity so every read overflows -> host fallback must kick in
    p = Params(k=3, l=10, density=0.01, engine="device",
               max_minimizers_per_read=32)
    dev = DeviceExtractor(p)
    batch = _batches(p, 1)[0]
    wb_h = extract_windows_host(batch, p)
    wb_d = dev(batch)
    assert_wb_equal(wb_h, wb_d)


def test_device_skiphpc():
    p = Params(k=5, l=12, density=0.004, engine="device",
               reads_already_hpc=True)
    dev = DeviceExtractor(p)
    batch = _batches(p, 1)[0]
    assert_wb_equal(extract_windows_host(batch, p), dev(batch))


def test_device_full_pipeline_matches_host(tmp_path):
    from rust_mdbg_tpu.core.pipeline import assemble

    pa = str(tmp_path / "host")
    pb = str(tmp_path / "dev")
    ph = Params(k=7, l=10, density=0.0008, min_kmer_abundance=2, engine="host")
    pd = ph.replace(engine="device")
    assemble(EXAMPLE, ph, pa)
    assemble(EXAMPLE, pd, pb)
    assert open(pa + ".gfa").read() == open(pb + ".gfa").read()
    from rust_mdbg_tpu.io.sequences import iter_sequences

    # record ORDER is not part of the contract (the reference's is
    # thread-arrival nondeterministic, main.rs:696-707; to_basespace globs
    # and indexes by node name) — compare per-node content
    key = lambda r: r["index"]  # noqa: E731
    ra = sorted(iter_sequences(pa), key=key)
    rb = sorted(iter_sequences(pb), key=key)
    assert ra == rb


class _RandBatch:
    """Minimal ReadBatch stand-in for synthetic code arrays."""

    def __init__(self, codes, lengths):
        self.codes = codes
        self.lengths = lengths
        self.ids = [f"r{i}" for i in range(len(lengths))]
        self.raw = []
        self.start_index = 0


def _rand_batch(rng, B=24, L=1024, n_rate=0.01):
    codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
    codes[rng.random((B, L)) < n_rate] = 4  # N bases break runs
    lengths = rng.integers(L // 3, L + 1, B).astype(np.int32)
    lengths[0] = 0          # empty row
    lengths[1] = 5          # shorter than l
    for b in range(B):
        codes[b, lengths[b]:] = 5
    return _RandBatch(codes, lengths)


def test_device_syncmers_matches_host_example():
    p = Params(k=5, l=10, s=4, density=0.05, use_syncmers=True,
               engine="device")
    dev = DeviceExtractor(p)
    saw = 0
    for batch in _batches(p):
        wb_h = extract_windows_host(batch, p)
        wb_d = dev(batch)
        assert_wb_equal(wb_h, wb_d)
        saw += wb_h.n_windows
    assert saw > 0


@pytest.mark.parametrize("l,s,density", [
    (10, 4, 0.05),   # reference defaults
    (12, 2, 0.2),    # 4-bit s-mer hashes: massive ties stress the
                     # path-dependent incumbent chain
    (8, 7, 0.1),     # w = 2: eviction every other step
    (10, 0, 0.01),   # s=0 "kminmer" mode: every N-free l-mer
])
def test_device_syncmers_matches_host_random(l, s, density):
    rng = np.random.default_rng(l * 100 + s)
    p = Params(k=4, l=l, s=s, density=density, use_syncmers=True,
               engine="device")
    dev = DeviceExtractor(p)
    batch = _rand_batch(rng)
    wb_h = extract_windows_host(batch, p)
    wb_d = dev(batch)
    assert_wb_equal(wb_h, wb_d)
    assert wb_h.n_windows > 0


def test_device_syncmers_full_pipeline(tmp_path):
    """Device-table pipeline == host engine end-to-end under --syncmers."""
    from rust_mdbg_tpu.core.pipeline import assemble

    pa = str(tmp_path / "host")
    pb = str(tmp_path / "dev")
    ph = Params(k=5, l=10, s=4, density=0.05, use_syncmers=True,
                min_kmer_abundance=2, engine="host")
    sa = assemble(EXAMPLE, ph, pa)
    sb = assemble(EXAMPLE, ph.replace(engine="device"), pb)
    assert sa["nb_nodes"] == sb["nb_nodes"] > 0
    assert open(pa + ".gfa").read() == open(pb + ".gfa").read()


@pytest.mark.parametrize("l,s", [(10, 4), (12, 2), (8, 7)])
def test_syncmer_blocked_incumbent_matches_scan(monkeypatch, l, s):
    """The blocked transfer-table incumbent engine == the lax.scan oracle,
    bit for bit, on random inputs including N runs and ragged lengths
    (reference automaton read.rs:215-352).  Sizes deliberately not chunk
    (C=512) multiples; includes L < C and L >> C."""
    import jax.numpy as jnp

    from rust_mdbg_tpu.ops.syncmers_device import syncmer_select_jax

    rng = np.random.default_rng(99)
    for B, L in ((24, 300), (8, 1700)):
        codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
        codes[rng.random((B, L)) < 0.02] = 4  # N bases -> run restarts
        lens = rng.integers(40, L + 1, B).astype(np.int32)

        outs = {}
        for mode in ("scan", "blocked"):
            monkeypatch.setenv("MDBG_SYNCMER_ENGINE", mode)
            canon, sel = syncmer_select_jax(
                jnp.asarray(codes), jnp.asarray(lens), l=l, s=s,
                bound=(1 << 20) * 40)
            outs[mode] = (np.asarray(canon), np.asarray(sel))
        assert np.array_equal(outs["scan"][0], outs["blocked"][0])
        assert np.array_equal(outs["scan"][1], outs["blocked"][1])
        assert outs["scan"][1].any()
