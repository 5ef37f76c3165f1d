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
