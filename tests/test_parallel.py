"""Multi-chip sharded counting == single-host node table, on a virtual mesh."""

import numpy as np
import pytest

import jax

from rust_mdbg_tpu.params import Params
from rust_mdbg_tpu.parallel.mesh import make_mesh
from rust_mdbg_tpu.parallel.sharded import (
    make_sharded_count_step, sharded_counts_to_host,
)


def _random_batch(B, L, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
    # duplicate some rows so k-min-mers repeat across shards
    codes[B // 2 :] = codes[: B - B // 2]
    lengths = np.full((B,), L, dtype=np.int32)
    lengths[1] = L // 2
    return codes, lengths


@pytest.mark.parametrize("n_devices", [4, 8])
def test_sharded_counts_match_host(n_devices):
    assert len(jax.devices()) >= n_devices
    mesh = make_mesh(n_devices)
    p = Params(k=4, l=8, density=0.05)
    B, L, M = 2 * n_devices, 1024, 160
    fn, shardings, _cap = make_sharded_count_step(mesh, p, B, L, M)
    codes, lengths = _random_batch(B, L)
    out = fn(
        jax.device_put(codes, shardings[0]),
        jax.device_put(lengths, shardings[1]),
    )
    assert int(np.asarray(out["dropped"]).sum()) == 0
    assert int(np.asarray(out["overflow"]).sum()) == 0
    got = sharded_counts_to_host(out, n_devices)

    # host oracle
    from rust_mdbg_tpu.core.extract import extract_windows_host

    class _B:
        pass

    b = _B()
    b.codes, b.lengths = codes, lengths
    b.ids = [""] * B
    b.raw = []
    b.start_index = 0
    wb = extract_windows_host(b, p)
    expect: dict = {}
    for lo, hi in zip(wb.key_lo.tolist(), wb.key_hi.tolist()):
        expect[(lo, hi)] = expect.get((lo, hi), 0) + 1
    assert got == expect
    # global ids are a contiguous deterministic range
    bases = np.asarray(out["id_base"]).reshape(-1)
    nuniq = np.asarray(out["n_unique"]).reshape(-1)
    assert bases[0] == 0
    assert np.array_equal(bases[1:], np.cumsum(nuniq)[:-1])
