"""Homopolymer compression parity with encode_rle (read.rs:157-174)."""

import numpy as np

from rust_mdbg_tpu.ops.hpc import encode_rle_np, hpc_jax
from rust_mdbg_tpu.utils.seq import decode_bases, encode_bases


def encode_rle_oracle(s: str):
    """Direct transliteration of the reference's loop semantics for testing."""
    prev = None
    out = []
    pos = []
    prev_i = 0
    for i, c in enumerate(s):
        if c == prev and c in "ACTGactgNn":
            continue
        if prev is not None:
            out.append(prev)
            pos.append(prev_i)
            prev_i = i
        prev = c
    if prev is not None:
        out.append(prev)
        pos.append(prev_i)
    return "".join(out), pos


def test_basic_runs():
    for s in ["AAACCCGGGTTT", "A", "AAAA", "ACGT", "AATTAAATT", "NNNAANN"]:
        hpc, pos = encode_rle_np(encode_bases(s))
        oh, op = encode_rle_oracle(s)
        assert decode_bases(hpc) == oh, s
        assert list(pos) == op, s


def test_positions_are_run_starts():
    s = "AAACCGTTTTA"
    hpc, pos = encode_rle_np(encode_bases(s))
    assert decode_bases(hpc) == "ACGTA"
    assert list(pos) == [0, 3, 5, 6, 10]


def test_random_parity():
    rng = np.random.default_rng(0)
    for _ in range(50):
        s = "".join("ACGTN"[i] for i in rng.integers(0, 5, 200))
        hpc, pos = encode_rle_np(encode_bases(s))
        oh, op = encode_rle_oracle(s)
        assert decode_bases(hpc) == oh
        assert list(pos) == op


def test_empty():
    hpc, pos = encode_rle_np(encode_bases(""))
    assert len(hpc) == 0 and len(pos) == 0


def test_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    B, L = 4, 64
    codes = rng.integers(0, 5, (B, L)).astype(np.uint8)
    lengths = np.array([64, 50, 0, 1], dtype=np.int32)
    hc, pm, hl = hpc_jax(jnp.asarray(codes), jnp.asarray(lengths))
    hc, pm, hl = np.asarray(hc), np.asarray(pm), np.asarray(hl)
    for b in range(B):
        ref_hpc, ref_pos = encode_rle_np(codes[b, : lengths[b]])
        n = len(ref_hpc)
        assert hl[b] == n
        assert np.array_equal(hc[b, :n], ref_hpc)
        assert np.array_equal(pm[b, :n], ref_pos)
