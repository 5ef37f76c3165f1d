"""k-min-mer canonicalization, shift and seqlen semantics."""

import numpy as np

from rust_mdbg_tpu.ops.kminmer import (
    canonicalize_jax, fingerprint128_jax, fingerprint128_np, window_kminmers_np,
)


def test_normalize_semantics():
    # vec < rev -> keep, not reversed
    pos = np.arange(5) * 10
    h = np.array([1, 2, 3, 9, 9], dtype=np.uint64)
    w = window_kminmers_np(pos, h, 4, 10)
    assert len(w) == 2
    assert w[0]["vec"] == (1, 2, 3, 9) and not w[0]["reversed"]
    # palindrome reports reversed=True (kmer_vec.rs:34-39: not (self < rev))
    h2 = np.array([5, 7, 7, 5, 1], dtype=np.uint64)
    w2 = window_kminmers_np(pos, h2, 4, 10)
    assert w2[0]["vec"] == (5, 7, 7, 5) and w2[0]["reversed"]


def test_strict_greater_than_k_guard():
    pos = np.arange(4) * 5
    h = np.array([4, 3, 2, 1], dtype=np.uint64)
    assert window_kminmers_np(pos, h, 4, 10) == []  # len == k -> nothing
    assert len(window_kminmers_np(np.arange(5) * 5, np.arange(5).astype(np.uint64), 4, 10)) == 2


def test_shift_and_seqlen():
    pos = np.array([0, 7, 15, 30], dtype=np.int64)
    h = np.array([10, 20, 30, 5], dtype=np.uint64)
    l, k = 10, 3
    w = window_kminmers_np(pos, h, k, l)
    # window 0: vec (10,20,30) < rev (30,20,10) -> fwd; shift=(7-0, 15-7)
    assert w[0]["shift"] == (7, 8)
    assert w[0]["start"] == 0 and w[0]["end"] == 15 + l
    assert w[0]["seqlen"] == 15 - 0 + 2  # main.rs:778 rule
    # window 1: vec (20,30,5) vs rev (5,30,20): rev < vec -> reversed; swap
    assert w[1]["reversed"]
    assert w[1]["shift"] == (30 - 15, 15 - 7)


def test_fingerprint_order_dependent_and_jax_parity():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    v = rng.integers(0, 2**63, (20, 7)).astype(np.uint64)
    f = fingerprint128_np(v)
    f_rev = fingerprint128_np(v[:, ::-1])
    assert not np.any((f == f_rev).all(axis=-1))
    fj = np.asarray(fingerprint128_jax(jnp.asarray(v)))
    assert np.array_equal(f, fj)


def test_canonicalize_jax_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    v = rng.integers(0, 5, (64, 5)).astype(np.uint64)  # small alphabet: palindromes occur
    canon, rev = canonicalize_jax(jnp.asarray(v))
    canon, rev = np.asarray(canon), np.asarray(rev)
    for i in range(v.shape[0]):
        t = tuple(int(x) for x in v[i])
        r = t[::-1]
        expect_rev = not (t < r)
        expect = r if expect_rev else t
        assert bool(rev[i]) == expect_rev
        assert tuple(int(x) for x in canon[i]) == expect
