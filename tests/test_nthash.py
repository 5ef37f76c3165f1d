"""ntHash numerics: rolling consistency, strand symmetry, host/device parity."""

import numpy as np
import pytest

from rust_mdbg_tpu.ops.nthash import (
    H_BY_CODE, RC_BY_CODE, SEED_A, SEED_C, SEED_G, SEED_T,
    nthash_windows_np, ntc64,
)
from rust_mdbg_tpu.utils.seq import encode_bases, revcomp

RNG = np.random.default_rng(42)


def rand_seq(n):
    return "".join("ACGT"[i] for i in RNG.integers(0, 4, n))


def test_single_window_matches_definition():
    # direct evaluation of the published ntHash v1 closed form
    s = "TGCAG"
    codes = encode_bases(s)
    l = 5
    fh = 0
    rh = 0
    for j, c in enumerate(codes):
        r = (l - 1 - j) % 64
        h = int(H_BY_CODE[c])
        fh ^= ((h << r) | (h >> (64 - r))) & (2**64 - 1) if r else h
        rc = int(RC_BY_CODE[c])
        rj = j % 64
        rh ^= ((rc << rj) | (rc >> (64 - rj))) & (2**64 - 1) if rj else rc
    f, r_ = nthash_windows_np(codes, 5)
    assert int(f[0]) == fh and int(r_[0]) == rh


def test_rolling_equals_direct():
    s = rand_seq(200)
    codes = encode_bases(s)
    for l in (5, 10, 12, 31):
        fh, rh = nthash_windows_np(codes, l)
        for i in range(0, len(s) - l + 1, 17):
            f2, r2 = nthash_windows_np(encode_bases(s[i : i + l]), l)
            assert fh[i] == f2[0] and rh[i] == r2[0]


def test_canonical_strand_symmetric():
    s = rand_seq(300)
    rc = revcomp(s)
    for l in (10, 13):
        f1, r1 = nthash_windows_np(encode_bases(s), l)
        f2, r2 = nthash_windows_np(encode_bases(rc), l)
        c1 = np.minimum(f1, r1)
        c2 = np.minimum(f2, r2)
        assert np.array_equal(c1, c2[::-1])
        # fwd of rc == rev of fwd
        assert np.array_equal(f1, r2[::-1])


def test_seeds_are_nthash_v1():
    assert SEED_A == 0x3C8BFBB395C60474
    assert SEED_C == 0x3193C18562A02B4C
    assert SEED_G == 0x20323ED082572324
    assert SEED_T == 0x295549F54BE24456


def test_external_oracle_vector():
    """Published test vector of the `nthash` Rust crate (the exact library
    the reference links against, /root/reference/Cargo.toml:26):
    ntf64(b"TGCAG", 0, 5) == 0x0bafa6728fc6dabf.  TGCAG covers all four
    bases, so this pins every seed constant AND the rotation schedule to the
    external implementation — numerics parity no longer rests only on
    self-consistency (it caught a wrong SEED_C in round 2)."""
    f, r = nthash_windows_np(encode_bases("TGCAG"), 5)
    assert int(f[0]) == 0x0BAFA6728FC6DABF
    # canonical = min(f, r); here forward < reverse
    assert ntc64("TGCAG") == 0x0BAFA6728FC6DABF


def test_external_oracle_vector_reverse():
    """Second published vector of the same crate:
    ntr64(b"TGCAG", 0, 5) == 0x8cf2d4072cca480e.  The reverse-strand hash
    exercises the COMPLEMENT seed lookups and the opposite rotation
    schedule, which the forward vector alone does not pin (a swapped
    rotl/rotr in the reverse recurrence would pass ntf64 and every
    self-consistency test, but not this)."""
    f, r = nthash_windows_np(encode_bases("TGCAG"), 5)
    assert int(r[0]) == 0x8CF2D4072CCA480E


def test_n_hashes_as_zero_seed():
    f1, _ = nthash_windows_np(encode_bases("ANA"), 3)
    # middle N contributes rotl(0, ...) = 0
    fa = int(H_BY_CODE[0])
    expect = (((fa << 2) | (fa >> 62)) & (2**64 - 1)) ^ fa
    assert int(f1[0]) == expect


def test_ntc64_whole_string():
    s = "ACGTACGTAC"
    f, r = nthash_windows_np(encode_bases(s), len(s))
    assert ntc64(s) == int(min(f[0], r[0]))


def test_jax_matches_numpy():
    import jax.numpy as jnp

    from rust_mdbg_tpu.ops.nthash import nthash_windows_jax

    s = rand_seq(257)
    codes = encode_bases(s)
    l = 11
    fh, rh = nthash_windows_np(codes, l)
    fj, rj = nthash_windows_jax(jnp.asarray(codes)[None, :], l)
    m = len(s) - l + 1
    assert np.array_equal(np.asarray(fj)[0, :m], fh)
    assert np.array_equal(np.asarray(rj)[0, :m], rh)
