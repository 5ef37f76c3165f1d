"""Minimizer scheme tests: density rule, syncmers, hash bound cast."""

import numpy as np

from rust_mdbg_tpu.ops.minimizers import (
    extract_density_np, extract_syncmers_np, invertible_hash, invertible_hash_np,
)
from rust_mdbg_tpu.ops.nthash import nthash_windows_np
from rust_mdbg_tpu.ops.hpc import encode_rle_np
from rust_mdbg_tpu.params import Params
from rust_mdbg_tpu.utils.seq import encode_bases

RNG = np.random.default_rng(11)


def rand_seq(n):
    return "".join("ACGT"[i] for i in RNG.integers(0, 4, n))


def test_hash_bound_matches_rust_cast():
    # ((d as f64) * (u64::MAX as f64)) as u64 : u64::MAX as f64 == 2^64
    p = Params(density=0.0008)
    assert p.hash_bound == int(0.0008 * 2.0**64)
    p = Params(density=1.0)
    assert p.hash_bound == 2**64 - 1  # saturating cast


def test_density_selection_rule():
    s = rand_seq(5000)
    codes = encode_bases(s)
    p = Params(l=10, density=0.01)
    pos, hashes = extract_density_np(codes, 10, p.hash_bound)
    # every selected hash obeys the bound; every position is a HPC run start
    assert (hashes <= np.uint64(p.hash_bound)).all()
    hpc, pmap = encode_rle_np(codes)
    fh, rh = nthash_windows_np(hpc, 10)
    canon = np.minimum(fh, rh)
    sel = np.nonzero(canon <= np.uint64(p.hash_bound))[0]
    assert np.array_equal(pos, pmap[sel])
    assert np.array_equal(hashes, canon[sel])
    # ratio roughly equals density
    assert 0.002 < len(pos) / len(canon) < 0.05


def test_density_skiphpc_positions():
    s = "AAACGTACGTAAACCCGGG" * 20
    codes = encode_bases(s)
    pos_hpc, h1 = extract_density_np(codes, 5, 2**62, already_hpc=True)
    # in skiphpc mode positions index the raw string directly
    hpc, pmap = encode_rle_np(codes)
    fh, rh = nthash_windows_np(codes, 5)
    canon = np.minimum(fh, rh)
    sel = np.nonzero(canon <= np.uint64(2**62))[0]
    assert np.array_equal(pos_hpc, sel)


def test_short_read_empty():
    pos, h = extract_density_np(encode_bases("ACGT"), 10, 2**63)
    assert len(pos) == 0 and len(h) == 0


def test_invertible_hash_vectorized_matches_scalar():
    mask = (1 << 24) - 1
    keys = RNG.integers(0, mask + 1, 100)
    vec = invertible_hash_np(keys.astype(np.uint64), mask)
    for k, v in zip(keys, vec):
        assert invertible_hash(int(k), mask) == int(v)


def test_syncmers_basic():
    s = rand_seq(2000)
    codes = encode_bases(s)
    p = Params(l=10, s=4, density=0.1, use_syncmers=True)
    pos, hashes = extract_syncmers_np(codes, 10, 4, p.syncmer_hash_bound)
    assert (np.diff(pos) > 0).all()
    assert (hashes <= np.uint64(p.syncmer_hash_bound)).all()
    # deterministic
    pos2, hashes2 = extract_syncmers_np(codes, 10, 4, p.syncmer_hash_bound)
    assert np.array_equal(pos, pos2) and np.array_equal(hashes, hashes2)


def test_syncmers_oracle_queue():
    """Compare against an independent direct simulation of the reference's
    queue including its path-dependent tie-breaking (read.rs:215-352)."""
    l, s = 8, 3
    bound = (1 << (2 * l)) - 1  # accept all
    seq = rand_seq(400)
    codes = encode_bases(seq)
    pos, hashes = extract_syncmers_np(codes, l, s, bound, already_hpc=True)

    # oracle: sequential simulation
    smask = (1 << (2 * s)) - 1
    lmask = (1 << (2 * l)) - 1
    t = int(np.ceil((l - s + 1) / 2))
    xl = [0, 0]
    xs = [0, 0]
    lp = 0
    q = []
    qp = []
    minv, minp = 2**64 - 1, -1
    got = []
    for i, c in enumerate(codes):
        c = int(c)
        if c >= 4:
            xl = [0, 0]; xs = [0, 0]; lp = 0; q = []; qp = []
            minv, minp = 2**64 - 1, -1
            continue
        xl[0] = ((xl[0] << 2) | c) & lmask
        xl[1] = (xl[1] >> 2) | ((3 - c) << (2 * (l - 1)))
        xs[0] = ((xs[0] << 2) | c) & smask
        xs[1] = (xs[1] >> 2) | ((3 - c) << (2 * (s - 1)))
        lp += 1
        if lp < s:
            continue
        hs = invertible_hash(min(xs[0], xs[1]), smask)
        if len(q) < l - s:
            q.append(hs); qp.append(i - s + 1)
            continue
        if len(q) == l - s:
            q.append(hs); qp.append(i - s + 1)
            for j in range(len(q)):
                if q[j] < minv:
                    minv, minp = q[j], qp[j]
        else:
            popped = qp.pop(0); q.pop(0)
            q.append(hs); qp.append(i - s + 1)
            if minp == popped:
                minv, minp = 2**64 - 1, i - s + 1
                for j in range(len(q) - 1, -1, -1):
                    if q[j] < minv:
                        minv, minp = q[j], qp[j]
            elif hs < minv:
                minv, minp = hs, i - s + 1
        if minp == qp[t - 1]:
            hl = invertible_hash(min(xl[0], xl[1]), lmask)
            if hl <= bound:
                got.append((i - l + 1, hl))
    assert [(int(p), int(h)) for p, h in zip(pos, hashes)] == got
