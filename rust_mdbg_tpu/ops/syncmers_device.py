"""Open-syncmer selection on device (JAX/XLA) — exact parity with the host
state machine in ops/minimizers.extract_syncmers_np (read.rs:215-352).

The reference tracks the sliding-window minimum s-mer with a queue whose
tie-breaking is PATH-DEPENDENT (s-mer hashes are masked to 2s bits, so ties
are common): first full window takes the leftmost minimum; when the incumbent
minimum is evicted the rescan lands on the rightmost minimum; an incoming
equal value never displaces the incumbent.  A naive port would be a
sequential per-position scan over every (read, position) — poison for the
TPU.

Instead we split the recurrence into a heavy data-parallel part and a feather
-weight sequential part.  Writing i_a for the tracked position at window a,
the transition is

    i_a = lpos[a]    if window a is the first full window of an N-free run
          rpos[a]    if i_{a-1} == a-1 (incumbent evicted; the rescan is
                     right-to-left with strict '<', i.e. RIGHTMOST argmin)
                     or hs[a+w-1] < min(window a-1 remainder)  ("strict new";
                     the new element is then the unique minimum = rpos[a])
          i_{a-1}    otherwise

where lpos/rpos are the leftmost/rightmost argmins of each window — O(w)
shifted elementwise passes over [B, L] — and the strict-new flag is one
shifted compare.  Everything data-dependent is precomputed; the remaining
recurrence touches ONE int32 lane per read per step, so it runs as a
`lax.scan` over the window axis with a [B] carry: L cheap vector steps, no
gathers at all.  (A binary-lifting formulation over the eviction chain
r -> rpos[r]+1 is also exact, but its log2(L) rounds of [B, L] arbitrary-index
gathers lower catastrophically inside the fused-construct `fori_loop` on TPU
— ~20 s/batch and worker-crashing at scale — while the scan is ~ms.)

Selection: window a is emitted iff the incumbent sits at window offset t-1
AND the canonical l-mer's invertible hash passes the density bound
(read.rs:217).
"""

from __future__ import annotations

import math


def invertible_hash_jax(key, mask_bits: int):
    """64-bit invertible mix hash (read.rs:43-52) masked to `mask_bits`."""
    import jax.numpy as jnp

    mask = jnp.uint64((1 << mask_bits) - 1)

    def u(x):
        return jnp.uint64(x)

    key = (~key + (key << u(21))) & mask
    key = key ^ (key >> u(24))
    key = (key + (key << u(3)) + (key << u(8))) & mask
    key = key ^ (key >> u(14))
    key = (key + (key << u(2)) + (key << u(4))) & mask
    key = key ^ (key >> u(28))
    key = (key + (key << u(31))) & mask
    return key


def _shl(x, j, fill):
    """x[:, a+j] as an [B, L] array (tail filled)."""
    import jax.numpy as jnp

    if j == 0:
        return x
    B = x.shape[0]
    pad = jnp.full((B, j), fill, dtype=x.dtype)
    return jnp.concatenate([x[:, j:], pad], axis=1)


def _packed_canonical_hash(c, ok_prefix, width: int, hpc_len):
    """Invertible hash of min(2-bit fwd packing, rc packing) of every
    width-window; UINT64_MAX where the window has an N / runs past the end."""
    import jax.numpy as jnp

    B, L = c.shape
    idx = jnp.arange(L, dtype=jnp.int32)
    fwd = jnp.zeros((B, L), dtype=jnp.uint64)
    rev = jnp.zeros((B, L), dtype=jnp.uint64)
    for j in range(width):
        cj = _shl(c, j, 0)
        fwd = (fwd << jnp.uint64(2)) | cj
        rev = rev | ((jnp.uint64(3) - cj) << jnp.uint64(2 * j))
    mask = jnp.uint64((1 << (2 * width)) - 1)
    h = invertible_hash_jax(jnp.minimum(fwd & mask, rev & mask), 2 * width)
    # window valid iff no invalid base in [a, a+width-1] and in-bounds
    nbad = ok_prefix  # inclusive prefix count of invalid bases
    before = jnp.concatenate(
        [jnp.zeros((B, 1), nbad.dtype), nbad[:, :-1]], axis=1)
    upto = _shl(nbad, width - 1, 2**30)
    win_ok = ((upto - before) == 0) & (idx[None, :] + width <= hpc_len[:, None])
    return jnp.where(win_ok, h, ~jnp.uint64(0)), win_ok


def _incumbent_blocked(lpos, rpos, run_start, strict_new, w: int, C: int = 512):
    """Incumbent trace via per-chunk transfer tables — exact, ~100x fewer
    scan steps than the naive per-position scan.

    The incumbent ENTERING column a always lies in the w-wide band
    [a-1, a+w-2] (it is a position inside the previous window; the pre-run
    -inf state behaves identically to a-1, both being < a), and the
    transition touches the value only through the comparison `inc < a`.  So
    a C-column chunk is fully described by a w-entry transfer table:

      pass 1  one lax.scan of C steps over [B, nC, w] — every chunk's table
              for every entry state, in parallel
      pass 2  one lax.scan of nC steps over [B, w] — compose tables along
              the chunk axis (the only truly sequential part)
      pass 3  one lax.scan of C steps over [B, nC] — replay each chunk from
              its now-known true entry state, emitting the trace

    Scan-step count drops from L to 2C + L/C (50k -> ~1.2k at L=50k), which
    removes the per-step dispatch overhead that made the naive scan ~2 s per
    [512, 50k] batch.  Exactness: tests/test_device_extract.py parity
    against the host oracle and the scan engine."""
    import jax
    import jax.numpy as jnp

    B, L = lpos.shape
    nC = -(-L // C)
    Lp = nC * C
    pad = Lp - L

    def prep(x, fill):
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
        # [B, Lp] -> [C, B, nC]: column j of every chunk side by side
        return x.reshape(B, nC, C).transpose(2, 0, 1)

    lp = prep(lpos, 0)
    rp = prep(rpos, 0)
    st = prep(run_start, False)
    sn = prep(strict_new, False)
    bases = jnp.arange(nC, dtype=jnp.int32) * C  # chunk base columns

    def trans(S, lp_j, rp_j, st_j, sn_j, a_j):
        """One column's transition applied to state tensor S (broadcasts
        [B, nC] inputs against trailing state dims of S)."""
        evicted = S < a_j
        take_r = sn_j | evicted
        return jnp.where(st_j, lp_j, jnp.where(take_r, rp_j, S))

    # pass 1: chunk transfer tables for all w entry states
    d = jnp.arange(w, dtype=jnp.int32)
    S0 = (bases[:, None] - 1 + d[None, :])[None]  # [1, nC, w]
    S0 = jnp.broadcast_to(S0, (B, nC, w))

    def p1(S, xs):
        lp_j, rp_j, st_j, sn_j, j = xs
        a = (bases + j)[None, :, None]
        return trans(S, lp_j[..., None], rp_j[..., None],
                     st_j[..., None], sn_j[..., None], a), None

    steps = jnp.arange(C, dtype=jnp.int32)
    T, _ = jax.lax.scan(p1, S0, (lp, rp, st, sn, steps))  # [B, nC, w]

    # pass 2: compose along chunks; entry offset d_c = exit_{c-1} - (c*C - 1)
    def p2(d_c, xs):
        T_c, base = xs  # [B, w], scalar
        exit_c = jnp.take_along_axis(T_c, d_c[:, None], axis=1)[:, 0]
        return exit_c - (base + C - 1), d_c

    d0 = jnp.zeros((B,), jnp.int32)  # -inf == band offset 0
    _, d_of_c = jax.lax.scan(p2, d0, (T.transpose(1, 0, 2), bases))
    d_of_c = d_of_c.transpose(1, 0)  # [B, nC]

    # pass 3: replay with the true entry states, emit the trace
    S_true0 = bases[None, :] - 1 + d_of_c  # [B, nC]

    def p3(S, xs):
        lp_j, rp_j, st_j, sn_j, j = xs
        a = (bases + j)[None, :]
        S = trans(S, lp_j, rp_j, st_j, sn_j, a)
        return S, S

    _, trace = jax.lax.scan(p3, S_true0, (lp, rp, st, sn, steps))
    # [C, B, nC] -> [B, Lp] -> [B, L]
    return trace.transpose(1, 2, 0).reshape(B, Lp)[:, :L]


def syncmer_select_jax(hpc_codes, hpc_len, *, l: int, s: int, bound: int):
    """(canon, sel) over HPC positions: canon[p] = canonical l-mer invertible
    hash, sel[p] = open-syncmer selected (exact host-oracle semantics)."""
    import jax
    import jax.numpy as jnp

    B, L = hpc_codes.shape
    idx = jnp.arange(L, dtype=jnp.int32)
    ok = (hpc_codes < 4) & (idx[None, :] < hpc_len[:, None])
    c = jnp.where(ok, hpc_codes, 0).astype(jnp.uint64)
    ok_prefix = jnp.cumsum((~ok).astype(jnp.int32), axis=1)

    hl, valid_l = _packed_canonical_hash(c, ok_prefix, l, hpc_len)
    passed = hl <= jnp.uint64(bound)
    if s == 0:
        # "kminmer" mode (read.rs:324-339): every N-free l-mer, density only
        return hl, valid_l & passed

    hs, _ = _packed_canonical_hash(c, ok_prefix, s, hpc_len)
    w = l - s + 1
    t = math.ceil(w / 2.0)

    # sliding stats over the w s-mers of each l-mer window
    UMAX = ~jnp.uint64(0)
    best = jnp.full((B, L), UMAX, dtype=jnp.uint64)
    lpos = jnp.zeros((B, L), dtype=jnp.int32)
    rpos = jnp.zeros((B, L), dtype=jnp.int32)
    best_w1 = None  # min over the first w-1 elements
    for j in range(w):
        if j == w - 1:
            best_w1 = best
        hj = _shl(hs, j, UMAX)
        posj = idx[None, :] + j
        lpos = jnp.where(hj < best, posj, lpos)
        rpos = jnp.where(hj <= best, posj, rpos)
        best = jnp.minimum(best, hj)
    last = _shl(hs, w - 1, UMAX)
    strict_new = last < best_w1

    # first window of each N-free run: incumbent = leftmost argmin
    prev_valid = jnp.concatenate(
        [jnp.zeros((B, 1), bool), valid_l[:, :-1]], axis=1)
    run_start = valid_l & ~prev_valid

    # incumbent automaton — every window's jump TARGETS are precomputed, so
    # each step is a handful of [B]-wide selects.  Production engine:
    # blocked transfer-table evaluation (_incumbent_blocked, ~L/C + 2C scan
    # steps); oracle/fallback: lax.scan over the window axis with a [B]
    # int32 carry (~2 s per [512, 50k] batch — the 50k scan steps'
    # dispatch overhead, not the vector work).  MDBG_SYNCMER_ENGINE=
    # scan|blocked overrides.
    import os

    eng = os.environ.get("MDBG_SYNCMER_ENGINE", "blocked")
    if eng == "blocked" and w >= 2:
        incumbent = _incumbent_blocked(lpos, rpos, run_start, strict_new, w)
    else:
        def step(inc, xs):
            a, lp, rp, st, sn = xs
            evicted = inc < a
            inc = jnp.where(st, lp, jnp.where(sn | evicted, rp, inc))
            return inc, inc

        xs = (jnp.arange(L, dtype=jnp.int32), lpos.T, rpos.T,
              run_start.T, strict_new.T)
        inc0 = jnp.full((B,), jnp.int32(-(1 << 30)))
        _, incT = jax.lax.scan(step, inc0, xs)
        incumbent = incT.T

    sel = valid_l & (incumbent == idx[None, :] + (t - 1)) & passed
    return hl, sel
