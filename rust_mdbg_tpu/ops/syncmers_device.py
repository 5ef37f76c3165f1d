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
    # each step is a handful of [B]-wide selects.  Production engine: Pallas
    # kernel with the scan on the minor axis (register-speed steps,
    # ops/pallas_kernels.incumbent_scan_pallas); oracle/fallback: lax.scan
    # over the window axis with a [B] int32 carry (~2 s per [512, 50k]
    # batch — the scan-step dispatch overhead, not the vector work).
    import os

    if os.environ.get("MDBG_SYNCMER_PALLAS", "1") != "0":
        from .pallas_kernels import incumbent_scan_pallas

        incumbent = incumbent_scan_pallas(lpos, rpos, run_start, strict_new)
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
