"""Pallas TPU kernels for the mdBG hot loop.

`nthash_select_pallas`: fused canonical ntHash + density selection over a
packed base-code batch — the reference's per-base hot loop (read.rs:196-209)
as a single VMEM pass.

Design notes (see /opt/skills/guides/pallas_guide.md):
- u64 hashes are carried as explicit (hi, lo) u32 pairs: v5e has no native
  64-bit lanes, and hand-splitting keeps every op a plain VPU u32 op instead
  of XLA's emulation round trips.
- the closed form fh(i) = XOR_j rotl(SEED[c[i+j]], l-1-j) uses only CONSTANT
  rotations, so each of the l terms is (const-rotate pair, static column
  slice, xor) — fully unrolled, no loop-carried state, no variable shifts.
- grid = (B/BR, L/BC) with a 128-column halo on the input block so windows
  crossing the block edge read their tail without a second pass; outputs are
  halo-free aligned blocks.
"""

from __future__ import annotations

import functools

import numpy as np

from .nthash import H_BY_CODE, RC_BY_CODE

BR = 8     # rows per block (sublane dim of the u32 compute tiles)
BC = 512   # compute columns per block
HALO = 128 # >= l-1, keeps the lane dim a multiple of 128


def _rotl_pair(hi, lo, r):
    r &= 63
    if r == 0:
        return hi, lo
    if r == 32:
        return lo, hi
    if r < 32:
        nhi = (hi << r) | (lo >> (32 - r))
        nlo = (lo << r) | (hi >> (32 - r))
        return nhi, nlo
    r -= 32
    nhi = (lo << r) | (hi >> (32 - r))
    nlo = (hi << r) | (lo >> (32 - r))
    return nhi, nlo


def _seed_lookup(c, table):
    """codes int32 -> (hi, lo) u32 via a chain of selects (6 codes)."""
    import jax.numpy as jnp

    hi = jnp.zeros_like(c, dtype=jnp.uint32)
    lo = jnp.zeros_like(c, dtype=jnp.uint32)
    for code in range(4):  # codes 4,5 hash to 0
        v = int(table[code])
        hi = jnp.where(c == code, np.uint32(v >> 32), hi)
        lo = jnp.where(c == code, np.uint32(v & 0xFFFFFFFF), lo)
    return hi, lo


def _kernel(codes_ref, next_ref, lengths_ref, canon_hi_ref, canon_lo_ref,
            sel_ref, *, l, bound_hi, bound_lo):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    # [BR, 2*BC]: this block + the next (clamped at the row end); windows that
    # would read past the true read length are masked below
    c = jnp.concatenate(
        [codes_ref[...], next_ref[...]], axis=1
    ).astype(jnp.int32)
    h_hi, h_lo = _seed_lookup(c, H_BY_CODE)
    r_hi, r_lo = _seed_lookup(c, RC_BY_CODE)

    fh_hi = jnp.zeros((BR, BC), dtype=jnp.uint32)
    fh_lo = jnp.zeros((BR, BC), dtype=jnp.uint32)
    rh_hi = jnp.zeros((BR, BC), dtype=jnp.uint32)
    rh_lo = jnp.zeros((BR, BC), dtype=jnp.uint32)
    for j in range(l):
        thi, tlo = _rotl_pair(h_hi, h_lo, l - 1 - j)
        fh_hi = fh_hi ^ thi[:, j : j + BC]
        fh_lo = fh_lo ^ tlo[:, j : j + BC]
        thi, tlo = _rotl_pair(r_hi, r_lo, j)
        rh_hi = rh_hi ^ thi[:, j : j + BC]
        rh_lo = rh_lo ^ tlo[:, j : j + BC]

    f_lt_r = (fh_hi < rh_hi) | ((fh_hi == rh_hi) & (fh_lo < rh_lo))
    c_hi = jnp.where(f_lt_r, fh_hi, rh_hi)
    c_lo = jnp.where(f_lt_r, fh_lo, rh_lo)
    canon_hi_ref[...] = c_hi
    canon_lo_ref[...] = c_lo

    # density rule + end-of-read validity
    bh = np.uint32(bound_hi)
    bl = np.uint32(bound_lo)
    le_bound = (c_hi < bh) | ((c_hi == bh) & (c_lo <= bl))
    jcol = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 1) + jcol * BC
    valid = col + l <= lengths_ref[...]            # [BR, 1] broadcast
    sel_ref[...] = (le_bound & valid).astype(jnp.uint8)


def nthash_select_pallas(codes, l: int, hash_bound: int, lengths=None,
                         interpret=None):
    """(canon u64 [B, L], sel bool [B, L]) via the fused kernel.

    B must be a multiple of 8 and L a multiple of 512 (callers pad; fastx
    batching already rounds L).  When `lengths` is None every full window
    within L is considered valid.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L = codes.shape
    assert B % BR == 0 and L % BC == 0, (B, L)
    if lengths is None:
        lengths = jnp.full((B,), L, dtype=jnp.int32)
    lengths2d = lengths.reshape(B, 1).astype(jnp.int32)

    nj = L // BC
    grid = (B // BR, nj)
    kernel = functools.partial(
        _kernel, l=l,
        bound_hi=(hash_bound >> 32) & 0xFFFFFFFF,
        bound_lo=hash_bound & 0xFFFFFFFF,
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    canon_hi, canon_lo, sel = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BR, BC), lambda i, j: (i, j)),
            pl.BlockSpec(
                (BR, BC),
                lambda i, j: (
                    i, jnp.minimum(j + jnp.int32(1), jnp.int32(nj - 1))
                ),
            ),
            pl.BlockSpec((BR, 1), lambda i, j: (i, jnp.int32(0))),
        ],
        out_specs=[
            pl.BlockSpec((BR, BC), lambda i, j: (i, j)),
            pl.BlockSpec((BR, BC), lambda i, j: (i, j)),
            pl.BlockSpec((BR, BC), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L), jnp.uint32),
            jax.ShapeDtypeStruct((B, L), jnp.uint32),
            jax.ShapeDtypeStruct((B, L), jnp.uint8),
        ],
    )(codes, codes, lengths2d)
    canon = canon_lo.astype(jnp.uint64) | (canon_hi.astype(jnp.uint64) << 32)
    return canon, sel.astype(bool)
