"""Homopolymer compression (HPC) with raw-position maps.

Parity target: `Read::encode_rle` (/root/reference/src/read.rs:157-174):
a char is dropped iff it equals the previous char AND is in "ACTGactgNn";
the kept position map records the raw index of each run start.

Vector form: keep[i] = (i == 0) | (s[i] != s[i-1]) | (s[i] not in HPC set).
With base codes (A..T,N in the set; code 5 = other, never compresses) this is a
shifted-compare + cumsum compaction — no sequential scan.
"""

from __future__ import annotations

import numpy as np


def hpc_mask_np(codes: np.ndarray) -> np.ndarray:
    """Boolean keep-mask over a 1-D base-code array."""
    n = codes.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    keep = np.empty(n, dtype=bool)
    keep[0] = True
    keep[1:] = codes[1:] != codes[:-1]
    keep |= codes == 5  # non-HPC characters never compress
    return keep


def encode_rle_np(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(hpc_codes, pos_map): compacted codes + raw index of each kept char."""
    keep = hpc_mask_np(codes)
    pos = np.nonzero(keep)[0]
    return codes[pos], pos


def hpc_jax(codes, lengths):
    """Batched HPC compaction on device.

    codes: uint8 [B, L] (padded); lengths: int32 [B].
    Returns (hpc_codes [B, L], pos_map int32 [B, L], hpc_len int32 [B]).
    Padding positions hold code 4 (N) and pos_map L-1 (clamped), masked downstream
    by hpc_len; static shapes throughout.
    """
    import jax.numpy as jnp

    B, L = codes.shape
    idx = jnp.arange(L, dtype=jnp.int32)
    valid = idx[None, :] < lengths[:, None]
    prev = jnp.pad(codes[:, :-1], ((0, 0), (1, 0)), constant_values=255)
    keep = ((codes != prev) | (codes == 5)) & valid
    # target slot for each kept char
    slot = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    hpc_len = jnp.where(keep.any(axis=1), slot[:, -1] + 1, 0).astype(jnp.int32)
    slot = jnp.where(keep, slot, L - 1)  # dump dropped chars onto the last slot
    rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, L))
    hpc_codes = jnp.full((B, L), 4, dtype=codes.dtype)
    pos_map = jnp.full((B, L), L - 1, dtype=jnp.int32)
    hpc_codes = _scatter2d(hpc_codes, rows, slot, codes, keep)
    pos_map = _scatter2d(
        pos_map, rows, slot,
        jnp.broadcast_to(idx[None, :], (B, L)).astype(jnp.int32), keep,
    )
    return hpc_codes, pos_map, hpc_len


def _scatter2d(base, rows, cols, vals, mask):
    """base[rows, cols] = vals where mask, without boolean gather (static shapes)."""
    import jax.numpy as jnp

    B, L = base.shape
    # route masked-out updates to an out-of-bounds column -> dropped
    cols = jnp.where(mask, cols, L)
    return base.at[rows, cols].set(vals, mode="drop")
