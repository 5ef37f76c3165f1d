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


def extent_ends_np(codes: np.ndarray, pos: np.ndarray, l: int,
                   already_hpc: bool = False) -> np.ndarray:
    """Raw END of the full HPC extent of each minimizer l-mer.

    `pos` holds raw-sequence starts of selected l-mers (HPC run starts, as
    extract_density_np returns).  The l-mer covers l HPC bases; its raw
    extent ends at the raw start of the NEXT HPC base (= the end of the last
    base's homopolymer run), or at the raw read end when the run reaches it.

    This is the datum the reference's span cut `minimizers_pos[i+k-1] + l`
    (main.rs:778) approximates: +l truncates mid-run whenever the l-mer
    contains homopolymers, which makes to_basespace junctions inexact on raw
    (non-pre-HPC'd) inputs when adjacent nodes were recorded in different
    orientations.  Recording full-extent spans (and end-distance shifts)
    makes the cut rule exact by construction; on already-HPC'd inputs every
    run has length 1, so extent == l and this reduces to pos + l.
    """
    pos = np.asarray(pos, dtype=np.int64)
    if already_hpc:
        return pos + l
    _, pos_map = encode_rle_np(codes)
    ext_map = np.concatenate(
        [pos_map, np.asarray([codes.shape[0]], dtype=pos_map.dtype)])
    hpc_idx = np.searchsorted(pos_map, pos)
    return ext_map[np.minimum(hpc_idx + l, ext_map.shape[0] - 1)]


def hpc_jax(codes, lengths):
    """Batched HPC compaction on device.

    codes: uint8 [B, L] (padded); lengths: int32 [B].
    Returns (hpc_codes [B, L], pos_map int32 [B, L], hpc_len int32 [B]).
    Padding positions hold code 4 (N) and pos_map L-1, masked downstream by
    hpc_len; static shapes throughout.

    Compaction is a per-row sort on (kept ? position : L) — XLA's TPU sort is
    fully vectorized, whereas a scatter at these sizes lowers to a serial
    update loop (~30x slower, measured).
    """
    import jax
    import jax.numpy as jnp

    B, L = codes.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    valid = idx < lengths[:, None]
    prev = jnp.pad(codes[:, :-1], ((0, 0), (1, 0)), constant_values=255)
    keep = ((codes != prev) | (codes == 5)) & valid
    hpc_len = keep.sum(axis=1).astype(jnp.int32)
    key = jnp.where(keep, idx, jnp.int32(L))
    _, s_codes, s_pos = jax.lax.sort((key, codes, idx), num_keys=1, dimension=1)
    tail = idx >= hpc_len[:, None]
    hpc_codes = jnp.where(tail, jnp.uint8(4), s_codes)
    pos_map = jnp.where(tail, jnp.int32(L - 1), s_pos)
    return hpc_codes, pos_map, hpc_len


def _scatter2d(base, rows, cols, vals, mask):
    """base[rows, cols] = vals where mask, without boolean gather (static shapes)."""
    import jax.numpy as jnp

    B, L = base.shape
    # route masked-out updates to an out-of-bounds column -> dropped
    cols = jnp.where(mask, cols, L)
    return base.at[rows, cols].set(vals, mode="drop")
