"""2-bit base packing for the host->device feed (ROADMAP H2D item).

Read codes are 0..3 (A/C/T/G), 4 (N) or 5 (pad) — one byte per base on the
wire is 4x more than the information content, and the H2D link is the
scaling bottleneck for chunked construction (PCIe on production hosts, a
~30 MB/s relay in this dev environment).  The feed packs 4 codes/byte plus
a 1 bit/base invalid mask (N or pad; extraction only distinguishes
valid/invalid, and the per-read `lengths` recover the pad boundary), so the
wire cost is 0.375 B/base instead of 1 B/base.

Packing runs on the host (numpy, vectorized shifts) right before
device_put; unpacking runs on device per batch inside the fused construct
loop, so the full-width [chunk, L] byte tensor never exists in HBM either.
"""

from __future__ import annotations

import numpy as np


def pack_codes_np(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[N, L] u8 codes -> (packed [N, L//4] u8, invalid-mask [N, L//8] u8).

    L must be a multiple of 8 (the staging width is always a multiple of
    512).  Invalid positions (code > 3) set the mask bit; their 2-bit plane
    encodes WHICH invalid code: 0 -> N (code 4), 1 -> pad/other (code 5).
    N must round-trip exactly — it is a real base to the HPC rule
    (/root/reference/src/read.rs:163 compresses N runs) while 'other' is
    not, so collapsing the two shifts minimizer positions on any read with
    an NN run."""
    N, L = codes.shape
    assert L % 8 == 0, L
    bad = codes > 3
    c = np.where(bad, (codes != 4).astype(np.uint8), codes).astype(np.uint8)
    packed = (c[:, 0::4] | (c[:, 1::4] << 2) | (c[:, 2::4] << 4)
              | (c[:, 3::4] << 6))
    mask = np.packbits(bad, axis=1, bitorder="little")
    return packed, mask


def unpack_codes_jax(packed, mask):
    """Device inverse of pack_codes_np: -> [B, L] u8 (4 = N, 5 = pad)."""
    import jax.numpy as jnp

    B, L4 = packed.shape
    sh = jnp.arange(4, dtype=jnp.uint8) * jnp.uint8(2)
    codes = ((packed[:, :, None] >> sh[None, None, :]) & jnp.uint8(3))
    codes = codes.reshape(B, L4 * 4)
    bits = jnp.arange(8, dtype=jnp.uint8)
    bad = ((mask[:, :, None] >> bits[None, None, :]) & jnp.uint8(1))
    bad = bad.reshape(B, L4 * 4)
    return jnp.where(bad == 1, jnp.uint8(4) + codes, codes)
