"""Fused device extraction: packed base codes -> k-min-mer windows (JAX/XLA).

This is the TPU replacement for the reference's per-read worker hot loops
(Read::extract_density read.rs:176-211 + the windowing loop main.rs:756-781):
one jit-compiled function over a [B, L] uint8 batch that performs

  HPC compaction -> ntHash (closed form, constant rotations) -> density
  selection -> cumsum/scatter compaction -> k-windowing -> canonicalization
  -> shifts/offsets -> 128-bit fingerprints

entirely on device with static shapes.  All loop-carried recurrences of the
reference are re-expressed as elementwise ops + cumsum + two scatters, so XLA
fuses the per-base work into a handful of passes; see ops/pallas_kernels.py
for the hand-fused single-pass variant of the hash/select stage.

Outputs are padded [B, W] tensors + validity masks; the host wrapper flattens
them into the engine-agnostic WindowBatch contract (core/extract.py).
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.seq import BASE_CODE


def _device_extract(codes, lengths, *, l, k, hash_bound, M, already_hpc,
                    use_pallas=False):
    import jax.numpy as jnp

    from .hpc import hpc_jax, _scatter2d
    from .kminmer import canonicalize_jax, fingerprint128_jax
    from .nthash import nthash_windows_jax

    B, L = codes.shape
    idx = jnp.arange(L, dtype=jnp.int32)

    if already_hpc:
        hpc_codes = codes
        pos_map = jnp.broadcast_to(idx[None, :], (B, L)).astype(jnp.int32)
        hpc_len = lengths
    else:
        hpc_codes, pos_map, hpc_len = hpc_jax(codes, lengths)

    # hash + select
    if use_pallas:
        from .pallas_kernels import nthash_select_pallas

        canon, sel = nthash_select_pallas(hpc_codes, l, hash_bound)
        sel = sel & (idx[None, :] + l <= hpc_len[:, None])
    else:
        fh, rh = nthash_windows_jax(hpc_codes, l)
        canon = jnp.minimum(fh, rh)
        valid = idx[None, :] + l <= hpc_len[:, None]
        sel = (canon <= jnp.uint64(hash_bound)) & valid

    # compact selected minimizers to [B, M]
    slot = jnp.cumsum(sel.astype(jnp.int32), axis=1) - 1
    n_min_raw = jnp.where(sel.any(axis=1), slot[:, -1] + 1, 0).astype(jnp.int32)
    overflow = n_min_raw > M
    n_min = jnp.minimum(n_min_raw, M)
    rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, L))
    keep = sel & (slot < M)
    minim_hash = _scatter2d(
        jnp.zeros((B, M), dtype=jnp.uint64), rows,
        jnp.minimum(slot, M - 1), canon, keep,
    )
    minim_pos = _scatter2d(
        jnp.zeros((B, M), dtype=jnp.int32), rows,
        jnp.minimum(slot, M - 1), pos_map, keep,
    )

    # k-min-mer windows [B, W, k]
    W = M - k + 1
    vecs = jnp.stack([minim_hash[:, j : j + W] for j in range(k)], axis=-1)
    wpos = jnp.stack([minim_pos[:, j : j + W] for j in range(k)], axis=-1)
    widx = jnp.arange(W, dtype=jnp.int32)
    valid_w = (n_min[:, None] > k) & (widx[None, :] < n_min[:, None] - k + 1)

    canon_vecs, reversed_ = canonicalize_jax(vecs)
    d_first = (wpos[..., 1] - wpos[..., 0]).astype(jnp.int32)
    d_last = (wpos[..., k - 1] - wpos[..., k - 2]).astype(jnp.int32)
    shift0 = jnp.where(reversed_, d_last, d_first)
    shift1 = jnp.where(reversed_, d_first, d_last)
    seqlen = (wpos[..., k - 1] - wpos[..., 0] + 2).astype(jnp.int32)
    start = wpos[..., 0]
    end = wpos[..., k - 1] + l
    fp = fingerprint128_jax(canon_vecs)

    return dict(
        key_lo=fp[..., 0], key_hi=fp[..., 1], vecs=canon_vecs,
        reversed_=reversed_, shift0=shift0, shift1=shift1, seqlen=seqlen,
        start=start, end=end, valid_w=valid_w,
        minim_hash=minim_hash, minim_pos=minim_pos, n_min=n_min,
        overflow=overflow,
    )


class DeviceExtractor:
    """Engine wrapper: ReadBatch -> WindowBatch via the jitted device fn.

    Reads whose minimizer count exceeds the compacted capacity M (rare;
    flagged by the kernel) are re-extracted with the host engine to preserve
    exactness.
    """

    def __init__(self, params, use_pallas: bool = False):
        import jax

        self.params = params
        self.use_pallas = use_pallas
        self._fns: dict[tuple, object] = {}
        self._jax = jax

    def _fn(self, B, L, M):
        key = (B, L, M)
        if key not in self._fns:
            p = self.params
            self._fns[key] = self._jax.jit(
                functools.partial(
                    _device_extract, l=p.l, k=p.k, hash_bound=p.hash_bound,
                    M=M, already_hpc=p.reads_already_hpc,
                    use_pallas=self.use_pallas,
                )
            )
        return self._fns[key]

    def capacity(self, L: int) -> int:
        p = self.params
        if p.max_minimizers_per_read > 0:
            return p.max_minimizers_per_read
        # canonical hash = min(fh, rh): selection rate ~ 2*density (read.rs:183
        # bound applied to the min of two ~uniform hashes), 3x headroom on top
        expect = L * p.density * 2 if not p.use_syncmers else L * 0.2
        m = int(max(p.k + 33, expect * 3))
        return (m + 31) & ~31

    def __call__(self, batch):
        from ..core.extract import WindowBatch, extract_windows_host

        p = self.params
        B, L = batch.codes.shape
        M = self.capacity(L)
        out = self._fn(B, L, M)(batch.codes, batch.lengths)
        out = {k: np.asarray(v) for k, v in out.items()}

        valid = out["valid_w"]
        # host fallback rows: capacity overflow
        overflow_rows = np.nonzero(out["overflow"])[0]
        if overflow_rows.size:
            valid = valid.copy()
            valid[overflow_rows] = False

        rows, wins = np.nonzero(valid)
        wb = WindowBatch(
            key_lo=out["key_lo"][rows, wins],
            key_hi=out["key_hi"][rows, wins],
            seqlen=out["seqlen"][rows, wins].astype(np.uint32),
            shift0=out["shift0"][rows, wins].astype(np.uint16),
            shift1=out["shift1"][rows, wins].astype(np.uint16),
            reversed_=out["reversed_"][rows, wins],
            read_row=rows.astype(np.int32),
            start=out["start"][rows, wins].astype(np.int64),
            end=out["end"][rows, wins].astype(np.int64),
            vecs=out["vecs"][rows, wins],
            minimizers=[
                (
                    out["minim_pos"][b, : out["n_min"][b]].astype(np.int64),
                    out["minim_hash"][b, : out["n_min"][b]],
                )
                if batch.lengths[b] > 0
                else None
                for b in range(B)
            ],
        )
        if overflow_rows.size:
            wb = _merge_host_rows(wb, batch, overflow_rows, p)
        return wb


def _merge_host_rows(wb, batch, rows, params):
    """Re-extract overflow rows on host and splice them in, preserving the
    deterministic (read_row, window) order.

    The device batch has NO windows for the overflow rows (masked out), and
    both pieces are internally sorted by (read_row, window), so a stable sort
    on read_row alone restores the global order."""
    from ..core.extract import WindowBatch, extract_windows_host

    class _View:
        codes = batch.codes[rows]
        lengths = batch.lengths[rows]
        ids = [batch.ids[r] for r in rows]
        raw = [batch.raw[r] for r in rows] if batch.raw else []
        start_index = batch.start_index

    hb = extract_windows_host(_View, params)
    hb_rows = rows[hb.read_row].astype(np.int32)
    order = np.argsort(np.concatenate([wb.read_row, hb_rows]), kind="stable")

    def cat(a, b):
        return np.concatenate([a, b])[order]

    minims = list(wb.minimizers)
    for i, r in enumerate(rows):
        minims[r] = hb.minimizers[i]
    return WindowBatch(
        key_lo=cat(wb.key_lo, hb.key_lo), key_hi=cat(wb.key_hi, hb.key_hi),
        seqlen=cat(wb.seqlen, hb.seqlen), shift0=cat(wb.shift0, hb.shift0),
        shift1=cat(wb.shift1, hb.shift1),
        reversed_=cat(wb.reversed_, hb.reversed_),
        read_row=cat(wb.read_row, hb_rows),
        start=cat(wb.start, hb.start), end=cat(wb.end, hb.end),
        vecs=np.concatenate([wb.vecs, hb.vecs])[order],
        minimizers=minims,
    )


def make_device_extractor(params):
    if params.use_syncmers or params.uhs or params.lcp or params.has_lmer_counts \
            or params.error_correct:
        # schemes with host-side tables/filters run on the host engine for now
        raise NotImplementedError("device engine supports the density scheme")
    return DeviceExtractor(params, use_pallas=(params.engine == "pallas"))
