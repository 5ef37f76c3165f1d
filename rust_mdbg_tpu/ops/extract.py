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


def _device_extract(codes, lengths, *tables, l, k, hash_bound, M, already_hpc,
                    use_pallas=False, compact_output=False,
                    count_output=False, syncmer=None, lmer=False,
                    filter_mode=None, filter_bloom=False, ref_cuts=False):
    import jax.numpy as jnp

    from .hpc import hpc_jax, _scatter2d
    from .kminmer import canonicalize_jax, fingerprint128_jax
    from .nthash import nthash_windows_jax

    # optional scheme tables (traced args; see make_device_extractor):
    #   lmer:         (sorted packed-lmer keys u64 [T], remap values u64 [T])
    #   filter_mode:  exact mode (preload u64 [P] sorted, seen base u64 [S]
    #                 sorted MAX-padded, delta u64 [D] sorted MAX-padded) —
    #                 UHS/LCP check_and_add state; bloom mode
    #                 (bits u32 [m/32],) — the --bf filter's bit tensor
    ti = 0
    if lmer:
        lmer_keys, lmer_vals = tables[ti], tables[ti + 1]
        ti += 2
    if filter_mode is not None:
        if filter_bloom:
            f_bits = tables[ti]
        else:
            f_preload, f_seen, f_delta = (tables[ti], tables[ti + 1],
                                          tables[ti + 2])

    B, L = codes.shape
    idx = jnp.arange(L, dtype=jnp.int32)

    if already_hpc:
        hpc_codes = codes
        pos_map = jnp.broadcast_to(idx[None, :], (B, L)).astype(jnp.int32)
        hpc_len = lengths
    else:
        hpc_codes, pos_map, hpc_len = hpc_jax(codes, lengths)
    if filter_mode is not None:
        # reference quirk (read.rs:119-120,151-152): UHS/LCP extraction pushes
        # the HPC-space index as the position, not the raw-position map
        pos_map = jnp.broadcast_to(idx[None, :], (B, L)).astype(jnp.int32)
    # full-HPC-extent end map for exact .sequences record spans (the device
    # twin of ops/hpc.extent_ends_np): pme[b, j] = raw start of HPC base j+l
    # (the extent end of the l-mer at HPC index j), or the raw read length
    # when the l-mer runs to the read end.  Not needed when hashing space ==
    # sequence space (already_hpc / UHS-LCP quirk) — there pos + l is exact.
    want_ext = not (already_hpc or filter_mode is not None or ref_cuts)
    if want_ext:
        in_range = (idx[None, :] + l) < hpc_len[:, None]
        shifted = jnp.concatenate(
            [pos_map[:, l:], jnp.zeros((B, l), dtype=pos_map.dtype)], axis=1)
        pme = jnp.where(in_range, shifted, lengths[:, None])
    else:
        pme = pos_map + l

    # hash + select
    import jax

    if syncmer is not None:
        from .syncmers_device import syncmer_select_jax

        s_mini, sync_bound = syncmer
        canon, sel = syncmer_select_jax(hpc_codes, hpc_len, l=l, s=s_mini,
                                        bound=sync_bound)
    elif use_pallas and B % 8 == 0 and L % 512 == 0:
        from .pallas_kernels import nthash_select_pallas

        canon, sel = nthash_select_pallas(hpc_codes, l, hash_bound, hpc_len)
    else:
        fh, rh = nthash_windows_jax(hpc_codes, l)
        canon = jnp.minimum(fh, rh)
        valid = idx[None, :] + l <= hpc_len[:, None]
        sel = (canon <= jnp.uint64(hash_bound)) & valid

    fstate_out = None
    if lmer:
        # robust-minimizer remap (read.rs:200-204 / extract_density_np):
        # l-mer must be a key of minimizer_to_int; hash becomes its value.
        # Lookup key = base-8 packed FORWARD l-mer (codes 0..5 kept distinct,
        # so N/other l-mers can never match a table of ACGT keys) against a
        # sorted device table — one searchsorted + gather per position.
        pk = _packed_lmers(hpc_codes, l)
        q = pk.reshape(-1)
        tix = jnp.clip(jnp.searchsorted(lmer_keys, q), 0,
                       lmer_keys.shape[0] - 1)
        found = (lmer_keys[tix] == q).reshape(B, L)
        sel = sel & found
        canon = jnp.where(found, lmer_vals[tix].reshape(B, L), canon)
    if filter_mode is not None:
        if filter_bloom:
            sel, new_bits = _stream_filter_bloom(
                canon, sel, hpc_codes, f_bits,
                l=l, skip_n=(filter_mode == "lcp"))
            # same fstate tuple arity as the exact path; bloom never
            # overflows and needs no counter
            fstate_out = (new_bits, jnp.int32(0), jnp.zeros((), bool))
        else:
            sel, fstate_out = _stream_filter(
                canon, sel, hpc_codes, f_preload, f_seen, f_delta,
                l=l, skip_n=(filter_mode == "lcp"))

    # compact selected minimizers to [B, M] with a TWO-LEVEL sort: per-512
    # chunk sorts (bitonic cost grows ~log^2 width: 45 passes at 512 vs 120
    # at 24576) keep the first C slots per chunk, then one narrow
    # [B, nchunk*C] sort closes the inter-chunk gaps.  Same result as the
    # full-width sort at ~40% the cost; chunk overflow (> C selected in one
    # 512 window) is folded into the per-read overflow flag (host fallback).
    # (Carrying the hash planes through the sorts as payload was tried and
    # measured SLOWER than the take_along_axis gathers below.)
    n_min_raw = sel.sum(axis=1).astype(jnp.int32)
    n_min = jnp.minimum(n_min_raw, M)
    if L % 512 == 0 and L > 2048:
        C = _chunk_slot_capacity(hash_bound)
        nch = L // 512
        # u16 keys/payloads when positions fit (L < 2^16): the bitonic
        # passes move half the bytes of the i32 variant
        pdt = jnp.uint16 if L < (1 << 16) else jnp.int32
        iot = jax.lax.broadcasted_iota(pdt, (B * nch, 512), 1)
        selc = sel.reshape(B * nch, 512)
        # single-operand sort: the key IS the chunk-local position, so the
        # global position is recovered post-sort by adding the (per-row
        # constant) chunk base — no payload operand, half the bitonic bytes
        ck = jnp.where(selc, iot, pdt(512))
        sck = jax.lax.sort(ck, dimension=1)
        base = ((jnp.arange(B * nch, dtype=jnp.int32) % nch)
                .astype(pdt))[:, None] * pdt(512)
        cval = jnp.where(sck == pdt(512), pdt(L), sck + base)
        # re-sort carries only the first C slots per chunk
        lvl2 = cval[:, :C].reshape(B, nch * C)
        l2s = jax.lax.sort(lvl2, dimension=1)
        if nch * C < M:
            l2s = jnp.concatenate(
                [l2s, jnp.full((B, M - nch * C), L, dtype=pdt)], axis=1)
        perm_m = jnp.minimum(l2s[:, :M].astype(jnp.int32), L - 1)
        # chunk overflow: selected count in some chunk exceeded C
        chunk_over = (selc.sum(axis=1, dtype=jnp.int32) > C).reshape(
            B, nch).any(axis=1)
        overflow = (n_min_raw > M) | chunk_over
    else:
        iot = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        skey = jnp.where(sel, iot, jnp.int32(L))
        # the key IS the position: no payload operand needed
        perm_m = jnp.minimum(jax.lax.sort(skey, dimension=1)[:, :M], L - 1)
        overflow = n_min_raw > M
    miot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    in_range = miot < n_min[:, None]
    minim_hash = jnp.where(in_range, jnp.take_along_axis(canon, perm_m, axis=1),
                           jnp.uint64(0))
    minim_pos = jnp.where(in_range, jnp.take_along_axis(pos_map, perm_m, axis=1),
                          jnp.int32(0))
    minim_end = jnp.where(in_range, jnp.take_along_axis(pme, perm_m, axis=1),
                          jnp.int32(0))

    if count_output:
        # Counting path: per-window 128-bit canonical fingerprints computed
        # in O(1) per window from prefix sums over the compacted minimizer
        # row (see ops/kminmer.poly_fp_tables) — no [B, W, k] window tensor
        # is ever materialized.  Invalid windows get the all-ones sentinel
        # key so the sort-based counter drops them.  Per-window metadata
        # (shift/seqlen/rev) is reconstructed from (mh, mp) at finalize.
        keys = _window_keys_poly(minim_hash, k, M)
        Wn = M - k + 1
        widx = jnp.arange(Wn, dtype=jnp.int32)
        valid_w = (n_min[:, None] > k) & (widx[None, :] < n_min[:, None] - k + 1)
        sentinel = ~jnp.uint64(0)
        keys = jnp.where(valid_w[..., None], keys, sentinel)
        # per-read valid-window count (windows are a prefix): feeds the
        # batch-slot compaction in ops/sort_count.make_fused_construct
        nw = jnp.where(n_min > k, n_min - k + 1, 0).astype(jnp.int32)
        out = dict(keys=keys, mh=minim_hash, mp=minim_pos, nw=nw,
                   overflow=overflow)
        if want_ext:
            # extent-end rows for exact record spans (ops/sort_count gathers
            # the crossing occurrence's boundary extents from these)
            out["mpe"] = minim_end
        if fstate_out is not None:
            out["fstate"] = fstate_out
        return out

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
    # exact record-span end + .sequences cut pair from boundary l-mer
    # extents (== end / shift pair whenever pme is pos + l)
    wend_prev = minim_end[:, k - 2 : k - 2 + W]
    wend_last = minim_end[:, k - 1 : k - 1 + W]
    d_last_e = (wend_last - wend_prev).astype(jnp.int32)
    seq_shift0 = jnp.where(reversed_, d_last_e, d_first)
    seq_shift1 = jnp.where(reversed_, d_first, d_last_e)
    end_ext = wend_last
    fp = fingerprint128_jax(canon_vecs)

    if not compact_output:
        out = dict(
            key_lo=fp[..., 0], key_hi=fp[..., 1], vecs=canon_vecs,
            reversed_=reversed_, shift0=shift0, shift1=shift1, seqlen=seqlen,
            start=start, end=end, end_ext=end_ext,
            seq_shift0=seq_shift0, seq_shift1=seq_shift1, valid_w=valid_w,
            minim_hash=minim_hash, minim_pos=minim_pos, n_min=n_min,
            overflow=overflow,
        )
        if fstate_out is not None:
            out["fstate"] = fstate_out
        return out

    # Compact path: minimize device->host bytes (the axon tunnel runs at tens
    # of MB/s, so the fetch — not compute — bounds single-chip throughput).
    # keys:  [B, W, 2] uint64
    # meta:  [B, W, 4] uint32 = (seqlen, shift0 | valid<<31, shift1 | rev<<31,
    #        start); end is derivable: end = start + seqlen + l - 2.
    # vecs / minim arrays stay on device; crossing rows are gathered later.
    def clean(x):
        # invalid windows can carry negative deltas (padding positions);
        # zero them so packed high bits stay trustworthy
        return jnp.where(valid_w, x, 0).astype(jnp.uint32)

    cols = [
        clean(seqlen),
        clean(shift0) | (valid_w.astype(jnp.uint32) << 31),
        clean(shift1) | (reversed_.astype(jnp.uint32) << 31),
        clean(start),
    ]
    if want_ext:
        # 5th column: exact-cut corrections packed as
        # (end_ext - end) << 16 | (d_last_e - d_last + 0x8000) — both small
        # by construction (homopolymer-run excess of one l-mer); a >u16/s16
        # value would need a >64 KB homopolymer run inside one l-mer, folded
        # into the per-read overflow flag (exact host fallback) if it ever
        # happens
        ext_delta = (end_ext - end).astype(jnp.int32)
        de1 = d_last_e - d_last
        bad = ((ext_delta > 0xFFFF) | (de1 > 0x7FFF) | (de1 < -0x8000)) \
            & valid_w
        overflow = overflow | bad.any(axis=1)
        extpack = ((clean(jnp.minimum(ext_delta, 0xFFFF)) << 16)
                   | clean(jnp.clip(de1 + 0x8000, 0, 0xFFFF)))
        cols.append(extpack)
    meta = jnp.stack(cols, axis=-1)
    out = dict(
        keys=fp, meta=meta, vecs=canon_vecs,
        minim_hash=minim_hash, minim_pos=minim_pos, n_min=n_min,
        overflow=overflow,
    )
    if fstate_out is not None:
        out["fstate"] = fstate_out
    return out


def _packed_lmers(hpc_codes, l: int):
    """Base-8 packed forward l-mer starting at each position: [B, L] u64.

    3 bits/base keeps codes 0..5 (A C G T N other) distinct, so packing is a
    bijection on l-mers for l <= 21; positions within l-1 of the row end pack
    trailing padding codes but are masked invalid by the caller's selection.
    """
    import jax.numpy as jnp

    # clamp 5 ('other') to 4 ('N'): the host lookup key is decode_bases(),
    # whose CODE_BASE table renders both as 'N'
    c64 = jnp.minimum(hpc_codes.astype(jnp.uint64), jnp.uint64(4))
    pk = jnp.zeros_like(c64)
    for j in range(l):
        plane = c64[:, j:] if j else c64
        if j:
            plane = jnp.pad(plane, ((0, 0), (0, j)), constant_values=4)
        pk = pk | (plane << jnp.uint64(3 * (l - 1 - j)))
    return pk


def _filter_skip_n(sel, hpc_codes, l: int):
    """extract_lcp skips minimizers whose l-mer contains a non-ACGT code
    (read.rs:115: contains('N'))."""
    import jax.numpy as jnp

    B, L = hpc_codes.shape
    isn = (hpc_codes >= 4).astype(jnp.int32)
    ncum = jnp.cumsum(isn, axis=1)
    win = ncum[:, l - 1:] - jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), ncum[:, : L - l]], axis=1)
    has_n = jnp.concatenate(
        [win > 0, jnp.ones((B, l - 1), bool)], axis=1)
    return sel & ~has_n


def _mix64_jax(h):
    """The invertible 64-bit mix (read.rs:43-52 constants) — must equal
    models/schemes.BloomCheckAndAddFilter._idx bit for bit."""
    import jax.numpy as jnp

    h = (~h + (h << jnp.uint64(21)))
    h = h ^ (h >> jnp.uint64(24))
    h = (h + (h << jnp.uint64(3)) + (h << jnp.uint64(8)))
    h = h ^ (h >> jnp.uint64(14))
    return h


def _stream_filter_bloom(canon, sel, hpc_codes, bits, *,
                         l: int, skip_n: bool):
    """UHS/LCP check_and_add selection through a BLOOM filter (the
    reference's actual memory model, minimizers.rs:115-161 + --bf mode of
    models/schemes.BloomCheckAndAddFilter) as a data-parallel pass.

    State is a fixed device bit tensor `bits` (u32 words) — constant memory
    at any input scale, unlike the exact-set path's growing sorted buffer.
    Semantics equal the host Bloom filter exactly (same mix hash, same
    power-of-2 modulo, same preloaded bits): a candidate is KEPT iff its bit
    was set by the preparation preload, an earlier batch, or an earlier
    candidate in this batch (stream order); every candidate sets its bit.

    In-batch ordering is resolved by one stable sort on BIT index: the first
    in-batch occurrence of a bit is kept only if the bit was already set;
    later occurrences of the same bit always pass (they see the first's
    insert).  Inserts use scatter-ADD of deduplicated, not-already-set bits —
    each word receives each bit at most once, so add == or, exactly.

    Returns (sel', new_bits).
    """
    import jax
    import jax.numpy as jnp

    B, L = canon.shape
    if skip_n:
        sel = _filter_skip_n(sel, hpc_codes, l)
    NL = B * L
    m_bits = bits.shape[0] * 32
    hf = canon.reshape(NL)
    cand = sel.reshape(NL)
    bidx = (_mix64_jax(hf) & jnp.uint64(m_bits - 1))
    widx = (bidx >> jnp.uint64(5)).astype(jnp.int32)
    bmask = (jnp.uint32(1) << (bidx & jnp.uint64(31)).astype(jnp.uint32))
    mem = (bits[widx] & bmask) != 0

    sidx = jnp.arange(NL, dtype=jnp.int32)
    skey = jnp.where(cand, bidx, ~jnp.uint64(0))
    sk, si = jax.lax.sort((skey, sidx), num_keys=2)  # sidx unique: 2-key == stable
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    scand = sk != ~jnp.uint64(0)
    dup_sorted = scand & ~first
    dup = jnp.zeros((NL,), bool).at[si].set(dup_sorted)

    keep = cand & (mem | dup)

    # inserts: first in-batch occurrence of each candidate bit that is not
    # already set; bits are distinct and absent, so scatter-add == or
    mem_sorted = mem[si]
    ins = scand & first & ~mem_sorted
    ins_w = jnp.where(ins, (sk >> jnp.uint64(5)).astype(jnp.int32),
                      jnp.int32(bits.shape[0]))  # OOB rows drop
    ins_m = (jnp.uint32(1) << (sk & jnp.uint64(31)).astype(jnp.uint32))
    new_bits = bits.at[ins_w].add(jnp.where(ins, ins_m, jnp.uint32(0)),
                                  mode="drop")
    return keep.reshape(B, L), new_bits


def _stream_filter(canon, sel, hpc_codes, preload, seen, delta, *,
                   l: int, skip_n: bool):
    """UHS/LCP check_and_add selection (read.rs:125-156 / 93-124) as a
    data-parallel pass over one batch.

    The host semantics (models/schemes.CheckAndAddFilter, exact-set mode):
    a density-selected candidate is KEPT iff its canonical hash is already in
    the filter set — preloaded (UHS file hashes; LCP preloads strings which
    can never equal an int hash, so its effective preload is empty) OR
    inserted by an earlier candidate anywhere in the stream.  Every candidate
    inserts its hash.  Batch-parallel equivalent:

      keep = member(preload) | member(seen) | duplicate-of-earlier-in-batch

    where "earlier" is stream order (row-major position), computed with one
    stable sort by (hash, stream index).

    TWO-TIER state: `seen` is the big sorted base (merged rarely), `delta`
    a small sorted buffer the batch's first-occurrence non-member hashes
    merge into — so the per-batch re-sort touches |delta| + NL rows, not the
    whole accumulated set (round-2 weakness: the single growing buffer made
    every batch re-sort O(total distinct)).  When delta overflows, the
    caller folds it into the base and retries.  Exact — no ordering
    ambiguity, because batches arrive in read order.  (At genome scale
    prefer --bf: _stream_filter_bloom has constant-size state and the
    reference's own Bloom semantics.)

    Returns (sel', (new_delta, new_delta_n, state_overflow)).  On overflow
    the caller must retry the SAME batch after merging delta into the base
    (the returned delta is truncated and must not be committed).
    """
    import jax
    import jax.numpy as jnp

    B, L = canon.shape
    if skip_n:
        sel = _filter_skip_n(sel, hpc_codes, l)

    NL = B * L
    maxu = ~jnp.uint64(0)
    hf = canon.reshape(NL)
    cand = sel.reshape(NL)

    def member(table, q):
        ix = jnp.clip(jnp.searchsorted(table, q), 0, table.shape[0] - 1)
        return table[ix] == q

    # duplicate-of-earlier: stable sort by hash (candidates only; others get
    # the MAX sentinel, which no candidate can equal — hashes are <= the
    # density bound), stream order preserved within equal hashes
    sidx = jnp.arange(NL, dtype=jnp.int32)
    skey = jnp.where(cand, hf, maxu)
    sk, si = jax.lax.sort((skey, sidx), num_keys=2)  # sidx unique: 2-key == stable
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    scand = sk != maxu
    dup_sorted = scand & ~first
    dup = jnp.zeros((NL,), bool).at[si].set(dup_sorted)

    mem = member(preload, hf) | member(seen, hf) | member(delta, hf)
    keep = cand & (mem | dup)

    # inserts: first in-batch occurrence of each candidate hash not already
    # in the set; merge into the small sorted MAX-padded delta buffer
    ins_sorted = scand & first & ~(member(preload, sk) | member(seen, sk)
                                   | member(delta, sk))
    ins_keys = jnp.where(ins_sorted, sk, maxu)
    merged = jnp.sort(jnp.concatenate([delta, ins_keys]))
    new_n = (merged != maxu).sum().astype(jnp.int32)
    S = delta.shape[0]
    overflow = new_n > S
    return keep.reshape(B, L), (merged[:S], new_n, overflow)


def _chunk_slot_capacity(hash_bound: int, chunk: int = 512) -> int:
    """Per-chunk slot count for two-level compaction: selection rate ~= 2x
    density (canonical hash = min of two ~uniform hashes vs bound = d*2^64),
    +8 binomial sigmas, rounded up to a multiple of 8, clamped to [16, 256].
    Chunks exceeding this take the exact host fallback (overflow flag)."""
    import math

    rate = min(1.0, 2.0 * hash_bound / 2.0 ** 64)
    expect = chunk * rate
    sigma = math.sqrt(max(1.0, expect * (1.0 - rate)))
    c = int(expect + 8 * sigma + 4)
    return max(16, min(256, (c + 7) & ~7))


@functools.lru_cache(maxsize=None)
def _poly_tables_cached(k: int, M: int):
    from .kminmer import poly_fp_tables

    return poly_fp_tables(k, M)


def _window_keys_poly(mh, k: int, M: int):
    """Canonical 128-bit window fingerprints [B, W, 2] from the compacted
    minimizer rows mh [B, M], via prefix sums (no [B, W, k] tensor).

    Must equal fingerprint128(canonicalize(window)) exactly — the host
    oracle (core/extract.py) and the vec-materializing device path both
    compute that directly, and the device==host tests compare keys.
    """
    import jax.numpy as jnp

    W = M - k + 1
    tables = _poly_tables_cached(k, M)

    # KmerVec::normalize reversal flag (kmer_vec.rs:34-39): lexicographic
    # first-difference of v[w+j] vs v[w+k-1-j]; palindromes report True.
    rev_flag = jnp.ones(mh.shape[:-1] + (W,), dtype=bool)
    for j in range(k - 1, -1, -1):
        a = mh[..., j : j + W]
        b = mh[..., k - 1 - j : k - 1 - j + W]
        rev_flag = jnp.where(a != b, a > b, rev_flag)

    def cumsum_u64(x):
        # jnp.cumsum on uint64 lowers to a naive reduce-window on TPU
        # (~1.2 ms per [128, 256] row block!); a log-step doubling scan is
        # 8 shifted u64 adds and fuses cleanly.  Addition mod 2^64 is
        # associative, so the result is exact.
        n = x.shape[-1]
        s = 1
        while s < n:
            pad = jnp.zeros(x.shape[:-1] + (s,), dtype=x.dtype)
            x = x + jnp.concatenate([pad, x[..., :-s]], axis=-1)
            s <<= 1
        return x

    lanes = []
    for lane in (0, 1):
        t = tables[lane]
        apow = jnp.asarray(t["apow"])
        ainvpow = jnp.asarray(t["ainvpow"])
        off_ak = jnp.uint64(t["off_ak"])
        zero = jnp.zeros(mh.shape[:-1] + (1,), dtype=jnp.uint64)
        S = jnp.concatenate([zero, cumsum_u64(mh * ainvpow[:M])], axis=-1)
        T = jnp.concatenate([zero, cumsum_u64(mh * apow[:M])], axis=-1)
        fwd = off_ak + apow[k - 1 : k - 1 + W] * (S[..., k : k + W] - S[..., :W])
        rev = off_ak + ainvpow[:W] * (T[..., k : k + W] - T[..., :W])
        lanes.append(jnp.where(rev_flag, rev, fwd))
    return jnp.stack(lanes, axis=-1)


def _unpack_ext(extpack: np.ndarray):
    """Decode the compact meta extpack column -> (ext_delta i64 >= 0,
    de1 i64 = d_last_e - d_last, sign-restored)."""
    ext_delta = (extpack >> 16).astype(np.int64)
    de1 = (extpack & 0xFFFF).astype(np.int64) - 0x8000
    return ext_delta, de1


class CompactWindows:
    """Valid windows of one batch, fetched with minimal device->host traffic.

    Scalar per-window fields are host numpy arrays; the canonical vectors stay
    on device until `vecs_for(indices)` gathers just the requested rows (used
    for the rare abundance-crossing windows)."""

    __slots__ = ("key_lo", "key_hi", "seqlen", "shift0", "shift1", "reversed_",
                 "read_row", "start", "end", "seq_shift0", "seq_shift1",
                 "n_windows", "_dev_vecs", "_gather", "_win_index")

    def vecs_for(self, indices: np.ndarray) -> np.ndarray:
        """Canonical minimizer vectors for flattened window positions
        (indices into this object's arrays)."""
        if len(indices) == 0:
            k = self._dev_vecs.shape[-1]
            return np.zeros((0, k), dtype=np.uint64)
        flat = self._win_index[indices]
        # pad to pow2 to bound jit recompiles
        cap = 1 << max(4, int(np.ceil(np.log2(len(flat)))))
        padded = np.zeros(cap, dtype=np.int32)
        padded[: len(flat)] = flat
        out = np.asarray(self._gather(self._dev_vecs, padded))
        return out[: len(flat)]


class DeviceExtractor:
    """Engine wrapper: ReadBatch -> WindowBatch / CompactWindows via the
    jitted device fn.

    Reads whose minimizer count exceeds the compacted capacity M (rare;
    flagged by the kernel) are re-extracted with the host engine to preserve
    exactness.
    """

    def __init__(self, params, use_pallas: bool | None = None,
                 lmer_table=None, filter_mode: str | None = None,
                 filter_preload=None, m2i: dict | None = None,
                 filter_bloom_bits=None):
        import jax
        import jax.numpy as jnp

        self.params = params
        if use_pallas is None:
            use_pallas = params.engine == "pallas"
        self.use_pallas = use_pallas
        self._fns: dict[tuple, object] = {}
        self._jax = jax
        self._gather = jax.jit(
            lambda vecs, idx: vecs.reshape(-1, vecs.shape[-1])[idx]
        )
        # scheme tables (see make_device_extractor)
        self._m2i = m2i
        self._lmer = None
        if lmer_table is not None:
            keys, vals = lmer_table
            self._lmer = (jnp.asarray(keys), jnp.asarray(vals))
        self.filter_mode = filter_mode
        self._filter_bloom = filter_bloom_bits is not None
        if self._filter_bloom:
            # --bf UHS/LCP: fixed-size bit tensor seeded from the host
            # filter's preloaded bits (models/schemes.BloomCheckAndAddFilter
            # bit layout == u32 little-endian view); constant memory at any
            # input scale, FP semantics identical to the host filter
            self._bits = jnp.asarray(
                np.asarray(filter_bloom_bits).view(np.uint32))
            self._m_mult = 1
        elif filter_mode is not None:
            pre = (np.zeros(0, dtype=np.uint64) if filter_preload is None
                   else np.asarray(filter_preload, dtype=np.uint64))
            if pre.size == 0:
                # MAX sentinel keeps membership lookups index-safe (no query
                # hash can equal it: candidates are <= the density bound)
                pre = np.array([~np.uint64(0)], dtype=np.uint64)
            self._preload = jnp.asarray(np.sort(pre))
            self._seen_cap = 1 << 16
            self._seen = jnp.full((self._seen_cap,), ~np.uint64(0),
                                  dtype=jnp.uint64)
            self.seen_n = 0
            self._delta_cap = 1 << 14
            self._delta = jnp.full((self._delta_cap,), ~np.uint64(0),
                                   dtype=jnp.uint64)
            self.delta_n = 0
            self._m_mult = 1  # M growth factor (filter mode re-runs batches)

    def _fn(self, B, L, M, compact=False):
        key = (B, L, M, compact)
        if key not in self._fns:
            p = self.params
            syncmer = (p.s, p.syncmer_hash_bound) if p.use_syncmers else None
            self._fns[key] = self._jax.jit(
                functools.partial(
                    _device_extract, l=p.l, k=p.k, hash_bound=p.hash_bound,
                    M=M, already_hpc=p.reads_already_hpc,
                    use_pallas=self.use_pallas and syncmer is None,
                    compact_output=compact, syncmer=syncmer,
                    lmer=self._lmer is not None,
                    filter_mode=self.filter_mode,
                    filter_bloom=self._filter_bloom,
                    ref_cuts=getattr(p, "seq_ref_cuts", False),
                )
            )
        return self._fns[key]

    def _tiled_fn(self, B, L):
        """Jitted full-path extraction at the fixed tile shape (long-sequence
        tiling, extract_minimizers_tiled); always already_hpc — the tiler
        HPC-compresses on the host to keep the raw-position map exact."""
        # per-read minimizer caps don't apply to a tile of a longer sequence
        M = self.capacity(L, ignore_override=True)
        key = (B, L, M, "tiled")
        if key not in self._fns:
            p = self.params
            self._fns[key] = self._jax.jit(
                functools.partial(
                    _device_extract, l=p.l, k=p.k, hash_bound=p.hash_bound,
                    M=M, already_hpc=True, use_pallas=self.use_pallas,
                )
            )
        return self._fns[key]

    def _tiled_ok(self) -> bool:
        p = self.params
        return (not p.use_syncmers and self.filter_mode is None
                and self._lmer is None and self._m2i is None)

    def _extract_long(self, batch):
        """Long-row batches ([1, L] overflow staging from io.fastx.batches):
        device-tiled minimizer selection + host windowing.  Falls back to the
        host oracle per row on tile capacity overflow."""
        from ..core.extract import extract_windows_host

        p = self.params

        def mfn(codes):
            try:
                return extract_minimizers_tiled(codes, p, self)
            except RuntimeError:
                from ..core.extract import extract_minimizers_host

                return extract_minimizers_host(codes, p, self._m2i)

        return extract_windows_host(batch, p, minimizer_fn=mfn)

    def _extra_args(self) -> tuple:
        extra = ()
        if self._lmer is not None:
            extra += self._lmer
        if self._filter_bloom:
            extra += (self._bits,)
        elif self.filter_mode is not None:
            extra += (self._preload, self._seen, self._delta)
        return extra

    def _merge_delta(self):
        """Fold the committed delta into the sorted base (growing the base
        to the next power of two when needed) and reset the delta.  Called
        on delta overflow — rare, so the big base re-sort is amortized over
        ~delta_cap inserts.  A delta too small for ONE batch's inserts
        doubles instead."""
        import jax.numpy as jnp

        if self.delta_n == 0:
            self._delta_cap *= 2
            self._delta = jnp.full((self._delta_cap,), ~np.uint64(0),
                                   dtype=jnp.uint64)
            return
        need = self.seen_n + self.delta_n
        while self._seen_cap < need:
            self._seen_cap *= 2
        pad = jnp.full((self._seen_cap - self._seen.shape[0]
                        + self._delta.shape[0],),
                       ~np.uint64(0), dtype=jnp.uint64)
        self._seen = jnp.sort(jnp.concatenate(
            [self._seen, self._delta, pad]))[: self._seen_cap]
        self.seen_n = need
        self._delta = jnp.full((self._delta_cap,), ~np.uint64(0),
                               dtype=jnp.uint64)
        self.delta_n = 0

    def extract_device(self, codes, lengths):
        """Raw device-side compact extraction: returns the device dict
        (keys/meta/vecs/overflow) WITHOUT any host transfer.  Used by the
        device-resident counter (ops/sort_count.py)."""
        if self.filter_mode is not None:
            raise RuntimeError(
                "extract_device cannot thread UHS/LCP filter state; "
                "use __call__ / extract_compact")
        B, L = codes.shape
        M = self.capacity(L)
        return self._fn(B, L, M, compact=True)(codes, lengths,
                                               *self._extra_args())

    def extract_compact(self, batch) -> CompactWindows:
        """Low-traffic path for the non-EC pipeline (keys+meta only; vectors
        gathered on demand).  Falls back to the host engine for overflow rows
        via the full path."""
        p = self.params
        if self.filter_mode is not None:
            # stateful UHS/LCP runs through the full path (which commits the
            # filter state exactly once per batch)
            return _compact_from_windowbatch(self(batch))
        B, L = batch.codes.shape
        if L >= LONG_SEQ_MIN and self._tiled_ok():
            return _compact_from_windowbatch(self._extract_long(batch))
        M = self.capacity(L)
        out = self._fn(B, L, M, compact=True)(batch.codes, batch.lengths,
                                              *self._extra_args())
        overflow = np.asarray(out["overflow"])
        if overflow.any():
            # rare: take the exact full path for the whole batch
            wb = self(batch)
            return _compact_from_windowbatch(wb)
        keys = np.asarray(out["keys"])      # [B, W, 2] u64
        meta = np.asarray(out["meta"])      # [B, W, 4(+extpack)] u32
        valid = (meta[..., 1] >> 31) > 0
        rows, wins = np.nonzero(valid)
        W = valid.shape[1]
        cw = CompactWindows()
        cw.key_lo = keys[rows, wins, 0]
        cw.key_hi = keys[rows, wins, 1]
        m = meta[rows, wins]
        cw.seqlen = m[:, 0]
        cw.shift0 = (m[:, 1] & 0x7FFFFFFF).astype(np.uint16)
        cw.shift1 = (m[:, 2] & 0x7FFFFFFF).astype(np.uint16)
        cw.reversed_ = (m[:, 2] >> 31) > 0
        cw.read_row = rows.astype(np.int32)
        cw.start = m[:, 3].astype(np.int64)
        cw.end = cw.start + cw.seqlen.astype(np.int64) + (p.l - 2)
        cw.seq_shift0, cw.seq_shift1 = cw.shift0, cw.shift1
        if meta.shape[-1] > 4:
            # exact-cut corrections (extpack col, see _device_extract)
            ext_delta, de1 = _unpack_ext(m[:, 4])
            cw.end = cw.end + ext_delta
            cw.seq_shift0 = np.where(cw.reversed_, cw.shift0 + de1,
                                     cw.shift0).astype(np.uint16)
            cw.seq_shift1 = np.where(cw.reversed_, cw.shift1,
                                     cw.shift1 + de1).astype(np.uint16)
        cw.n_windows = len(rows)
        cw._dev_vecs = out["vecs"]
        cw._gather = self._gather
        cw._win_index = (rows * W + wins).astype(np.int32)
        return cw

    def capacity(self, L: int, ignore_override: bool = False) -> int:
        p = self.params
        if p.max_minimizers_per_read > 0 and not ignore_override:
            return p.max_minimizers_per_read
        # canonical hash = min(fh, rh): selection rate ~ 2*density (read.rs:183
        # bound applied to the min of two ~uniform hashes).  Headroom: +8
        # binomial sigmas (overflowing reads take the exact host fallback, so
        # this only trades fallback frequency against buffer size — the
        # window buffers and finalize sorts scale with M).
        import math

        # syncmers: selection needs offset-(t-1) minimum AND hash <= d*4^l,
        # so the rate is below d; 1.5x margin guards tie-induced clustering
        rate = (min(1.0, p.density * 2) if not p.use_syncmers
                else min(1.0, p.density * 1.5 + 8.0 / max(64, L)))
        expect = L * rate
        sigma = math.sqrt(max(1.0, expect * (1 - rate)))
        m = int(max(p.k + 33, expect + 8 * sigma))
        return (m + 31) & ~31

    def __call__(self, batch):
        from ..core.extract import WindowBatch, extract_windows_host

        p = self.params
        B, L = batch.codes.shape
        if L >= LONG_SEQ_MIN and self.filter_mode is None and self._tiled_ok():
            return self._extract_long(batch)
        if self.filter_mode is not None:
            out = self._call_filtered(batch)
        else:
            M = self.capacity(L)
            out = self._fn(B, L, M)(batch.codes, batch.lengths,
                                    *self._extra_args())
        out = {k: np.asarray(v) for k, v in out.items() if k != "fstate"}

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
            end=out["end_ext"][rows, wins].astype(np.int64),
            seq_shift0=out["seq_shift0"][rows, wins].astype(np.uint16),
            seq_shift1=out["seq_shift1"][rows, wins].astype(np.uint16),
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
            wb = _merge_host_rows(wb, batch, overflow_rows, p, self._m2i)
        return wb

    def _call_filtered(self, batch):
        """Full-path extraction under UHS/LCP: re-runs the batch with doubled
        minimizer capacity on overflow (a host fallback cannot replicate the
        device-resident filter state), grows the seen-set on state overflow,
        and commits the new state exactly once."""
        B, L = batch.codes.shape
        while True:
            M = min(L, self.capacity(L) * self._m_mult)
            out = self._fn(B, L, M)(batch.codes, batch.lengths,
                                    *self._extra_args())
            new_state, new_n, state_over = out["fstate"]
            if not self._filter_bloom and bool(np.asarray(state_over)):
                self._merge_delta()
                continue
            if np.asarray(out["overflow"]).any():
                if M < L:
                    self._m_mult *= 2
                    continue
                raise RuntimeError(
                    "UHS/LCP device extraction overflowed per-512-window "
                    "compaction slots even at full capacity; rerun with "
                    "--engine host")
            if self._filter_bloom:
                self._bits = new_state
            else:
                self._delta = new_state
                self.delta_n = int(np.asarray(new_n))
            return out


LONG_SEQ_MIN = 1 << 20   # rows at/above this length take the tiled path
TILE_DEFAULT = 1 << 20   # hpc bases per tile row


def extract_minimizers_tiled(codes: np.ndarray, params, extractor,
                             tile: int = TILE_DEFAULT):
    """Minimizer selection for one Mbp-scale sequence via fixed-shape device
    tiles (density scheme: --reference genomes, multik contig feedback).

    Density selection is per-l-mer local (read.rs:176-211 applies the hash
    bound to each l-mer independently), so tiling the HPC-compressed sequence
    into rows of `tile` bases with an (l-1)-base halo stitches exactly: tile
    row i covers hpc[i*tile : i*tile + tile + l - 1] and keeps minimizers
    starting in [0, tile).  Compile shapes are bounded — one (8, tile+512)
    kernel regardless of sequence length — where the padded [1, L] staging
    would force a fresh XLA compile (and a huge live tensor) per length
    bucket.  Windowing over the ~2·density·L surviving minimizers stays on
    the host (core/extract.window_kminmers flow).

    Returns (pos int64[N] raw coords, hashes uint64[N]) — identical to the
    host oracle ops.minimizers.extract_density_np.
    """
    import jax.numpy as jnp

    from .hpc import encode_rle_np

    l = params.l
    if l - 1 > 512:
        raise RuntimeError("tiled extraction requires l <= 513")
    if params.reads_already_hpc:
        hpc = np.ascontiguousarray(codes)
        posmap = None
    else:
        hpc, posmap = encode_rle_np(codes)
    n = int(hpc.shape[0])
    if n < l:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    halo = 512  # lane-aligned >= l-1
    TB = 8
    Lt = tile + halo
    fn = extractor._tiled_fn(TB, Lt)
    n_tiles = (n + tile - 1) // tile
    pos_chunks: list[np.ndarray] = []
    hash_chunks: list[np.ndarray] = []
    buf = np.full((TB, Lt), 5, dtype=np.uint8)
    for t0 in range(0, n_tiles, TB):
        rows = min(TB, n_tiles - t0)
        buf[:] = 5
        lens = np.zeros(TB, dtype=np.int32)
        for r in range(rows):
            a = (t0 + r) * tile
            b = min(n, a + tile + (l - 1))
            buf[r, : b - a] = hpc[a:b]
            lens[r] = b - a
        out = fn(jnp.asarray(buf), jnp.asarray(lens))
        nm = np.asarray(out["n_min"])
        if np.asarray(out["overflow"])[:rows].any():
            raise RuntimeError("tiled extraction minimizer-capacity overflow")
        mh = np.asarray(out["minim_hash"])
        mp = np.asarray(out["minim_pos"])
        for r in range(rows):
            p = mp[r, : nm[r]]
            keep = p < tile  # halo starts belong to the next tile
            pos_chunks.append(p[keep].astype(np.int64) + (t0 + r) * tile)
            hash_chunks.append(mh[r, : nm[r]][keep])
    pos = np.concatenate(pos_chunks)
    hashes = np.concatenate(hash_chunks)
    if posmap is not None:
        pos = posmap[pos]
    return pos, hashes


class _HostCompact(CompactWindows):
    """CompactWindows view over a host WindowBatch (overflow fallback)."""

    __slots__ = ("_host_vecs",)

    def vecs_for(self, indices):
        return self._host_vecs[np.asarray(indices, dtype=np.int64)]


def _compact_from_windowbatch(wb) -> CompactWindows:
    cw = _HostCompact()
    cw.key_lo = wb.key_lo
    cw.key_hi = wb.key_hi
    cw.seqlen = wb.seqlen.astype(np.uint32)
    cw.shift0 = wb.shift0
    cw.shift1 = wb.shift1
    cw.reversed_ = wb.reversed_
    cw.read_row = wb.read_row
    cw.start = wb.start
    cw.end = wb.end
    cw.seq_shift0 = wb.seq_shift0
    cw.seq_shift1 = wb.seq_shift1
    cw.n_windows = len(wb.key_lo)
    cw._dev_vecs = cw._gather = cw._win_index = None
    cw._host_vecs = wb.vecs
    return cw


def _merge_host_rows(wb, batch, rows, params, m2i=None):
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

    hb = extract_windows_host(_View, params, m2i)
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
        seq_shift0=cat(wb.seq_shift0, hb.seq_shift0),
        seq_shift1=cat(wb.seq_shift1, hb.seq_shift1),
        vecs=np.concatenate([wb.vecs, hb.vecs])[order],
        minimizers=minims,
    )


def _build_lmer_table(m2i: dict, l: int):
    """Sorted (packed-lmer keys, values) arrays for the device remap lookup.

    Keys not in decoded-normal form (uppercase ACGT/N — the only strings
    decode_bases can produce) are unreachable by the host lookup and are
    skipped; the remaining keys pack injectively (base-8 over codes 0..4)."""
    from ..utils.seq import BASE_CODE, CODE_BASE

    keys, vals = [], []
    for s, v in m2i.items():
        if len(s) != l:
            continue
        codes = np.minimum(BASE_CODE[np.frombuffer(s.encode(), np.uint8)], 4)
        if CODE_BASE[codes].tobytes().decode() != s:
            continue  # host decode_bases can never produce this string
        pk = np.uint64(0)
        for j in range(l):
            pk |= np.uint64(codes[j]) << np.uint64(3 * (l - 1 - j))
        keys.append(pk)
        vals.append(np.uint64(v))
    if not keys:
        # MAX sentinel: no packed l-mer (< 2^63 at l <= 21) can equal it, so
        # lookups on a degenerate table never match (and never index empty)
        return (np.array([~np.uint64(0)], dtype=np.uint64),
                np.zeros(1, dtype=np.uint64))
    k = np.asarray(keys, dtype=np.uint64)
    v = np.asarray(vals, dtype=np.uint64)
    order = np.argsort(k)
    return k[order], v[order]


def make_device_extractor(params, minimizer_to_int=None, uhs_filter=None,
                          lcp_filter=None):
    if params.error_correct:
        # EC needs int_to_minimizer round-trips + per-read host records
        raise NotImplementedError(
            "device engine does not run the error-correction extraction")
    lmer_table = m2i = None
    if params.has_lmer_counts:
        if minimizer_to_int is None or params.l > 21:
            raise NotImplementedError(
                "device lmer-counts remap needs the prepared table and "
                "l <= 21")
        lmer_table = _build_lmer_table(minimizer_to_int, params.l)
        m2i = minimizer_to_int
    filter_mode = preload = bloom_bits = None
    if params.uhs or params.lcp:
        f = uhs_filter if params.uhs else lcp_filter
        if f is None:
            raise NotImplementedError("UHS/LCP filter not prepared")
        filter_mode = "uhs" if params.uhs else "lcp"
        if hasattr(f, "_bits"):
            # --bf mode: mirror the host Bloom filter's preloaded bit array
            # (same mix hash + power-of-2 modulo -> identical FP pattern);
            # device state is a fixed bit tensor, constant memory at scale
            bloom_bits = np.asarray(f._bits, dtype=np.uint8).view(np.uint32)
        elif hasattr(f, "_set"):
            # exact-set mode; int entries only: LCP preloads STRINGS, which
            # an int-hash query can never equal (models/schemes.py docstring)
            preload = np.fromiter(
                (x for x in f._set if isinstance(x, (int, np.integer))),
                dtype=np.uint64)
        else:
            raise NotImplementedError("unrecognized UHS/LCP filter")
    return DeviceExtractor(params, use_pallas=(params.engine == "pallas"),
                           lmer_table=lmer_table, filter_mode=filter_mode,
                           filter_preload=preload, m2i=m2i,
                           filter_bloom_bits=bloom_bits)
