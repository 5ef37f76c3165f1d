"""Device-resident k-min-mer counting: accumulate -> sort -> segment-reduce.

The reference's global concurrent hash (DashMap, main.rs:595) is replaced by a
sort-based counter that lives entirely in device HBM: every batch's VALID
window KEYS (128-bit canonical fingerprints, computed O(1)/window from prefix
sums — ops/extract.py count path) are compacted into fixed per-batch slots of
a preallocated [read_cap*W_slot, 2] buffer (W_slot ~ 0.6*W at the +8-sigma
slot size, window_slot_capacity) alongside their original window coordinates
occ = read_row*W + w [read_cap*W_slot] u32 and the compacted per-read
minimizer rows mh/mp [read_cap, M].  A single jitted finalize pass

  stable-sorts (key_lo, key_hi) with occurrence indices,
  finds segment heads, segment-sums abundances,
  picks the min_abundance-th occurrence per key (the reference's
  'crossing' occurrence whose seqlen/shift/sequence get recorded,
  main.rs:680-707), and
  reconstructs that occurrence's window metadata (vector, reversal,
  shifts, seqlen, start, read row) by GATHERING from mh/mp — windows
  are never materialized per occurrence, so the buffers are ~10x
  smaller than storing [window, k] vectors (8k+20 B/window -> 16 B).

occ -> (read, window) decodes as row = occ // W and w = occ % W (W is the
ORIGINAL per-read window count M - k + 1, not W_slot).

Only the compacted per-node results ever cross the device->host link — the
axon relay's ~30 MB/s fetch rate makes every byte count.

Node IDs: deterministic crossing-occurrence order (the order the reference
writes .sequences records, main.rs:693-707), replacing its thread-arrival-order
atomic (main.rs:598); equal to first-occurrence order when min_abundance == 1.
Crossing order is monotone in the window stream, which lets the phased driver
emit nodes while later batches are still being counted (finalize prefix_rows).
"""

from __future__ import annotations

import functools

import numpy as np


def _finalize(b_lo, b_hi, b_meta, b_vecs, *, minab, node_cap, keep_all):
    """Sort + segment-reduce over windows carrying explicit meta+vecs rows.

    Used by the sharded multi-chip pipeline (parallel/pipeline.py), where
    windows are routed across shards and the implicit occ->(read, window)
    mapping of the single-chip layout does not hold.

    Returns per-node arrays compacted to [node_cap]:
      key [node_cap, 2], count, first_occ, meta-of-crossing [node_cap, 5],
      vec-of-crossing [node_cap, k], n_unique, node_overflow.
    """
    import jax
    import jax.numpy as jnp

    N = b_lo.shape[0]
    node_cap = min(node_cap, N - 1)  # slices below need node_cap + 1 <= N
    valid = (b_meta[:, 1] >> 31) > 0
    # invalid windows sink to the end as (MAX, MAX); a real fingerprint equal
    # to that value has probability 2^-128
    lo = jnp.where(valid, b_lo, ~jnp.uint64(0))
    hi = jnp.where(valid, b_hi, ~jnp.uint64(0))
    occ = jnp.arange(N, dtype=jnp.uint32)
    # occ (unique, ascending) as a third sort key replaces stability — see
    # _finalize_compact
    slo, shi, socc = jax.lax.sort((lo, hi, occ), num_keys=3)
    sval = ~((slo == ~jnp.uint64(0)) & (shi == ~jnp.uint64(0)))
    n_valid = sval.sum().astype(jnp.int32)
    prev_lo = jnp.concatenate([jnp.full((1,), ~jnp.uint64(0)), slo[:-1]])
    prev_hi = jnp.concatenate([jnp.full((1,), ~jnp.uint64(0)), shi[:-1]])
    head = ((slo != prev_lo) | (shi != prev_hi)) & sval
    csum = jnp.cumsum(head.astype(jnp.int32))
    n_unique_all = csum[-1]

    # binary-search head compaction (see _finalize_compact)
    targets = jnp.arange(1, node_cap + 2, dtype=jnp.int32)
    hp_all = jnp.searchsorted(csum, targets).astype(jnp.int32)
    head_pos = hp_all[:node_cap]
    next_head = hp_all[1:]
    hp = jnp.minimum(head_pos, N - 1)
    u_lo = slo[hp]
    u_hi = shi[hp]
    first_occ = socc[hp]
    counts = (jnp.minimum(next_head, n_valid)
              - jnp.minimum(head_pos, n_valid)).astype(jnp.uint32)
    cross_sorted_idx = jnp.minimum(
        head_pos.astype(jnp.uint32) + jnp.uint32(minab - 1), jnp.uint32(N - 1)
    )
    cross_occ = socc[cross_sorted_idx]
    cross_meta = b_meta[cross_occ]
    cross_vec = b_vecs[cross_occ] if b_vecs is not None else None
    passing = counts >= minab
    node_overflow = jnp.maximum(0, n_unique_all - node_cap)

    ordkey = jnp.where(passing, first_occ, jnp.uint32(0xFFFFFFFF))
    n_pass = passing.sum().astype(jnp.int32)
    cap_iota = jax.lax.broadcasted_iota(jnp.uint32, (node_cap, 1), 0)[:, 0]
    _, order = jax.lax.sort((ordkey, cap_iota), num_keys=1)
    out = dict(
        key_lo=u_lo[order], key_hi=u_hi[order], count=counts[order],
        meta=cross_meta[order],
        n_pass=n_pass, n_unique=n_unique_all, node_overflow=node_overflow,
    )
    if cross_vec is not None:
        out["vec"] = cross_vec[order]
    return out


def _bloom_pass(key_lo, key_hi, valid, bits):
    """Sequential-parity --bf screen over one batch's window keys.

    Device twin of the native table's single-hash Bloom
    (native/mdbg_core.cpp nt_add: bit = (lo ^ (hi * 0x9E3779B97F4A7C15))
    & mask, mirroring the reference's RacyBloom role, main.rs:639-655): a
    window KEEPS iff its bit was set by an earlier batch OR an earlier
    window of this batch (stream order); every valid window sets its bit.
    Same bit indices as the host filter -> identical false-positive
    pattern, so device --bf output is byte-identical to the host engine's.

    In-batch order is resolved by one (bit, pos) sort (the
    ops/extract._stream_filter_bloom construction): the first in-batch
    occurrence of a bit keeps only if already set; later occurrences always
    keep (they see the first's insert).  Inserts scatter-ADD deduplicated
    not-already-set bits — each word receives each bit at most once, so
    add == or, deterministically.

    bits: u32 [m/32] (m a power of two).  Returns (keep, new_bits).
    """
    import jax
    import jax.numpy as jnp

    N = key_lo.shape[0]
    m_bits = bits.shape[0] * 32
    bidx = (key_lo ^ (key_hi * jnp.uint64(0x9E3779B97F4A7C15))) \
        & jnp.uint64(m_bits - 1)
    widx = (bidx >> jnp.uint64(5)).astype(jnp.int32)
    bmask = jnp.uint32(1) << (bidx & jnp.uint64(31)).astype(jnp.uint32)
    mem = (bits[widx] & bmask) != 0

    sidx = jnp.arange(N, dtype=jnp.int32)
    rbits = max(1, (N - 1).bit_length())
    # strictly < 64 so the all-ones invalid sentinel shifts to a value
    # above every real bit index
    if (m_bits - 1).bit_length() + rbits < 64:
        # pack (bit index, row) into ONE u64 sort operand — the bitonic
        # passes move half the bytes of the 2-operand variant, and the
        # row is recovered by mask (rows are unique, so the single-key
        # sort is stable by construction)
        packed = (bidx << jnp.uint64(rbits)) | sidx.astype(jnp.uint64)
        packed = jnp.where(valid, packed, ~jnp.uint64(0))
        sp = jax.lax.sort(packed, dimension=0)
        sk = sp >> jnp.uint64(rbits)
        si = (sp & jnp.uint64((1 << rbits) - 1)).astype(jnp.int32)
        scand = sp != ~jnp.uint64(0)
        si = jnp.minimum(si, N - 1)
    else:
        skey = jnp.where(valid, bidx, ~jnp.uint64(0))
        sk, si = jax.lax.sort((skey, sidx), num_keys=2)  # si unique: stable
        scand = sk != ~jnp.uint64(0)
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    dup = jnp.zeros((N,), bool).at[si].set(scand & ~first)

    keep = valid & (mem | dup)
    ins = scand & first & ~mem[si]
    ins_w = jnp.where(ins, (sk >> jnp.uint64(5)).astype(jnp.int32),
                      jnp.int32(bits.shape[0]))  # OOB rows drop
    ins_m = jnp.uint32(1) << (sk & jnp.uint64(31)).astype(jnp.uint32)
    new_bits = bits.at[ins_w].add(jnp.where(ins, ins_m, jnp.uint32(0)),
                                  mode="drop")
    return keep, new_bits


def _no_mpos() -> bool:
    """MDBG_NO_MPOS=1 drops the per-node record-position plane from the
    finalize output: the native .sequences writer re-derives minimizers by
    rolling ntHash over each record instead (its pre-mpos mode) — trades
    ~42 B/node of device->host transfer for host hashing CPU.  Worth it
    only when the D2H link is the bottleneck (this environment's relay)."""
    import os

    return os.environ.get("MDBG_NO_MPOS", "0") == "1"


def counter_flags(params) -> dict:
    """Buffer-layout flags a DeviceNodeCounter must share with
    make_fused_construct (both derive from the same Params): the exact-cut
    extent plane (raw inputs) and the --bf bit tensor ride in the buffers
    tuple, so a mismatch would misalign the fori_loop carry."""
    return dict(
        with_ext=not (params.reads_already_hpc
                      or getattr(params, "seq_ref_cuts", False)),
        use_bf=(params.use_bf and params.min_kmer_abundance > 1
                and not params.reference),
        bloom_log2_bits=params.bloom_log2_bits,
    )


def window_slot_capacity(params, B: int, L: int, M: int) -> int:
    """Per-read compacted window slots W_slot for the batch-slot layout.

    Valid windows per read are a PREFIX (window w needs minimizers w..w+k-1),
    so per-batch compaction packs sum(nw) rows into a fixed B*W_slot slot.
    Batch sums concentrate: sigma(sum)/B = sigma_read/sqrt(B), so W_slot =
    E[nw] + 8*sigma_read/sqrt(B) (+pad) is ~1.1x the mean while overflow
    probability is ~1e-15 per batch; overflowing batches are flagged and the
    run falls back/raises exactly like minimizer-capacity overflow.  This is
    what makes the finalize sorts see ~1.7x fewer rows than the padded
    [B, W] window tensor (ROADMAP round-2 lever)."""
    import math

    W = M - params.k + 1
    rate = (min(1.0, params.density * 2) if not params.use_syncmers
            else min(1.0, params.density * 1.5 + 8.0 / max(64, L)))
    expect = max(0.0, L * rate - (params.k - 1))
    sigma = math.sqrt(max(1.0, L * rate * (1 - rate)))
    w = int(expect + 8.0 * sigma / math.sqrt(max(1, B)) + 9)
    return max(8, min(W, (w + 7) & ~7))


def _scan_max_i32(x):
    """Inclusive max-scan along the last axis (log-step doubling; cheap
    vector passes, no reduce-window)."""
    import jax.numpy as jnp

    n = x.shape[-1]
    s = 1
    while s < n:
        pad = jnp.full(x.shape[:-1] + (s,), jnp.iinfo(jnp.int32).min,
                       dtype=x.dtype)
        x = jnp.maximum(x, jnp.concatenate([pad, x[..., :-s]], axis=-1))
        s <<= 1
    return x


def _scan_min_i32_rev_excl(x, fill: int):
    """EXCLUSIVE reverse min-scan: out[r] = min over r' > r of x[r']."""
    import jax.numpy as jnp

    y = jnp.concatenate(
        [x[..., 1:], jnp.full(x.shape[:-1] + (1,), fill, dtype=x.dtype)],
        axis=-1)[..., ::-1]
    n = y.shape[-1]
    s = 1
    while s < n:
        pad = jnp.full(y.shape[:-1] + (s,), fill, dtype=y.dtype)
        y = jnp.minimum(y, jnp.concatenate([pad, y[..., :-s]], axis=-1))
        s <<= 1
    return y[..., ::-1]


def _finalize_compact(b_lo, b_hi, b_occ, b_mh, b_mp, b_mpe=None, *, k, M,
                      minab, node_cap, pass_cap, emit_mpos=False,
                      prefix_rows=None, mpos_u16=False, bf=False):
    """Sort + segment-reduce for the single-chip compact layout.

    b_lo/b_hi [read_cap*W_slot] batch-compacted key halves (valid windows
    packed to the
    front of each batch slot, sentinel elsewhere), b_occ the matching
    original window coordinates occ = read_row*W + w, b_mh/b_mp
    [read_cap, M].  Crossing-occurrence metadata is reconstructed by
    gathering k-slices from mh/mp at (occ // W, occ % W).

    PASS-centric compaction: real inputs are singleton-dominated (HiFi-rate
    errors corrupt most windows, so unique keys >> passing nodes — 4.4M vs
    246k at bench shapes).  Everything after the big sort therefore scales
    with PASSING nodes only: crossing rows are identified in place with two
    run-length scans (distance-to-head == minab-1 and run length >= minab),
    then compacted by a pass_cap-target binary search — no per-unique head
    compaction, no node_cap-sized reorder sort.  node_cap is accepted for
    API compatibility but unused.

    Node ids are assigned in CROSSING-occurrence order (the deterministic
    stand-in for the reference's thread-arrival-order atomic, and the order
    in which the reference writes .sequences records, main.rs:693-707; for
    minab == 1 this equals first-occurrence order).  Crossing order is
    monotone as more windows arrive, which is what makes phased emission
    possible: `prefix_rows` (static) finalizes only the filled buffer prefix,
    and a later finalize over a longer prefix reproduces the earlier passing
    rows as an EXACT prefix of its own (a node's crossing occurrence never
    changes once crossed) — so phase i emits row range [n_pass_{i-1},
    n_pass_i) and the final full finalize supplies whole-run counts for all.
    """
    import jax
    import jax.numpy as jnp

    del node_cap
    if prefix_rows is not None:
        b_lo = b_lo[:prefix_rows]
        b_hi = b_hi[:prefix_rows]
        b_occ = b_occ[:prefix_rows]
    N = b_lo.shape[0]
    pass_cap = min(pass_cap, N - 1)
    lo = b_lo
    hi = b_hi
    occ = b_occ
    # sort by (key128, occ): occ as an explicit THIRD key replaces stability
    # (occ is the global window coordinate — unique per valid row and
    # ascending in buffer order), sparing the iota operand XLA adds to
    # lower a stable sort.  (A surrogate sort by lo alone with post-sort
    # gathers of hi/occ was measured SLOWER on TPU — 762 vs 590 ms at bench
    # shapes, profiling/micro_profile12.py: two 6.8M-row random gathers cost
    # more than the third sort operand they save.)
    slo, shi, socc = jax.lax.sort((lo, hi, occ), num_keys=3)
    sval = ~((slo == ~jnp.uint64(0)) & (shi == ~jnp.uint64(0)))
    n_valid = sval.sum().astype(jnp.int32)
    prev_lo = jnp.concatenate([jnp.full((1,), ~jnp.uint64(0)), slo[:-1]])
    prev_hi = jnp.concatenate([jnp.full((1,), ~jnp.uint64(0)), shi[:-1]])
    head = ((slo != prev_lo) | (shi != prev_hi)) & sval
    n_unique_all = head.sum().astype(jnp.int32)

    iota = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    # per-row position of its run's head (inclusive max-scan) and of the
    # NEXT run's head (exclusive reverse min-scan); run length follows
    headpos = _scan_max_i32(jnp.where(head, iota, -1))
    nexth = jnp.where(head, iota, N)
    nexth = _scan_min_i32_rev_excl(nexth, fill=N)
    count_row = (jnp.minimum(nexth, n_valid) - headpos).astype(jnp.int32)
    # a key's crossing row is the (minab-1)-th of its run, present iff the
    # run reaches minab.  Under --bf (device Bloom pre-filter) the buffer
    # holds only post-filter sightings — the reference's table sees
    # occurrences 2..n of a key (its first sighting only marked the filter,
    # main.rs:639-662) — so the crossing shifts one earlier and the
    # reported abundance adds the marked sighting back.
    minab_sel = minab - 1 if bf else minab
    crossing = sval & (iota - headpos == minab_sel - 1) \
        & (count_row >= minab_sel)
    ccum = jnp.cumsum(crossing.astype(jnp.int32))
    n_pass = ccum[-1]

    # compact the first pass_cap crossing rows: binary search per output
    # slot (pass_cap * log N gathers — pass_cap is ~20x smaller than the
    # unique count on error-rate inputs)
    targets = jnp.arange(1, pass_cap + 1, dtype=jnp.int32)
    cpos = jnp.minimum(jnp.searchsorted(ccum, targets).astype(jnp.int32),
                       N - 1)
    u_lo = slo[cpos]
    u_hi = shi[cpos]
    counts = (count_row[cpos] + (1 if bf else 0)).astype(jnp.uint32)
    cross_occ = socc[cpos]

    # deterministic crossing order: one pass_cap-sized sort by occurrence
    ordkey = jnp.where(targets <= n_pass, cross_occ, jnp.uint32(0xFFFFFFFF))
    cap_iota = jax.lax.broadcasted_iota(jnp.uint32, (pass_cap, 1), 0)[:, 0]
    _, order = jax.lax.sort((ordkey, cap_iota), num_keys=1)
    cross_occ_p = cross_occ[order]
    # meta layout matches the window-carrying path: (seqlen, shift0|valid<<31,
    # shift1|rev<<31, start, global read row)
    gw = _gather_window_meta(b_mh, b_mp, cross_occ_p, k=k, M=M,
                             with_record_pos=emit_mpos, pos_u16=mpos_u16,
                             b_mpe=b_mpe)
    out = dict(
        key_lo=u_lo[order], key_hi=u_hi[order], count=counts[order],
        vec=gw[0],
        # one bundled scalar fetch (each np.asarray round-trips the relay)
        stats3=jnp.stack([n_pass, n_unique_all,
                          jnp.maximum(0, n_pass - pass_cap)]),
    )
    meta = gw[1]
    if mpos_u16 and b_mpe is None:
        # u16 wire packing (valid whenever the staged read width fits u16,
        # the same gate as mpos_u16): (seqlen, shift0, shift1, start) as
        # [n, 4] u16 + (row | rev<<31) u32 — 12 B/node over the relay
        # instead of 20; LazyNodes.fetch("meta") re-widens on the host.
        out["meta16"] = jnp.stack(
            [meta[:, 0], meta[:, 1] & 0x7FFFFFFF, meta[:, 2] & 0x7FFFFFFF,
             meta[:, 3]], axis=-1).astype(jnp.uint16)
        out["metarow"] = meta[:, 4] | ((meta[:, 2] >> 31) << 31)
    else:
        out["meta"] = meta
    if emit_mpos:
        out["mpos"] = gw[2]
    return out


def _overlap_keys_device(canon_vec):
    """GFA (k-1)-overlap fingerprints computed ON DEVICE so the host edge
    join never needs the [n, k] u64 vectors: per node the 4 fingerprints
    Fs/Fp/FsR/FpR (core/graph._overlap_keys twins) packed [n, 8] + a 2-bit
    canonical-orientation flag.  64 B/node vs 8k B/node over the device->host
    relay.  Dispatched as its OWN jit call after the finalize's stats fetch —
    the u64 Horner math costs ~100-300 ms on device and must not delay the
    blocking stats3 round-trip; here its latency hides under the .sequences
    writer phase (core/device_out.py fetches gk last)."""
    import jax.numpy as jnp

    from .kminmer import fingerprint128_jax, le_rev_jax

    suf = canon_vec[:, 1:]
    pre = canon_vec[:, :-1]
    gk = jnp.concatenate(
        [fingerprint128_jax(suf), fingerprint128_jax(pre),
         fingerprint128_jax(suf[:, ::-1]),
         fingerprint128_jax(pre[:, ::-1])], axis=-1)
    gflag = (le_rev_jax(suf).astype(jnp.uint8)
             | (le_rev_jax(pre).astype(jnp.uint8) << 1))
    return gk, gflag


def _finalize_chunk(b_lo, b_hi, b_occ, *, node_cap, slots=2):
    """Per-chunk reduction for the >HBM chunked-counting path: compact the
    chunk's UNIQUE keys (with per-chunk counts and the window occurrences of
    their first `slots` in-chunk appearances) in first-occurrence order.

    The host merges (key, count) into the native C++ table (nt_merge_chunk)
    which tracks global abundance across chunks and decides whether the
    abundance-crossing occurrence (main.rs:680-707) falls in this chunk — and
    if so WHICH in-chunk appearance it is (sel = min_abundance - prior global
    count, always <= min_abundance).  With slots >= min_abundance the capture
    is therefore exact for ANY --minabund (the chunked driver sizes slots =
    minab; the occs matrix never leaves the device — crossing rows are
    gathered by occ_at_chunk).  Vector + metadata are then gathered on device
    (gather_window_meta) for exactly the crossing occurrences, so the
    device->host traffic for the big arrays is one vec/meta row per NODE over
    the whole run, never per window or per unique singleton.
    """
    import jax
    import jax.numpy as jnp

    N = b_lo.shape[0]
    node_cap = min(node_cap, N - 1)
    lo = b_lo
    hi = b_hi
    occ = b_occ
    slo, shi, socc = jax.lax.sort((lo, hi, occ), num_keys=3)
    sval = ~((slo == ~jnp.uint64(0)) & (shi == ~jnp.uint64(0)))
    n_valid = sval.sum().astype(jnp.int32)
    prev_lo = jnp.concatenate([jnp.full((1,), ~jnp.uint64(0)), slo[:-1]])
    prev_hi = jnp.concatenate([jnp.full((1,), ~jnp.uint64(0)), shi[:-1]])
    head = ((slo != prev_lo) | (shi != prev_hi)) & sval
    n_unique = jnp.sum(head.astype(jnp.int32))

    iota = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    hkey = jnp.where(head, iota, n_valid)
    hkey_s, h_lo, h_hi, h_occ = jax.lax.sort(
        (hkey, slo, shi, socc), num_keys=1
    )
    head_pos = hkey_s[:node_cap]
    next_head = hkey_s[1 : node_cap + 1]
    counts = (next_head - head_pos).astype(jnp.uint32)
    occ1 = h_occ[:node_cap]
    # j-th in-chunk appearance, j = 1..slots (valid only when count >= j;
    # the merge's selector never exceeds the count it crosses within)
    occ_idx = jnp.minimum(
        head_pos[:, None] + jnp.arange(slots, dtype=jnp.int32)[None, :],
        N - 1)
    occs = socc[occ_idx]                                # [node_cap, slots]

    # order every unique by first occurrence so host id assignment is
    # deterministic and chunk-size independent
    ordkey = jnp.where(iota[:node_cap] < n_unique, occ1,
                       jnp.uint32(0xFFFFFFFF))
    cap_iota = jax.lax.broadcasted_iota(jnp.uint32, (node_cap, 1), 0)[:, 0]
    _, order = jax.lax.sort((ordkey, cap_iota), num_keys=1)
    return dict(
        key_lo=h_lo[:node_cap][order], key_hi=h_hi[:node_cap][order],
        count=counts[order], occs=occs[order],
        stats2=jnp.stack([n_unique,
                          jnp.maximum(0, n_unique - node_cap)]),
    )


def _gather_window_meta(b_mh, b_mp, occs, *, k, M, with_record_pos=False,
                        pos_u16=False, b_mpe=None):
    """Reconstruct (canonical vec, seqlen, shift0, shift1, rev, start, row)
    for a list of window occurrences (chunk-local), gathering k-slices from
    the compact per-read minimizer rows — shared by the whole-run finalize
    and the chunked path's crossing-occurrence gather.

    with_record_pos=True additionally returns mpos [n, k] u32: each
    minimizer's position within the node's STORED record sequence (already
    flipped into stored orientation for reversed crossings) — the native
    .sequences writer uses these to re-derive values by hashing exactly k
    l-mers instead of rolling over every base (native/seqwriter.cpp
    positions mode).

    b_mpe (raw-input runs): per-minimizer full-HPC-extent ends
    (ops/extract `mpe` plane) — appends the exact-cut extpack column
    ((end_ext - end) << 16 | (d_last_e - d_last + 0x8000), matching
    ops/extract's compact meta) as meta column 5."""
    import jax.numpy as jnp

    from .kminmer import canonicalize_jax

    W = M - k + 1
    rows = (occs // jnp.uint32(W)).astype(jnp.int32)
    wins = (occs % jnp.uint32(W)).astype(jnp.int32)
    gidx = (rows * M + wins)[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    vec_f = b_mh.reshape(-1)[gidx]
    pos_f = b_mp.reshape(-1)[gidx].astype(jnp.int32)
    canon_vec, rev = canonicalize_jax(vec_f)
    d_first = pos_f[:, 1] - pos_f[:, 0]
    d_last = pos_f[:, k - 1] - pos_f[:, k - 2]
    shift0 = jnp.where(rev, d_last, d_first).astype(jnp.uint32)
    shift1 = jnp.where(rev, d_first, d_last).astype(jnp.uint32)
    seqlen = (pos_f[:, k - 1] - pos_f[:, 0] + 2).astype(jnp.uint32)
    cols = [
        seqlen,
        shift0 | jnp.uint32(1 << 31),
        shift1 | (rev.astype(jnp.uint32) << 31),
        pos_f[:, 0].astype(jnp.uint32),
        rows.astype(jnp.uint32),
    ]
    if b_mpe is not None:
        pe_idx = (rows * M + wins)[:, None] + jnp.asarray(
            [k - 2, k - 1], dtype=jnp.int32)[None, :]
        pos_e = b_mpe.reshape(-1)[pe_idx].astype(jnp.int32)
        # b_mpe stores (extent_end - l), not extent_end: the bias makes
        # ext_delta = end_ext - (pos + l) computable without threading l
        # here, and end-differences (d_last_e) are bias-invariant — see
        # make_fused_construct's append
        ext_delta = (pos_e[:, 1] - pos_f[:, k - 1]).astype(jnp.int32)
        de1 = (pos_e[:, 1] - pos_e[:, 0]) - d_last
        extpack = ((jnp.clip(ext_delta, 0, 0xFFFF).astype(jnp.uint32) << 16)
                   | jnp.clip(de1 + 0x8000, 0, 0xFFFF).astype(jnp.uint32))
        cols.append(extpack)
    meta = jnp.stack(cols, axis=-1)
    if not with_record_pos:
        return canon_vec, meta
    # record length is span + l, so the last l-mer starts at span = rel[k-1];
    # a reversed record stores revcomp(seq), where the l-mer at forward
    # offset r starts at span - r
    rel = pos_f - pos_f[:, :1]
    mpos = jnp.where(rev[:, None], rel[:, -1:] - rel[:, ::-1], rel)
    # pos_u16: record-relative positions fit u16 whenever the staged read
    # width L <= 65535 (callers gate on that) — halves the device->host
    # bytes of the dominant per-node transfer (k positions/node); the host
    # writer widens back to u32 on ingest
    return canon_vec, meta, mpos.astype(jnp.uint16 if pos_u16
                                        else jnp.uint32)


def make_fused_construct(params, B: int, L: int, M: int, n_batches: int,
                         packed: bool = False, w_slot: int | None = None,
                         bf: bool | None = None):
    """One-dispatch construction: fori_loop over n_batches batches of staged
    device reads, extracting window keys + minimizer rows and appending into
    the counter buffers.

    The whole loop is a single jitted call — per-batch host dispatches cost
    ~50-150 ms each through the axon relay, so looping on device is the only
    way to reach compute-bound throughput.

    Each batch's VALID windows (a prefix per read) are compacted into a fixed
    [B*W_slot] slot before the append (cumsum offsets + one searchsorted
    gather), carrying the original window coordinate occ = read_row*W + w as
    a u32 payload — the finalize sorts then run over ~1.7x fewer rows than
    the padded [B, W] layout.  Batches whose valid-window total exceeds the
    slot are counted in the overflow return (probability ~1e-15 at the +8
    sigma/sqrt(B) slot size, window_slot_capacity).

    Returns jitted fn(all_codes [n_batches*B, L] u8, all_lengths [n_batches*B]
    i32, buffers, read_base) -> (buffers, n_windows_valid, n_overflow) where
    n_overflow counts minimizer-capacity reads + window-slot batches.

    packed=True: all_codes arrives as (packed [n*B, L//4], mask [n*B, L//8])
    from ops.pack.pack_codes_np — 0.375 B/base on the H2D wire instead of 1,
    unpacked per batch inside the loop so the full-width byte tensor never
    materializes in HBM either.
    """
    import jax
    import jax.numpy as jnp

    from .extract import _device_extract
    from .pack import unpack_codes_jax

    # w_slot MUST match the counter's (DeviceNodeCounter(w_slot=...)) — both
    # default to the full W (no size reduction, still overflow-free); perf
    # call sites pass window_slot_capacity(params, B, L, M) to both.
    W = M - params.k + 1
    W_slot = w_slot if w_slot is not None else W
    S = B * W_slot
    syncmer = (params.s, params.syncmer_hash_bound) if params.use_syncmers \
        else None
    ek = dict(l=params.l, k=params.k, hash_bound=params.hash_bound, M=M,
              already_hpc=params.reads_already_hpc, count_output=True,
              use_pallas=(params.engine == "pallas" and syncmer is None),
              syncmer=syncmer,
              ref_cuts=getattr(params, "seq_ref_cuts", False))
    sentinel = ~np.uint64(0)
    l_bias = params.l  # mpe plane stores extent_end - l (see gather)
    # device --bf: the Bloom screen drops each key's first sighting before
    # the counter, so the finalize sorts only post-filter rows — the
    # reference's headline protocol (README.md:133-135 runs use --bf) and,
    # on error-rate inputs, a ~2.5-3x cut of the dominant sort size when
    # the caller also shrinks W_slot (singletons dominate raw windows).
    _fl = counter_flags(params)
    # bf=False: the chunked driver's Bloom lives in its host merge
    # (nt_merge_chunk) — its construct must not screen twice
    bf_on = _fl["use_bf"] if bf is None else bf
    with_ext = _fl["with_ext"]

    @functools.partial(jax.jit, donate_argnums=(2,))
    def construct(all_codes, all_lengths, buffers, read_base=0,
                  batch_lo=0, batch_hi=n_batches):
        """read_base: global row offset of this chunk's first read (the CLI
        pipeline feeds the input in chunks; bench stages it whole).

        batch_lo/batch_hi (traced) run only batches [lo, hi) of the staged
        input — the phased driver splits one staged run into an early phase
        (whose finalize+emission overlaps the rest) and the remainder,
        without a second compile."""
        read_base = jnp.asarray(read_base).astype(jnp.int32)

        def body(i, carry):
            bufs_c, n_win, n_over = carry
            (b_lo, b_hi, b_occ, b_mh, b_mp) = bufs_c[:5]
            if packed:
                pk, mk = all_codes
                p_b = jax.lax.dynamic_slice(pk, (i * B, 0), (B, L // 4))
                m_b = jax.lax.dynamic_slice(mk, (i * B, 0), (B, L // 8))
                codes = unpack_codes_jax(p_b, m_b)
            else:
                codes = jax.lax.dynamic_slice(all_codes, (i * B, 0), (B, L))
            lengths = jax.lax.dynamic_slice(all_lengths, (i * B,), (B,))
            out = _device_extract(codes, lengths, **ek)
            row0 = read_base + i * B

            if bf_on:
                # Bloom screen: keep is no longer a per-read prefix, so the
                # slot compaction goes through one flat [B*W] position sort
                keys_f = out["keys"].reshape(B * W, 2)
                widx_w = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
                valid_w = (widx_w < out["nw"][:, None]).reshape(B * W)
                bits = bufs_c[-1]
                keep, bits = _bloom_pass(keys_f[:, 0], keys_f[:, 1],
                                         valid_w, bits)
                fpos = jax.lax.broadcasted_iota(
                    jnp.uint32, (B * W, 1), 0)[:, 0]
                skey = jnp.where(keep, fpos, jnp.uint32(0xFFFFFFFF))
                ssrc = jax.lax.sort(skey, dimension=0)[:S]
                valid = ssrc != jnp.uint32(0xFFFFFFFF)
                src = jnp.minimum(ssrc, np.uint32(B * W - 1)).astype(
                    jnp.int32)
                row = src // W
                w = src - row * W
                nv = keep.sum().astype(jnp.int32)
            else:
                # batch-slot compaction: valid windows are a per-read
                # prefix, so output position p maps to (row, w) via
                # rank-of-p in the exclusive cumsum of per-read window
                # counts.  The rank is a dense [S, B] compare-reduce — ~20x
                # faster than jnp.searchsorted here (XLA lowers the binary
                # search to a sequential while-loop of gathers:
                # ~1.45 ms/batch vs ~0.07)
                nw = out["nw"].astype(jnp.int32)                       # [B]
                offs = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32), jnp.cumsum(nw)])      # [B+1]
                nv = offs[B]
                pos = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)[:, 0]
                row = jnp.minimum(
                    jnp.sum((pos[:, None] >= offs[None, 1:]).astype(
                        jnp.int32), axis=1),
                    B - 1)
                w = pos - offs[row]
                valid = pos < jnp.minimum(nv, S)
                src = jnp.clip(row * W + w, 0, B * W - 1)
            # keys kept as separate lo/hi [N] planes: a [N, 2] u64 buffer
            # tiles as T(8,128) on TPU — the minor dim 2 pads 64x and one
            # layout-assigned copy of it OOMs HBM at whole-run shapes
            keys_flat = out["keys"].reshape(B * W, 2)
            kc_lo = jnp.where(valid, keys_flat[src, 0], sentinel)
            kc_hi = jnp.where(valid, keys_flat[src, 1], sentinel)
            occ = jnp.where(
                valid,
                ((row0 + row) * W + w).astype(jnp.uint32),
                jnp.uint32(0xFFFFFFFF),
            )

            slot0 = (read_base + i * B) * W_slot
            b_lo = jax.lax.dynamic_update_slice(b_lo, kc_lo, (slot0,))
            b_hi = jax.lax.dynamic_update_slice(b_hi, kc_hi, (slot0,))
            b_occ = jax.lax.dynamic_update_slice(b_occ, occ, (slot0,))
            b_mh = jax.lax.dynamic_update_slice(
                b_mh, out["mh"], (row0, jnp.int32(0)))
            b_mp = jax.lax.dynamic_update_slice(
                b_mp, out["mp"], (row0, jnp.int32(0)))
            new_bufs = (b_lo, b_hi, b_occ, b_mh, b_mp)
            if with_ext:
                # exact-cut extent plane, biased by -l (see
                # _gather_window_meta's extpack reconstruction)
                b_mpe = jax.lax.dynamic_update_slice(
                    bufs_c[5], out["mpe"] - jnp.int32(l_bias),
                    (row0, jnp.int32(0)))
                new_bufs = new_bufs + (b_mpe,)
            if bf_on:
                new_bufs = new_bufs + (bits,)
            n_over = (n_over + out["overflow"].sum().astype(jnp.int32)
                      + (nv > S).astype(jnp.int32))
            return new_bufs, n_win + jnp.minimum(nv, S), n_over

        bufs, n_win, n_over = jax.lax.fori_loop(
            batch_lo, batch_hi, body, (buffers, jnp.int32(0), jnp.int32(0))
        )
        return bufs, n_win, n_over

    return construct


class PotJoin:
    """Async handle for the device edge join: dispatch + async copies at
    construction, blocking resolution (with the rare cap re-run) at
    resolve().  See DeviceNodeCounter.edge_join."""

    def __init__(self, gk, gflag, n_pass: int):
        self._gk, self._gflag, self._n_pass = gk, gflag, n_pass
        cap = 1 << 14
        while cap < 2 * n_pass:
            cap <<= 1
        self._cap = cap
        self._res = self._dispatch(cap)

    def _dispatch(self, cap):
        import jax.numpy as jnp

        from .edge_join import edge_join_device

        res = edge_join_device(self._gk, self._gflag,
                               jnp.int32(self._n_pass), edge_cap=cap)
        for name in ("stats2", "pot_i", "pot_j", "pot_c"):
            try:
                res[name].copy_to_host_async()
            except Exception:
                pass
        return res

    def resolve(self):
        import os
        import sys

        res = self._res
        n_pot, g_over = (int(x) for x in np.asarray(res["stats2"]))
        if g_over > 0:
            return None
        reran = 0
        while n_pot > self._cap:  # rare: re-run with a doubled cap
            while self._cap < n_pot:
                self._cap *= 2
            res = self._dispatch(self._cap)
            reran += 1
            n_pot, g_over = (int(x) for x in np.asarray(res["stats2"]))
            if g_over > 0:
                return None
        if os.environ.get("MDBG_BENCH_DETAIL"):
            print(f"# pot: n_pot={n_pot} cap={self._cap} reran={reran}",
                  file=sys.stderr)
        return tuple(np.asarray(res[name])[:n_pot]
                     for name in ("pot_i", "pot_j", "pot_c"))


class DeviceNodeCounter:
    """Whole-run device-resident counter (single-chip path).

    Capacity model: read_cap reads (each 20·W_slot B compacted keys+occ +
    12·M B minimizer rows); HG002-scale runs exceed HBM and use the chunked
    host-merge path instead (core/pipeline device-table mode falls back
    automatically).
    """

    def __init__(self, k: int, M: int, read_cap: int, node_cap: int,
                 minab: int, pass_cap: int | None = None,
                 w_slot: int | None = None, emit_overlap_keys: bool = False,
                 chunk_slots: int = 2, mpos_u16: bool = False,
                 with_ext: bool = False, use_bf: bool = False,
                 bloom_log2_bits: int = 30):
        import jax
        import jax.numpy as jnp

        self.k = k
        self.M = M
        self.chunk_slots = max(1, chunk_slots)
        self.W = M - k + 1          # original windows/read (occ coordinates)
        self.W_slot = w_slot if w_slot is not None else self.W
        self.read_cap = read_cap
        self.window_cap = read_cap * self.W_slot
        self.node_cap = node_cap
        # pass_cap sizes everything after the finalize's big sort (the
        # compaction binary search, the ordering sort, the meta/vec gathers);
        # overflow re-runs once with a doubled cap, so start modest
        self.pass_cap = min(node_cap, pass_cap or (1 << 19))
        self.minab = minab
        self.emit_overlap_keys = emit_overlap_keys
        # u16 record positions (only when the caller's staged width fits)
        self.mpos_u16 = mpos_u16
        # raw (non-pre-HPC) inputs: carry the per-minimizer extent plane so
        # the crossing gather can emit the exact-cut extpack meta column
        # (recompute mode is HPC-only, so the two never combine)
        self.with_ext = with_ext
        assert not (with_ext and emit_overlap_keys)
        self._jax = jax
        # sentinel-filled keys: untouched tail rows drop out in finalize
        self.buffers = (
            jnp.full((self.window_cap,), ~jnp.uint64(0), dtype=jnp.uint64),
            jnp.full((self.window_cap,), ~jnp.uint64(0), dtype=jnp.uint64),
            jnp.full((self.window_cap,), 0xFFFFFFFF, dtype=jnp.uint32),
            jnp.zeros((read_cap, M), dtype=jnp.uint64),
            jnp.zeros((read_cap, M), dtype=jnp.int32),
        )
        if with_ext:
            self.buffers += (jnp.zeros((read_cap, M), dtype=jnp.int32),)
        # device --bf bit tensor rides LAST in the buffers tuple (the fused
        # construct updates it per batch; finalize never reads it)
        self.use_bf = use_bf
        if use_bf:
            self.buffers += (jnp.zeros((1 << bloom_log2_bits) // 32,
                                       dtype=jnp.uint32),)
        self._n_fin = 5 + int(with_ext)  # finalize consumes these buffers
        self._finalize_cache: dict = {}
        self._finalize_chunk = jax.jit(functools.partial(
            _finalize_chunk, node_cap=self.window_cap,
            slots=self.chunk_slots))
        self._chunk_occs = None  # device [node_cap, slots] of the last chunk
        self._occ_at = jax.jit(lambda occs, rows, sel: occs[rows, sel])
        self._gather = jax.jit(functools.partial(
            _gather_window_meta, k=k, M=M))
        self._overlap_keys = jax.jit(_overlap_keys_device)

        def gather_keys(b_mh, b_mp, occs):
            vec, meta, mpos = _gather_window_meta(b_mh, b_mp, occs, k=k, M=M,
                                                  with_record_pos=True,
                                                  pos_u16=mpos_u16)
            gk, gflag = _overlap_keys_device(vec)
            return gk, gflag, meta, mpos

        self._gather_keys = jax.jit(gather_keys)
        self._refill = jax.jit(
            lambda b: jnp.full_like(b, ~jnp.uint64(0)), donate_argnums=(0,))

    def _make_finalize(self, prefix_rows=None):
        key = (prefix_rows, self.node_cap, self.pass_cap)
        fn = self._finalize_cache.get(key)
        if fn is None:
            fn = self._jax.jit(functools.partial(
                _finalize_compact, k=self.k, M=self.M, minab=self.minab,
                node_cap=self.node_cap, pass_cap=self.pass_cap,
                emit_mpos=self.emit_overlap_keys and not _no_mpos(),
                prefix_rows=prefix_rows,
                mpos_u16=self.mpos_u16, bf=self.use_bf,
            ))
            self._finalize_cache[key] = fn
        return fn

    def grow(self, min_read_cap: int):
        """Double the read capacity (at least to min_read_cap), copying the
        filled prefix.  Costs one compile per new shape — growth doubles, so
        the number of distinct shapes is logarithmic."""
        import jax
        import jax.numpy as jnp

        new_cap = self.read_cap
        while new_cap < min_read_cap:
            new_cap *= 2
        if new_cap == self.read_cap:
            return
        n_fin = self._n_fin

        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(1,))
        def widen(buffers, new_cap):
            b_lo, b_hi, b_occ, b_mh, b_mp = buffers[:5]
            nlo = jnp.full((new_cap * self.W_slot,), ~jnp.uint64(0),
                           dtype=jnp.uint64)
            nlo = jax.lax.dynamic_update_slice(nlo, b_lo, (0,))
            nhi = jnp.full((new_cap * self.W_slot,), ~jnp.uint64(0),
                           dtype=jnp.uint64)
            nhi = jax.lax.dynamic_update_slice(nhi, b_hi, (0,))
            no = jnp.full((new_cap * self.W_slot,), 0xFFFFFFFF,
                          dtype=jnp.uint32)
            no = jax.lax.dynamic_update_slice(no, b_occ, (0,))
            nh = jnp.zeros((new_cap, self.M), dtype=jnp.uint64)
            nh = jax.lax.dynamic_update_slice(nh, b_mh, (0, 0))
            np_ = jnp.zeros((new_cap, self.M), dtype=jnp.int32)
            np_ = jax.lax.dynamic_update_slice(np_, b_mp, (0, 0))
            out = (nlo, nhi, no, nh, np_)
            if n_fin > 5:  # exact-cut extent plane widens with the reads
                ne = jnp.zeros((new_cap, self.M), dtype=jnp.int32)
                out += (jax.lax.dynamic_update_slice(ne, buffers[5], (0, 0)),)
            # the --bf bit tensor is input-size independent: pass through
            out += tuple(buffers[n_fin:])
            return out

        self.buffers = widen(self.buffers, new_cap)
        self.read_cap = new_cap
        self.window_cap = new_cap * self.W_slot
        self._finalize_cache.clear()
        self._finalize_chunk = self._jax.jit(functools.partial(
            _finalize_chunk, node_cap=self.window_cap,
            slots=self.chunk_slots))

    def finalize_dispatch(self, prefix_rows: int | None = None):
        """Enqueue the device reduction WITHOUT blocking on its stats —
        the phased driver dispatches the next construct chunk right after,
        so the (in-order) device queue runs finalize then construct while
        the host blocks only inside finalize_resolve.  Must be called while
        self.buffers still references the buffers the reduction should see
        (the following construct donates them)."""
        fin = self._make_finalize(prefix_rows)
        return fin(*self.buffers[: self._n_fin])

    def finalize_resolve(self, out, lazy: bool = False, row_lo: int = 0,
                         prefix_rows: int | None = None,
                         gk_mode: str = "host"):
        """Block on a finalize_dispatch result and package it.

        On node_cap overflow the reduction re-runs on the CURRENT buffers —
        correct even if later constructs appended in the meantime, because a
        prefix_rows re-run reads only the (immutable) filled prefix.

        row_lo: first row the caller still needs (rows below were emitted by
        an earlier phase); the LazyNodes prefetches only [row_lo, n_pass).

        gk_mode: "host" computes the overlap fingerprints and stages their
        device->host chunks (the host km_index join path); "device" computes
        them but keeps them device-only (the edge_join path fetches POT
        records instead — 65 B/node never crosses); "none" skips them (a
        non-final phase under the device join needs no keys at all).
        """
        n_pass, n_unique, node_overflow = (
            int(x) for x in np.asarray(out["stats3"]))
        while node_overflow > 0:
            # adaptive capacity: the pass-centric finalize reports the exact
            # passing count, so grow pass_cap to fit and re-run — at most
            # one extra round, and only on overflowing runs
            while self.pass_cap < n_pass:
                self.pass_cap *= 2
            fin = self._make_finalize(prefix_rows)
            out = fin(*self.buffers[: self._n_fin])
            n_pass, n_unique, node_overflow = (
                int(x) for x in np.asarray(out["stats3"]))
        if lazy:
            from ..core.device_out import LazyNodes

            if self.emit_overlap_keys and gk_mode == "device":
                # device->host copies serialize behind enqueued device work
                # through the relay: start the meta/mpos/count copies FIRST,
                # then enqueue the Horner fingerprint math the device join
                # consumes in place (never fetched by the host)
                nodes = LazyNodes(out, n_pass, row_lo=row_lo,
                                  want_vec=False, want_gk=False)
                cap2 = 1
                while cap2 < max(1, n_pass):
                    cap2 <<= 1
                cap2 = min(cap2, out["vec"].shape[0])
                gk, gflag = self._overlap_keys(out["vec"][:cap2])
                nodes._out = dict(out, gk=gk, gflag=gflag)
                return nodes
            if self.emit_overlap_keys and gk_mode != "none":
                # dispatched AFTER the blocking stats3 fetch, on the passing
                # prefix only (power-of-2 shapes bound the compile count);
                # runs async while the host starts the writer phase.  The
                # recompute output path then never needs the [n, k] vec
                # transfer.
                cap2 = 1
                while cap2 < max(1, n_pass):
                    cap2 <<= 1
                cap2 = min(cap2, out["vec"].shape[0])
                gk, gflag = self._overlap_keys(out["vec"][:cap2])
                out = dict(out, gk=gk, gflag=gflag)
            return LazyNodes(out, n_pass, row_lo=row_lo,
                             want_vec=not self.emit_overlap_keys,
                             want_gk=gk_mode == "host")
        cap2 = 1
        while cap2 < max(1, n_pass):
            cap2 <<= 1
        cap2 = min(cap2, self.pass_cap)
        res = {}
        for name in ("key_lo", "key_hi", "count", "meta", "vec", "gk",
                     "gflag", "mpos"):
            if name in out:
                res[name] = np.asarray(out[name][:cap2])[:n_pass]
        if "meta" not in res and "meta16" in out:
            # re-widen the u16 wire packing (see _finalize_compact meta16)
            m16 = np.asarray(out["meta16"][:cap2])[:n_pass].astype(np.uint32)
            mrow = np.asarray(out["metarow"][:cap2])[:n_pass]
            meta = np.empty((n_pass, 5), dtype=np.uint32)
            meta[:, 0] = m16[:, 0]
            meta[:, 1] = m16[:, 1] | np.uint32(1 << 31)
            meta[:, 2] = m16[:, 2] | (mrow & np.uint32(1 << 31))
            meta[:, 3] = m16[:, 3]
            meta[:, 4] = mrow & np.uint32(0x7FFFFFFF)
            res["meta"] = meta
        res["index"] = np.arange(n_pass, dtype=np.uint32)
        return res

    def edge_join(self, nodes):
        """Dispatch the device sort-join (ops/edge_join) on the FINAL
        finalize's overlap keys WITHOUT blocking: the stats and the POT
        arrays start their device->host copies immediately and ride the
        relay under the tail .sequences emission; PotJoin.resolve() (called
        at finish) blocks, handles the rare edge_cap re-run, and returns
        (pot_i, pot_j, pot_c) in exact host-join emission order — or None
        when some key group exceeds G_SLOTS (caller falls back to the host
        km_index join).  The dominant fetch becomes ~12 B per candidate edge
        instead of 65 B per node."""
        out = nodes._out
        if "gk" not in out:
            return None
        return PotJoin(out["gk"], out["gflag"], nodes.n_pass)

    def finalize(self, lazy: bool = False, prefix_rows: int | None = None,
                 row_lo: int = 0, gk_mode: str = "host"):
        """Run the device reduction; fetch only the passing-node prefix.

        Passing nodes are compacted to the front in deterministic crossing
        order, so node ids are simply 0..n_pass-1.  The prefix is fetched at
        the next power of two of n_pass (bounded set of slice shapes to keep
        compile-cache hits).

        lazy=True returns a core.device_out.LazyNodes instead of fetching
        everything — the pipelined output path fetches the (large) vec array
        in chunks, overlapping transfer with .sequences/GFA host work.

        Phased drivers use finalize_dispatch/finalize_resolve directly so the
        next construct chunk can be enqueued between the two.
        """
        return self.finalize_resolve(
            self.finalize_dispatch(prefix_rows), lazy=lazy, row_lo=row_lo,
            prefix_rows=prefix_rows, gk_mode=gk_mode)

    # --- chunked >HBM counting path (core/chunked.py driver) -------------

    def finalize_chunk(self) -> dict:
        """Reduce the CURRENT chunk only: unique keys with per-chunk counts
        in first-occurrence order.  Fetches the n_unique prefix (power-of-2
        slice shapes); the [node_cap, chunk_slots] occurrence matrix stays on
        device — occ_at_chunk gathers crossing rows after the host merge."""
        out = self._finalize_chunk(self.buffers[0], self.buffers[1],
                                   self.buffers[2])
        n_unique, overflow = (int(x) for x in np.asarray(out["stats2"]))
        if overflow > 0:
            raise RuntimeError("chunk unique keys exceeded window capacity")
        cap2 = 1
        while cap2 < max(1, n_unique):
            cap2 <<= 1
        cap2 = min(cap2, out["key_lo"].shape[0])
        res = {
            name: np.asarray(out[name][:cap2])[:n_unique]
            for name in ("key_lo", "key_hi", "count")
        }
        res["n_unique"] = n_unique
        self._chunk_occs = out["occs"]
        return res

    def occ_at_chunk(self, rows: np.ndarray, sel: np.ndarray) -> np.ndarray:
        """Window occurrences of the sel-th (1-based) in-chunk appearance of
        the given unique-key rows of the LAST finalize_chunk — the abundance
        crossings the host merge identified.  sel <= min_abundance <=
        chunk_slots by construction (core/chunked sizes the slots)."""
        import jax.numpy as jnp

        n = len(rows)
        cap2 = 8
        while cap2 < n:
            cap2 <<= 1
        r = np.zeros(cap2, dtype=np.int32)
        r[:n] = rows
        s = np.zeros(cap2, dtype=np.int32)
        s[:n] = np.asarray(sel, dtype=np.int32) - 1
        out = self._occ_at(self._chunk_occs, jnp.asarray(r), jnp.asarray(s))
        return np.asarray(out)[:n].astype(np.uint32)

    def gather_crossing(self, occs: np.ndarray):
        """Device-gather (canonical vec, meta) for chunk-local window
        occurrences — called for exactly the occurrences whose abundance
        crossing fell in this chunk.  occs padded to power-of-2 shapes to
        bound compile count."""
        import jax.numpy as jnp

        n = len(occs)
        cap2 = 8
        while cap2 < n:
            cap2 <<= 1
        padded = np.zeros(cap2, dtype=np.uint32)
        padded[:n] = occs
        kw = dict(b_mpe=self.buffers[5]) if self.with_ext else {}
        vec, meta = self._gather(self.buffers[3], self.buffers[4],
                                 jnp.asarray(padded), **kw)
        return np.asarray(vec)[:n], np.asarray(meta)[:n]

    def gather_crossing_keys(self, occs: np.ndarray):
        """Like gather_crossing but returns (gk, gflag, meta, mpos) — the GFA
        overlap fingerprints computed on device — instead of the canonical
        vectors: ~150 B/node over the device->host link instead of 8k B, for
        the chunked path when the .sequences writer re-derives minimizer
        text from sequence bytes (core/device_out.minimizer_recompute_ok);
        mpos feeds the writer's positions mode (hash k l-mers, not a rolling
        scan)."""
        import jax.numpy as jnp

        n = len(occs)
        cap2 = 8
        while cap2 < n:
            cap2 <<= 1
        padded = np.zeros(cap2, dtype=np.uint32)
        padded[:n] = occs
        gk, gflag, meta, mpos = self._gather_keys(
            self.buffers[3], self.buffers[4], jnp.asarray(padded))
        return (np.asarray(gk)[:n], np.asarray(gflag)[:n],
                np.asarray(meta)[:n], np.asarray(mpos)[:n])

    def gather_crossing_keys_dev(self, occs: np.ndarray):
        """gather_crossing_keys variant for the chunked device edge join:
        gk/gflag stay ON DEVICE (padded to the power-of-2 gather shape, rows
        >= n are garbage) for a DeviceKeyCatalog append; only meta and mpos
        cross to the host (the .sequences writer needs them now)."""
        import jax.numpy as jnp

        n = len(occs)
        cap2 = 8
        while cap2 < n:
            cap2 <<= 1
        padded = np.zeros(cap2, dtype=np.uint32)
        padded[:n] = occs
        gk, gflag, meta, mpos = self._gather_keys(
            self.buffers[3], self.buffers[4], jnp.asarray(padded))
        return gk, gflag, np.asarray(meta)[:n], np.asarray(mpos)[:n]

    def reset_chunk(self):
        """Sentinel-refill the key buffer for the next chunk (stale occ/mh/mp
        rows are unreachable: gathers only follow valid keys)."""
        if self._chunk_occs is not None:
            self._chunk_occs.delete()
            self._chunk_occs = None
        b_lo, b_hi = self.buffers[:2]
        self.buffers = (self._refill(b_lo), self._refill(b_hi),
                        *self.buffers[2:])
