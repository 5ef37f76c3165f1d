"""Distributed mdBG edge construction + GFA emission over a device mesh.

SURVEY §7 step 5's final piece: the edge phase (main.rs:1014-1117) without
ever materializing the full node table — or a global km_index — on one host.
Two all_to_all rounds replace the shared hash join:

  round 1 (key-owner shard): every shard emits 4 records per OWNED node —
    2 km_index entries (normalized prefix key at global order 2j, suffix at
    2j+1; main.rs:1023-1032) and 2 probes (suffix key at probe order 2i,
    prefix at 2i+1; main.rs:1041-1056) — each carrying the node's global id,
    the fingerprints its side of the 4 orientation tests needs, and (entries
    only) abundance + seqlen for presimp/overlap.  Records route to
    owner = key_lo mod n; each owner runs the same sort-join as the
    single-chip device join (ops/edge_join._edge_join_impl): one
    (key128, entries-before-probes, global-order) sort groups every probe
    with its candidate run, a G_SLOTS x 4 case bitmask per probe yields POT
    candidates with an LSB-first emission rank.

  round 2 (probe-owner shard): POT records route to the shard owning the
    probe node's id range (ids are contiguous per shard: prefix-scan bases,
    parallel/pipeline P3); sorted by (probe order, rank) they reproduce the
    single-chip host-join emission order EXACTLY — so per-shard L-line files
    concatenate (after the per-shard S-line files) into a byte-identical
    whole-run GFA.

  host (per shard): presimp (main.rs:1086-1090) is per-(probe, key) group —
    fully local after round 2.  The deferred symmetric drop
    (main.rs:1107-1117) is the one global datum: removed (i, j) pairs are
    exchanged (they are few — presimp removes a tiny fraction) and every
    shard filters its writes against the union.

Capacity: record/POT buffers are sized from the actual per-shard node
counts (power-of-2 bucketed for compile reuse); routing overflow or a
G_SLOTS candidate overflow raises — callers fall back to the single-host
join, so exactness is never at stake.
"""

from __future__ import annotations

import functools

import numpy as np

from .mesh import AXIS

G_SLOTS = 16
_PROBE = np.uint64(1) << np.uint64(32)


def _overlap_key_planes(vec, valid):
    """Per-node normalized (k-1)-overlap keys + the 4 test fingerprints,
    masked to MAX on invalid rows.  Twin of ops/sort_count._overlap_keys_device
    + the ksuf/kpre normalization of ops/edge_join."""
    import jax.numpy as jnp

    from ..ops.kminmer import fingerprint128_jax, le_rev_jax

    suf = vec[:, 1:]
    pre = vec[:, :-1]
    Fs = fingerprint128_jax(suf)
    Fp = fingerprint128_jax(pre)
    FsR = fingerprint128_jax(suf[:, ::-1])
    FpR = fingerprint128_jax(pre[:, ::-1])
    ksuf = jnp.where(le_rev_jax(suf)[:, None], Fs, FsR)
    kpre = jnp.where(le_rev_jax(pre)[:, None], Fp, FpR)
    maxu = ~jnp.uint64(0)
    ksuf = jnp.where(valid[:, None], ksuf, maxu)
    kpre = jnp.where(valid[:, None], kpre, maxu)
    return Fs, Fp, FsR, FpR, ksuf, kpre


def _bucket(owner, rank, rcap, n, vals, fills):
    """Scatter records into [n*rcap] owner buckets (drop-counted)."""
    import jax.numpy as jnp

    slot = jnp.where((owner < n) & (rank < rcap), owner * rcap + rank,
                     n * rcap)
    out = []
    for v, fill in zip(vals, fills):
        base = jnp.full((n * rcap,) + v.shape[1:], fill, dtype=v.dtype)
        out.append(base.at[slot].set(v, mode="drop"))
    return out


def make_sharded_edge_join(mesh, k: int, cap: int, rcap: int, pot_cap: int):
    """Jitted shard_map fn: per-shard padded node data -> per-shard POT in
    exact emission order for the shard's own id range.

    Inputs (per shard, sharded over AXIS):
      vec [cap, k] u64, count [cap] u32, seqlen [cap] u32,
      n_pass [1] i32, id_base [1] u32
    Plus replicated `bases` [n+1] u32 (id_base per shard + total).

    Returns per-shard: pot_ord, pot_rank (u32 [pot_cap]), pot_j (u32),
    pot_c (u32: ki<<2|case), pot_ab, pot_len (u32), n_pot [1] i32, and
    replicated overflow counters [3] i32 (route1 drops, G overflows,
    route2/pot drops).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.sort_count import _scan_max_i32

    n = mesh.devices.size
    maxu = ~jnp.uint64(0)

    def step(vec, count, seqlen, n_pass, id_base, bases):
        iota = jnp.arange(cap, dtype=jnp.int32)
        valid = iota < n_pass[0]
        gid = id_base[0].astype(jnp.uint32) + iota.astype(jnp.uint32)
        Fs, Fp, FsR, FpR, ksuf, kpre = _overlap_key_planes(vec, valid)

        # 4 streams per node: entries (pre @ 2g, suf @ 2g+1) then probes
        # (suf @ 2g, pre @ 2g+1); tor = ord | PROBE for probes.  Entry A/B =
        # (Fp, FsR) [candidate side of the case tests]; probe A/B = (Fs, FpR).
        def cat(*xs):
            return jnp.concatenate(xs)

        g2 = (gid.astype(jnp.uint64) * 2)
        key = jnp.concatenate([kpre, ksuf, ksuf, kpre], axis=0)
        tor = cat(g2, g2 + 1, g2 | _PROBE, (g2 + 1) | _PROBE)
        A = jnp.concatenate([Fp, Fp, Fs, Fs], axis=0)
        Bv = jnp.concatenate([FsR, FsR, FpR, FpR], axis=0)
        rid = cat(gid, gid, gid, gid)
        rab = cat(count, count, count, count)
        rlen = cat(seqlen, seqlen, seqlen, seqlen)
        v4 = cat(valid, valid, valid, valid)
        key_lo = jnp.where(v4, key[:, 0], maxu)
        key_hi = jnp.where(v4, key[:, 1], maxu)
        tor = jnp.where(v4, tor, maxu)

        owner = (key_lo % np.uint64(n)).astype(jnp.int32)
        owner = jnp.where(v4, owner, n)
        one_hot = owner[:, None] == jnp.arange(n + 1, dtype=jnp.int32)[None]
        rank = jnp.take_along_axis(
            jnp.cumsum(one_hot.astype(jnp.int32), axis=0) - 1,
            owner[:, None], axis=1)[:, 0]
        drop1 = jnp.sum((rank >= rcap) & v4)
        planes = _bucket(
            owner, rank, rcap, n,
            [key_lo, key_hi, tor, A[:, 0], A[:, 1], Bv[:, 0], Bv[:, 1],
             rid, rab, rlen],
            [maxu, maxu, maxu, np.uint64(0), np.uint64(0), np.uint64(0),
             np.uint64(0), np.uint32(0), np.uint32(0), np.uint32(0)])
        a2a = functools.partial(jax.lax.all_to_all, axis_name=AXIS,
                                split_axis=0, concat_axis=0, tiled=True)
        (key_lo, key_hi, tor, a_lo, a_hi, b_lo, b_hi, rid, rab, rlen) = \
            [a2a(p) for p in planes]

        # ---- local sort-join (ops/edge_join semantics) ------------------
        N = n * rcap
        skl, skh = key_lo, key_hi
        s = jax.lax.sort(
            (skh, skl, tor, a_lo, a_hi, b_lo, b_hi, rid, rab, rlen),
            num_keys=3)
        shi, slo, stor, sa_lo, sa_hi, sb_lo, sb_hi, srid, srab, srlen = s
        rvalid = ~((shi == maxu) & (slo == maxu))
        is_probe = (stor & _PROBE) != 0
        is_entry = ~is_probe & rvalid

        pos = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
        prev_hi = jnp.concatenate([maxu[None], shi[:-1]])
        prev_lo = jnp.concatenate([maxu[None], slo[:-1]])
        head = (shi != prev_hi) | (slo != prev_lo)
        glo = _scan_max_i32(jnp.where(head, pos, -1))
        ent_excl = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(is_entry.astype(jnp.int32))])
        gcount = ent_excl[pos] - ent_excl[glo]

        probe_rows = is_probe & rvalid
        g_iota = jnp.arange(G_SLOTS, dtype=jnp.int32)
        slot_pos = jnp.clip(glo[:, None] + g_iota[None, :], 0, N - 1)
        slot_ok = (g_iota[None, :] < jnp.minimum(gcount, G_SLOTS)[:, None]) \
            & probe_rows[:, None]
        g_over = jnp.sum((gcount > G_SLOTS) & probe_rows)

        def gat(x):
            return x[slot_pos.reshape(-1)].reshape(N, G_SLOTS)

        ea_lo, ea_hi = gat(sa_lo), gat(sa_hi)
        eb_lo, eb_hi = gat(sb_lo), gat(sb_hi)
        ej = gat(srid)
        eab = gat(srab)
        elen = gat(srlen)
        eord = gat(stor)  # entry global insertion order (for rank parity)

        def eq(p_lo, p_hi, q_lo, q_hi):
            return (p_lo[:, None] == q_lo) & (p_hi[:, None] == q_hi)

        c0 = eq(sa_lo, sa_hi, ea_lo, ea_hi)   # fs1 == fp2   (+,+)
        c1 = eq(sa_lo, sa_hi, eb_lo, eb_hi)   # fs1 == fsr2  (+,-)
        c2 = eq(sb_lo, sb_hi, ea_lo, ea_hi)   # fpr1 == fp2  (-,+)
        c3 = eq(sb_lo, sb_hi, eb_lo, eb_hi)   # fpr1 == fsr2 (-,-)
        cases = jnp.stack([c0, c1, c2, c3], axis=-1) & slot_ok[..., None]

        # candidate emission rank within the probe: candidates in km_index
        # insertion order = entry global order.  The gathered slots are
        # already ord-ascending (sort tiebreak), so LSB-first bit rank over
        # (slot, case) reproduces the host emission order exactly.
        bit_idx = (g_iota[:, None] * 4
                   + jnp.arange(4, dtype=jnp.int32)[None, :]).astype(
                       jnp.uint64)
        mask = jnp.sum(
            jnp.where(cases, jnp.uint64(1) << bit_idx[None], jnp.uint64(0)),
            axis=(1, 2), dtype=jnp.uint64)
        c_p = jax.lax.population_count(mask).astype(jnp.int32)
        cum = jnp.cumsum(c_p)
        n_pot_local = cum[-1]

        # extract POT entries (same binary bit-select as ops/edge_join)
        sidx = jnp.arange(pot_cap, dtype=jnp.int32)
        p_of_s = jnp.minimum(
            jnp.searchsorted(cum, sidx, side="right").astype(jnp.int32),
            N - 1)
        excl = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
        r = sidx - excl[p_of_s]
        m_s = mask[p_of_s]
        lane = jnp.zeros_like(r)
        rem = r
        w = 32
        while w >= 1:
            low_mask = ((jnp.uint64(1) << jnp.uint64(w)) - 1) if w < 64 \
                else ~jnp.uint64(0)
            low = (m_s >> lane.astype(jnp.uint64)) & low_mask
            c = jax.lax.population_count(low).astype(jnp.int32)
            go_hi = rem >= c
            rem = jnp.where(go_hi, rem - c, rem)
            lane = jnp.where(go_hi, lane + w, lane)
            w //= 2
        g_of_s = lane >> 2
        case_of_s = lane & 3
        ok = sidx < n_pot_local
        pot_over = jnp.maximum(0, n_pot_local - pot_cap)

        def pick(mat):
            return mat[p_of_s, jnp.clip(g_of_s, 0, G_SLOTS - 1)]

        probe_ord = (stor[p_of_s] & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        pot_ord = jnp.where(ok, probe_ord, jnp.uint32(0xFFFFFFFF))
        pot_rank = jnp.where(ok, r.astype(jnp.uint32), jnp.uint32(0))
        pot_j = jnp.where(ok, pick(ej), jnp.uint32(0))
        pot_c = jnp.where(ok, case_of_s.astype(jnp.uint32)
                          | ((probe_ord & 1) << 2), jnp.uint32(0))
        pot_ab = jnp.where(ok, pick(eab), jnp.uint32(0))
        pot_len = jnp.where(ok, pick(elen), jnp.uint32(0))

        # ---- round 2: route POT to the probe-owner shard ----------------
        pgid = pot_ord >> 1
        owner2 = (jnp.searchsorted(bases, pgid, side="right") - 1) \
            .astype(jnp.int32)
        owner2 = jnp.where(ok, jnp.clip(owner2, 0, n - 1), n)
        one_hot2 = owner2[:, None] == jnp.arange(n + 1, dtype=jnp.int32)[None]
        rank2 = jnp.take_along_axis(
            jnp.cumsum(one_hot2.astype(jnp.int32), axis=0) - 1,
            owner2[:, None], axis=1)[:, 0]
        r2cap = pot_cap // n
        drop2 = jnp.sum((rank2 >= r2cap) & ok)
        planes2 = _bucket(
            owner2, rank2, r2cap, n,
            [pot_ord, pot_rank, pot_j, pot_c, pot_ab, pot_len],
            [np.uint32(0xFFFFFFFF)] + [np.uint32(0)] * 5)
        ro, rr, rj, rc, rab2, rlen2 = [a2a(p) for p in planes2]
        # exact emission order for this shard's id range
        so, sr, sj, sc, sab, slen = jax.lax.sort(
            (ro, rr, rj, rc, rab2, rlen2), num_keys=2)
        n_pot_here = jnp.sum(so != jnp.uint32(0xFFFFFFFF)).astype(jnp.int32)

        overflow = jnp.stack([
            jax.lax.psum(drop1, AXIS),
            jax.lax.psum(g_over, AXIS),
            jax.lax.psum(drop2 + jnp.minimum(pot_over, 1 << 30), AXIS),
        ]).astype(jnp.int32)
        return (so, sr, sj, sc, sab, slen, n_pot_here[None], overflow)

    import jax as _jax
    from jax.sharding import PartitionSpec as P

    return _jax.jit(_jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                   P(AXIS), P()),
    ))


def presimp_pass(pot_ord, pot_j, pot_ab, local_ab, id_base, presimp: float):
    """Per-(probe, key) presimp rule (main.rs:1086-1090) over this shard's
    emission-ordered POT -> (removed_pairs [r, 2] u64-packed, keep_mask).

    keep_mask marks entries NOT presimp-removed; the symmetric drop happens
    later against the global removed union."""
    m = len(pot_ord)
    if m == 0:
        return np.zeros((0,), dtype=np.uint64), np.zeros(0, dtype=bool)
    i_gid = (pot_ord >> 1).astype(np.int64)
    ab_i = local_ab[(i_gid - id_base).astype(np.int64)]
    # groups = runs of equal pot_ord
    heads = np.concatenate([[True], pot_ord[1:] != pot_ord[:-1]])
    gidx = np.cumsum(heads) - 1
    n_g = int(gidx[-1]) + 1
    gmax = np.zeros(n_g, dtype=np.int64)
    np.maximum.at(gmax, gidx, pot_ab.astype(np.int64))
    gsize = np.bincount(gidx, minlength=n_g)
    ab_ref = np.minimum(gmax[gidx], ab_i.astype(np.int64)).astype(np.float64)
    removed = (presimp > 0.0) & (gsize[gidx] >= 2) \
        & (pot_ab.astype(np.float64) < presimp * ab_ref)
    pairs = (i_gid.astype(np.uint64) << np.uint64(32)) \
        | pot_j.astype(np.uint64)
    return np.unique(pairs[removed]), ~removed


def emit_l_lines(out, pot_ord, pot_j, pot_c, pot_len, keep, removed_union,
                 local_seqlen, local_shift0, local_shift1, id_base):
    """Write this shard's L lines in emission order, applying the symmetric
    drop against the global removed union (main.rs:1107-1117).  Returns the
    number of edges written."""
    m = len(pot_ord)
    if m == 0:
        return 0
    i_gid = (pot_ord >> 1).astype(np.int64)
    loc = (i_gid - id_base).astype(np.int64)
    fwd = (i_gid.astype(np.uint64) << np.uint64(32)) \
        | pot_j.astype(np.uint64)
    rev = (pot_j.astype(np.uint64) << np.uint64(32)) \
        | i_gid.astype(np.uint64)
    drop = np.isin(fwd, removed_union) | np.isin(rev, removed_union)
    write = keep & ~drop
    case = pot_c & 3
    ori1 = np.where(case < 2, "+", "-")
    ori2 = np.where((case & 1) == 0, "+", "-")
    shift = np.where(case < 2, local_shift0[loc], local_shift1[loc]) \
        .astype(np.int64)
    overlap = np.minimum(local_seqlen[loc].astype(np.int64) - shift,
                         pot_len.astype(np.int64) - 1)
    lines = []
    for t in range(m):
        if write[t]:
            lines.append(f"L\t{i_gid[t]}\t{ori1[t]}\t{pot_j[t]}\t{ori2[t]}\t"
                         f"{overlap[t]}M\n")
    out.write("".join(lines))
    return int(write.sum())


def make_record_router(mesh, k: int, cap: int, mc: int, rcap: int,
                       B: int, B_host: int, d_local: int):
    """Jitted shard_map: route each owned node's .sequences payload
    (gid, meta, vec) to a device of the HOST that loaded its crossing read
    (meta[:, 4] holds the global read row; rows are contiguous per host
    within a round: host = (row % B) // B_host).

    Replaces the full-table process_allgather of (meta, vec) — each record
    crosses the interconnect exactly once, to exactly one host, so no host
    ever materializes another host's node payloads (round-4 verdict,
    'distributed edge/GFA phase' item: the .sequences leg).

    Records spread over the owner host's devices by gid to balance buckets.
    Returns (gid [n*rcap] u32 per shard with 0xFFFFFFFF padding,
    meta [n*rcap, mc] u32, vec [n*rcap, k] u64, dropped [replicated])."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    n = mesh.devices.size

    def step(vec, meta, n_pass, id_base):
        iota = jnp.arange(cap, dtype=jnp.int32)
        valid = iota < n_pass[0]
        gid = id_base[0].astype(jnp.uint32) + iota.astype(jnp.uint32)
        row = meta[:, 4].astype(jnp.int32)
        host = (row % B) // B_host
        dev = host * d_local + (gid % np.uint32(max(1, d_local))).astype(
            jnp.int32)
        owner = jnp.where(valid, dev, n)
        one_hot = owner[:, None] == jnp.arange(n + 1, dtype=jnp.int32)[None]
        rank = jnp.take_along_axis(
            jnp.cumsum(one_hot.astype(jnp.int32), axis=0) - 1,
            owner[:, None], axis=1)[:, 0]
        dropped = jnp.sum((rank >= rcap) & valid)
        b_gid, b_meta, b_vec = _bucket(
            owner, rank, rcap, n, [gid, meta, vec],
            [np.uint32(0xFFFFFFFF), np.uint32(0), np.uint64(0)])
        a2a = functools.partial(jax.lax.all_to_all, axis_name=AXIS,
                                split_axis=0, concat_axis=0, tiled=True)
        return (a2a(b_gid), a2a(b_meta), a2a(b_vec),
                jax.lax.psum(dropped, AXIS))

    return jax.jit(jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS, None), P(AXIS, None), P()),
    ))
