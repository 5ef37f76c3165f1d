"""Device-side GFA (k-1)-overlap edge join.

Replaces the host km_index hash join (native/gfawriter.cpp finish_impl, a
re-expression of /root/reference/src/main.rs:1014-1106) with one sort-based
equality join on device, so the per-node overlap fingerprints (gk, 65 B/node
— the single largest device->host transfer of the output path) never cross
the link: the host receives only the POT list (candidate edges before
presimp), ~12 B per candidate.

Exact order parity with the host join (and thus the reference):

  km_index insertion order   entry e = 2j + {0: prefix key, 1: suffix key},
                             e ascending == (node, pre-before-suf)
                             (gfawriter.cpp add_chunk_impl)
  probe order                p = 2i + {0: suffix key, 1: prefix key}
                             (finish_impl keys[0]=ksuf, then kpre)
  per candidate j            the four orientation cases in fixed order
                             (++, +-, -+, --)

One lax.sort over the concatenated catalog entries + probes (key128, then
entries-before-probes, then insertion order) groups every probe with its
candidate run; each probe tests up to G=16 candidates x 4 cases into a u64
POT bitmask, and edges are extracted in (probe, lane) order — exactly the
host emission order — with a cumsum + per-edge bit-rank select.  Probes
whose candidate run exceeds G report overflow and the caller falls back to
the host join (fetch gk, build km_index) for that run.

presimp (main.rs:1086-1090) stays on the HOST (native gfa_finish_pot): it
needs whole-run abundances and f64 arithmetic; the pot list arrives in group
order so the host applies it in one linear pass.
"""

from __future__ import annotations

import functools

import numpy as np

G_SLOTS = 16  # candidates per probe; 16*4 cases == one u64 POT bitmask


def _u128_where(cond, a, b):
    import jax.numpy as jnp

    return jnp.where(cond[:, None], a, b)


@functools.lru_cache(maxsize=None)
def _append_jit():
    import jax

    def upd(cat_gk, cat_gf, gk, gf, off):
        import jax.numpy as jnp

        zero = jnp.int32(0)
        cat_gk = jax.lax.dynamic_update_slice(cat_gk, gk, (off, zero))
        cat_gf = jax.lax.dynamic_update_slice(cat_gf, gf, (off,))
        return cat_gk, cat_gf

    return jax.jit(upd, donate_argnums=(0, 1))


@functools.lru_cache(maxsize=None)
def _permute_jit():
    import jax

    def perm(cat_gk, cat_gf, order):
        return cat_gk[order], cat_gf[order]

    # no donation: the gather output has the (smaller, pow2-bucketed) order
    # shape, so the catalog buffers can never be reused in place
    return jax.jit(perm)


class DeviceKeyCatalog:
    """Bounded device-resident overlap-key catalog for the chunked driver.

    The chunked (>HBM) path assembles node metadata per chunk but used to
    fetch every node's 65 B overlap fingerprints to the host for the GFA
    edge join.  This catalog instead APPENDS each chunk's crossing keys on
    device (rows arrive in crossing-occurrence order, i.e. node-id-assignment
    order per chunk); at GFA time the host uploads the 4 B/node id-order
    permutation and the device sort-join (edge_join_device) ships only the
    ~12 B/candidate POT list.  Reference semantics: main.rs:1014-1106.

    Bounded: `cap` rows (72 B each).  When a chunk would overflow, the caller
    spills the catalog to host (one bulk fetch) and continues on the host
    join — exactness is never at stake, only transfer volume.
    """

    def __init__(self, cap: int):
        import jax.numpy as jnp

        self.cap = int(cap)
        self.n = 0
        self._gk = jnp.zeros((self.cap, 8), jnp.uint64)
        self._gf = jnp.zeros((self.cap,), jnp.uint8)

    def fits(self, padded_rows: int) -> bool:
        """Would an append of a `padded_rows`-row block still fit?  The
        update block is written PADDED (next append overwrites the pad), so
        the bound is on n + padded block, not n + n_new."""
        return self.n + padded_rows <= self.cap

    def append(self, gk_dev, gf_dev, n_new: int) -> None:
        """gk_dev [p, 8] u64 / gf_dev [p] u8 device arrays, rows >= n_new
        are padding.  Caller must have checked fits(p)."""
        import jax.numpy as jnp

        self._gk, self._gf = _append_jit()(
            self._gk, self._gf, gk_dev, gf_dev, jnp.int32(self.n))
        self.n += int(n_new)

    def spill(self):
        """Fetch the catalog to host: (gk [n,8] u64, gflag [n] u8) in append
        order.  Invalidates the catalog (buffers freed)."""
        gk = np.asarray(self._gk[: self.n])
        gf = np.asarray(self._gf[: self.n])
        self._gk.delete()
        self._gf.delete()
        self._gk = self._gf = None
        return gk, gf

    def join(self, order: np.ndarray):
        """Permute the catalog into node-id order (order[r] = append-row of
        the node with id-rank r) and dispatch the device edge join.  Returns
        (PotJoin, permuted_gk, permuted_gf) — the permuted device arrays
        serve the host-join fallback if the join overflows G_SLOTS."""
        import jax.numpy as jnp

        from .sort_count import PotJoin

        n = len(order)
        cap2 = 8
        while cap2 < n:
            cap2 <<= 1
        cap2 = min(cap2, self.cap)
        padded = np.zeros(cap2, dtype=np.int32)
        padded[:n] = order
        gk_p, gf_p = _permute_jit()(self._gk, self._gf, jnp.asarray(padded))
        self._gk = self._gf = None  # donated
        return PotJoin(gk_p, gf_p, n), gk_p, gf_p


@functools.lru_cache(maxsize=None)
def _jitted():
    import jax

    return jax.jit(_edge_join_impl, static_argnames=("edge_cap",))


def edge_join_device(gk, gflag, n_pass, *, edge_cap: int):
    """Jitted entry — see _edge_join_impl."""
    return _jitted()(gk, gflag, n_pass, edge_cap=edge_cap)


def _edge_join_impl(gk, gflag, n_pass, *, edge_cap: int):
    """Sort-join the per-node overlap keys into the POT candidate list.

    gk    [n, 8] u64  (Fs, Fp, FsR, FpR as (lo, hi) pairs — the
                      _overlap_keys_device layout)
    gflag [n]   u8    bit0: suffix already canonical, bit1: prefix
    n_pass traced i32: rows >= n_pass are padding

    Returns dict:
      pot_i, pot_j [edge_cap] u32   candidate edge endpoints (node ids)
      pot_c        [edge_cap] u32   (ki << 2) | case  (case: 0 ++, 1 +-,
                                    2 -+, 3 --; ki: 0 probe-by-suffix)
      stats2       [2] i32          (n_pot, g_overflow_count)
    POT entries beyond n_pot are padding.  g_overflow_count > 0 means some
    probe had more than G_SLOTS candidates: results are incomplete and the
    caller must use the host join instead.
    """
    import jax
    import jax.numpy as jnp

    n = gk.shape[0]
    iota_n = jnp.arange(n, dtype=jnp.int32)
    valid = iota_n < n_pass
    maxu = ~jnp.uint64(0)

    Fs, Fp, FsR, FpR = gk[:, 0:2], gk[:, 2:4], gk[:, 4:6], gk[:, 6:8]
    ksuf = _u128_where((gflag & 1).astype(bool), Fs, FsR)
    kpre = _u128_where((gflag & 2).astype(bool), Fp, FpR)

    # merged stream: 2n catalog entries (pre at 2j, suf at 2j+1) then 2n
    # probes (suf at 2i, pre at 2i+1), each (key128, tor, payload) where
    # tor = is_probe << 31 | insertion/probe order — the sort key
    # (hi, lo, tor) therefore groups by key with entries (in insertion
    # order) before probes.  Invalid rows get MAX keys AND the probe tag, so
    # they can never sit inside a real run's entry region.
    ent_key = jnp.stack([kpre, ksuf], axis=1).reshape(2 * n, 2)  # e = 2j+kc
    prb_key = jnp.stack([ksuf, kpre], axis=1).reshape(2 * n, 2)  # p = 2i+ki
    ord2 = jnp.arange(2 * n, dtype=jnp.uint32)
    v2 = jnp.repeat(valid, 2)
    ent_key = jnp.where(v2[:, None], ent_key, maxu)
    prb_key = jnp.where(v2[:, None], prb_key, maxu)
    probe_bit = jnp.uint32(1 << 31)
    ent_tor = jnp.where(v2, ord2, ord2 | probe_bit)
    prb_tor = ord2 | probe_bit

    key_hi = jnp.concatenate([ent_key[:, 1], prb_key[:, 1]])
    key_lo = jnp.concatenate([ent_key[:, 0], prb_key[:, 0]])
    tor = jnp.concatenate([ent_tor, prb_tor])
    # payload: catalog node j for entries; probe index p for probes
    payload = jnp.concatenate([ord2 >> 1, ord2])

    shi, slo, stor, spay = jax.lax.sort((key_hi, key_lo, tor, payload),
                                        num_keys=3)
    is_probe = (stor & probe_bit) != 0
    is_entry = ~is_probe

    N4 = 4 * n
    pos = jax.lax.broadcasted_iota(jnp.int32, (N4, 1), 0)[:, 0]
    prev_hi = jnp.concatenate([maxu[None], shi[:-1]])
    prev_lo = jnp.concatenate([maxu[None], slo[:-1]])
    head = (shi != prev_hi) | (slo != prev_lo)
    # run start position per row (inclusive max-scan over head positions)
    from .sort_count import _scan_max_i32

    glo = _scan_max_i32(jnp.where(head, pos, -1))
    ent_excl = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(is_entry.astype(jnp.int32))])  # entries in [0, pos)
    gcount = ent_excl[pos] - ent_excl[glo]  # entries in [glo, pos)

    # scatter probe (glo, gcount) back to probe order: one u32-key sort
    back_key = jnp.where(is_probe, stor & ~probe_bit, jnp.uint32(0xFFFFFFFF))
    _, p_glo, p_gcount = jax.lax.sort((back_key, glo, gcount), num_keys=1)
    p_glo = p_glo[: 2 * n]
    p_gcount = p_gcount[: 2 * n]

    # candidate matrix [2n, G]: j from the sorted catalog payload
    g_iota = jnp.arange(G_SLOTS, dtype=jnp.int32)
    slot_pos = jnp.clip(p_glo[:, None] + g_iota[None, :], 0, N4 - 1)
    slot_ok = g_iota[None, :] < jnp.minimum(p_gcount, G_SLOTS)[:, None]
    j_mat = spay[slot_pos].astype(jnp.int32)  # [2n, G]
    j_mat = jnp.where(slot_ok, j_mat, 0)

    # orientation case tests (gfawriter.cpp finish_impl):
    #   fs1 == fp2 (++), fs1 == fsr2 (+-), fpr1 == fp2 (-+), fpr1 == fsr2 (--)
    i_of_p = jnp.repeat(iota_n, 2)  # [2n]
    fs1 = Fs[i_of_p]     # [2n, 2]
    fpr1 = FpR[i_of_p]
    fp2 = Fp[j_mat.reshape(-1)].reshape(2 * n, G_SLOTS, 2)
    fsr2 = FsR[j_mat.reshape(-1)].reshape(2 * n, G_SLOTS, 2)

    def eq(a1, b2):  # [2n, 2] vs [2n, G, 2]
        return ((a1[:, None, 0] == b2[..., 0])
                & (a1[:, None, 1] == b2[..., 1]))

    c0 = eq(fs1, fp2)
    c1 = eq(fs1, fsr2)
    c2 = eq(fpr1, fp2)
    c3 = eq(fpr1, fsr2)
    pvalid = jnp.repeat(valid, 2)[:, None] & slot_ok
    cases = jnp.stack([c0, c1, c2, c3], axis=-1) & pvalid[..., None]

    # POT bitmask per probe: bit g*4 + c — LSB-first rank == host emission
    # order (candidates in catalog order, cases in fixed order)
    bit_idx = (g_iota[:, None] * 4
               + jnp.arange(4, dtype=jnp.int32)[None, :]).astype(jnp.uint64)
    mask = jnp.sum(
        jnp.where(cases, jnp.uint64(1) << bit_idx[None], jnp.uint64(0)),
        axis=(1, 2), dtype=jnp.uint64)  # [2n]

    c_p = jax.lax.population_count(mask).astype(jnp.int32)
    cum = jnp.cumsum(c_p)
    n_pot = cum[-1]
    g_over = jnp.sum(
        (p_gcount > G_SLOTS) & jnp.repeat(valid, 2)).astype(jnp.int32)

    # extract POT entries in (probe, lane) order
    s = jnp.arange(edge_cap, dtype=jnp.int32)
    p_of_s = jnp.searchsorted(cum, s, side="right").astype(jnp.int32)
    p_of_s = jnp.minimum(p_of_s, 2 * n - 1)
    excl = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
    r = s - excl[p_of_s]
    m_s = mask[p_of_s]

    # lane = position of the r-th set bit of m_s (binary select w/ popcount)
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

    ok = s < n_pot
    j_of_s = spay[jnp.clip(p_glo[p_of_s] + g_of_s, 0, N4 - 1)]
    pot_i = jnp.where(ok, (p_of_s >> 1).astype(jnp.uint32), jnp.uint32(0))
    pot_j = jnp.where(ok, j_of_s.astype(jnp.uint32), jnp.uint32(0))
    # u8 on the wire (values < 8); the host widens on ingest
    pot_c = jnp.where(
        ok, (((p_of_s & 1) << 2) | case_of_s).astype(jnp.uint8),
        jnp.uint8(0))
    return dict(pot_i=pot_i, pot_j=pot_j, pot_c=pot_c,
                stats2=jnp.stack([n_pot, g_over]))
