"""Device-resident k-min-mer counting: accumulate -> sort -> segment-reduce.

The reference's global concurrent hash (DashMap, main.rs:595) is replaced by a
sort-based counter that lives entirely in device HBM: every batch's windows
are appended to preallocated buffers (static-stride dynamic_update_slice, no
host roundtrip), and a single jitted finalize pass

  stable-sorts (key_lo, key_hi) with occurrence payloads,
  finds segment heads, segment-sums abundances,
  picks the min_abundance-th occurrence per key (the reference's
  'crossing' occurrence whose seqlen/shift/sequence get recorded,
  main.rs:680-707), and
  compacts per-node results to the buffer front.

Only the compacted per-node arrays ever cross the device->host link — the
axon relay's ~0.2 s/fetch latency made per-batch fetches the bottleneck.

Node IDs: deterministic first-occurrence order (host argsort over first_occ),
replacing the reference's thread-arrival-order atomic (main.rs:598).
"""

from __future__ import annotations

import functools

import numpy as np


def _append(buffers, offset, keys, meta, vecs, read_base):
    """Write one batch's windows at [offset, offset+B*W) (jitted)."""
    import jax
    import jax.numpy as jnp

    b_keys, b_meta, b_vecs = buffers
    offset = jnp.asarray(offset).astype(jnp.int32)
    B, W, _ = keys.shape
    flat_keys = keys.reshape(B * W, 2)
    rows = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.uint32)[:, None], (B, W)
    ).reshape(B * W, 1) + read_base
    flat_meta = jnp.concatenate([meta.reshape(B * W, 4), rows], axis=1)
    b_keys = jax.lax.dynamic_update_slice(b_keys, flat_keys, (offset, jnp.int32(0)))
    b_meta = jax.lax.dynamic_update_slice(b_meta, flat_meta, (offset, jnp.int32(0)))
    if b_vecs is not None:
        b_vecs = jax.lax.dynamic_update_slice(
            b_vecs, vecs.reshape(B * W, vecs.shape[-1]), (offset, jnp.int32(0))
        )
    return (b_keys, b_meta, b_vecs)


def _finalize(b_keys, b_meta, b_vecs, *, minab, node_cap, keep_all):
    """Sort + segment-reduce the accumulated windows (jitted).

    Returns per-node arrays compacted to [node_cap]:
      key [node_cap, 2], count, first_occ, meta-of-crossing [node_cap, 5],
      vec-of-crossing [node_cap, k], n_unique, node_overflow.
    """
    import jax
    import jax.numpy as jnp

    N = b_keys.shape[0]
    node_cap = min(node_cap, N - 1)  # slices below need node_cap + 1 <= N
    valid = (b_meta[:, 1] >> 31) > 0
    # invalid windows sink to the end as (MAX, MAX); a real fingerprint equal
    # to that value has probability 2^-128
    lo = jnp.where(valid, b_keys[:, 0], ~jnp.uint64(0))
    hi = jnp.where(valid, b_keys[:, 1], ~jnp.uint64(0))
    occ = jnp.arange(N, dtype=jnp.uint32)
    slo, shi, socc = jax.lax.sort((lo, hi, occ), num_keys=3)
    # num_keys=3 includes occ: stable within key groups by construction
    sval = ~((slo == ~jnp.uint64(0)) & (shi == ~jnp.uint64(0)))
    n_valid = sval.sum().astype(jnp.int32)
    prev_lo = jnp.concatenate([jnp.full((1,), ~jnp.uint64(0)), slo[:-1]])
    prev_hi = jnp.concatenate([jnp.full((1,), ~jnp.uint64(0)), shi[:-1]])
    head = ((slo != prev_lo) | (shi != prev_hi)) & sval
    n_unique_all = jnp.sum(head.astype(jnp.int32))

    # compact head metadata to the front with a second sort (scatter at these
    # sizes lowers to a serial loop on TPU); pad key = n_valid so the count of
    # the final segment comes out right from the position differences
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    hkey = jnp.where(head, iota, n_valid)
    hkey_s, h_lo, h_hi, h_occ = jax.lax.sort(
        (hkey, slo, shi, socc), num_keys=1
    )
    u_lo = h_lo[:node_cap]
    u_hi = h_hi[:node_cap]
    first_occ = h_occ[:node_cap]
    head_pos = hkey_s[:node_cap]
    next_head = jnp.concatenate([hkey_s[1 : node_cap + 1]])
    counts = (next_head - head_pos).astype(jnp.uint32)
    # crossing occurrence: (minab-1)-th element of the segment (clamped)
    cross_sorted_idx = jnp.minimum(
        head_pos.astype(jnp.uint32) + jnp.uint32(minab - 1), jnp.uint32(N - 1)
    )
    cross_occ = socc[cross_sorted_idx]
    cross_meta = b_meta[cross_occ]
    cross_vec = b_vecs[cross_occ] if b_vecs is not None else None
    # abundance filter (main.rs:922-933); `keep_all` does not bypass it — the
    # reference's --reference mode also retains only >= minab (reference runs
    # pass --minabund 1 to keep singletons, compare_kmers.py usage)
    passing = counts >= minab
    node_overflow = jnp.maximum(0, n_unique_all - node_cap)

    # compact passing nodes to the front (one more small sort) so the host
    # fetches only a prefix — the relay link makes every fetched byte count.
    # Order key = first_occ for passing nodes: the fetched prefix comes out
    # already in deterministic first-occurrence order (the node id order).
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


def make_fused_construct(params, B: int, L: int, M: int, n_batches: int):
    """One-dispatch construction: fori_loop over n_batches batches of staged
    device reads, extracting windows and appending into the counter buffers.

    The whole loop is a single jitted call — per-batch host dispatches cost
    ~50-150 ms each through the axon relay, so looping on device is the only
    way to reach compute-bound throughput.

    Returns jitted fn(all_codes [n_batches*B, L] u8, all_lengths [n_batches*B]
    i32, buffers) -> (buffers, n_overflow_reads).
    """
    import functools

    import jax
    import jax.numpy as jnp

    from .extract import _device_extract

    W = M - params.k + 1
    ek = dict(l=params.l, k=params.k, hash_bound=params.hash_bound, M=M,
              already_hpc=params.reads_already_hpc, compact_output=True,
              use_pallas=(params.engine == "pallas"))

    @functools.partial(jax.jit, donate_argnums=(2,))
    def construct(all_codes, all_lengths, buffers, window_base=0, read_base=0):
        """window_base/read_base: running offsets for chunked streaming (the
        CLI pipeline feeds the input in chunks; bench stages it whole)."""
        window_base = jnp.asarray(window_base).astype(jnp.int32)
        read_base = jnp.asarray(read_base).astype(jnp.uint32)

        def body(i, carry):
            bufs, n_over = carry
            codes = jax.lax.dynamic_slice(all_codes, (i * B, 0), (B, L))
            lengths = jax.lax.dynamic_slice(all_lengths, (i * B,), (B,))
            out = _device_extract(codes, lengths, **ek)
            bufs = _append(bufs, window_base + i * (B * W),
                           out["keys"], out["meta"],
                           out["vecs"] if bufs[2] is not None else None,
                           read_base + (i * B).astype(jnp.uint32))
            return bufs, n_over + out["overflow"].sum().astype(jnp.int32)

        bufs, n_over = jax.lax.fori_loop(
            0, n_batches, body, (buffers, jnp.int32(0))
        )
        return bufs, jnp.int32(n_batches * B * W), n_over

    return construct


class DeviceNodeCounter:
    """Whole-run device-resident counter (single-chip path).

    Capacity model: window_cap windows (each 16B key + 20B meta [+ 8k B vec]);
    HG002-scale runs exceed HBM and use the chunked host-merge path instead
    (core/pipeline device-table mode falls back automatically).
    """

    def __init__(self, k: int, window_cap: int, node_cap: int,
                 minab: int, keep_all: bool = False, store_vecs: bool = True):
        import jax
        import jax.numpy as jnp

        self.k = k
        self.window_cap = window_cap
        self.node_cap = node_cap
        self.minab = minab
        self.offset = 0
        self.n_dropped = 0
        self._jax = jax
        self.buffers = (
            jnp.zeros((window_cap, 2), dtype=jnp.uint64),
            jnp.zeros((window_cap, 5), dtype=jnp.uint32),
            jnp.zeros((window_cap, k), dtype=jnp.uint64) if store_vecs else None,
        )
        self._append = jax.jit(_append, donate_argnums=(0,))
        self._finalize = jax.jit(functools.partial(
            _finalize, minab=minab, node_cap=node_cap, keep_all=keep_all,
        ))

    def add(self, out: dict, read_base: int):
        """Append one compact extraction output (keys/meta/vecs device arrays)."""
        import jax.numpy as jnp

        B, W, _ = out["keys"].shape
        n = B * W
        if self.offset + n > self.window_cap:
            self.n_dropped += n
            return
        vecs = out["vecs"] if self.buffers[2] is not None else None
        self.buffers = self._append(
            self.buffers, self.offset, out["keys"], out["meta"], vecs,
            jnp.uint32(read_base),
        )
        self.offset += n

    def finalize(self) -> dict:
        """Run the device reduction; fetch only the passing-node prefix.

        Passing nodes are already compacted to the front in first-occurrence
        order, so node ids are simply 0..n_pass-1.  The prefix is fetched at
        the next power of two of n_pass (bounded set of slice shapes to keep
        compile-cache hits)."""
        b_keys, b_meta, b_vecs = self.buffers
        out = self._finalize(b_keys, b_meta, b_vecs)
        n_pass = int(np.asarray(out["n_pass"]))
        if int(np.asarray(out["node_overflow"])) > 0:
            raise RuntimeError(
                f"node_cap {self.node_cap} exceeded "
                f"({int(np.asarray(out['n_unique']))} uniques); raise node_cap"
            )
        cap2 = 1
        while cap2 < max(1, n_pass):
            cap2 <<= 1
        cap2 = min(cap2, self.node_cap)
        res = {}
        for name in ("key_lo", "key_hi", "count", "meta", "vec"):
            if name in out:
                res[name] = np.asarray(out[name][:cap2])[:n_pass]
        res["index"] = np.arange(n_pass, dtype=np.uint32)
        return res
