"""Multi-chip mdBG construction step: sharded extraction + all_to_all counting.

TPU-native re-expression of the reference's shared-memory concurrency
(SURVEY §2 P1-P3):

  P1 (seq_io worker pool)  -> read batches data-sharded over the mesh axis;
  P2 (DashMap counter)     -> k-min-mer ownership by key hash: every device
                              extracts windows from its read shard, routes
                              each window to owner = key mod n_shards with one
                              `all_to_all`, and the owner counts locally by
                              sort + segment-reduce;
  P3 (NODE_INDEX atomic)   -> deterministic global IDs: exclusive scan over
                              per-shard unique counts (psum/all_gather), plus
                              local rank in sorted key order.

`sharded_count_step` builds the jitted full step over a Mesh; this is what
`__graft_entry__.dryrun_multichip` compiles and runs on a virtual device mesh,
and what the multi-host pipeline invokes per batch round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import AXIS


def _bucket_by_owner(key_lo, key_hi, payload, valid, n_shards, cap):
    """Scatter windows into [n_shards, cap] buckets by owner shard.

    Returns (b_lo, b_hi, b_payload, b_valid, n_dropped); deterministic layout:
    windows keep their original order within each destination bucket.
    """
    N = key_lo.shape[0]
    owner = (key_lo % np.uint64(n_shards)).astype(jnp.int32)
    owner = jnp.where(valid, owner, n_shards)  # invalid -> dropped
    # rank within destination bucket = running count of same-owner windows
    one_hot = (owner[:, None] == jnp.arange(n_shards + 1, dtype=jnp.int32)[None, :])
    rank = (jnp.cumsum(one_hot.astype(jnp.int32), axis=0) - 1)
    rank = jnp.take_along_axis(rank, owner[:, None], axis=1)[:, 0]
    dropped = jnp.sum((rank >= cap) & valid)
    slot = jnp.where((owner < n_shards) & (rank < cap), owner * cap + rank,
                     n_shards * cap)
    flat = n_shards * cap

    def scat(vals, fill):
        base = jnp.full((flat,), fill, dtype=vals.dtype)
        return base.at[slot].set(vals, mode="drop")

    b_lo = scat(key_lo, np.uint64(0)).reshape(n_shards, cap)
    b_hi = scat(key_hi, np.uint64(0)).reshape(n_shards, cap)
    b_pay = scat(payload, np.uint32(0)).reshape(n_shards, cap)
    b_val = scat(valid.astype(jnp.int8), np.int8(0)).reshape(n_shards, cap) > 0
    return b_lo, b_hi, b_pay, b_val, dropped


def _count_local(key_lo, key_hi, valid):
    """Sort + segment-reduce: unique keys with counts, padded to input size.

    Returns (u_lo, u_hi, counts, is_unique_head, n_unique, local_rank)."""
    N = key_lo.shape[0]
    # sort by (valid desc, lo, hi): invalid sink to the end via max key
    lo = jnp.where(valid, key_lo, jnp.uint64(0xFFFFFFFFFFFFFFFF))
    hi = jnp.where(valid, key_hi, jnp.uint64(0xFFFFFFFFFFFFFFFF))
    v = valid.astype(jnp.int32)
    slo, shi, sv = jax.lax.sort((lo, hi, v), num_keys=2)
    prev_lo = jnp.concatenate([jnp.full((1,), ~jnp.uint64(0)), slo[:-1]])
    prev_hi = jnp.concatenate([jnp.full((1,), ~jnp.uint64(0)), shi[:-1]])
    head = ((slo != prev_lo) | (shi != prev_hi)) & (sv > 0)
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1  # segment id per element
    counts = jnp.zeros((N,), dtype=jnp.uint32).at[
        jnp.where(sv > 0, seg, N)
    ].add(1, mode="drop")
    n_unique = jnp.sum(head.astype(jnp.int32))
    # compact unique keys to the front (they are already grouped; gather heads)
    rank = jnp.cumsum(head.astype(jnp.int32)) - 1
    slot = jnp.where(head, rank, N)
    u_lo = jnp.zeros((N,), dtype=jnp.uint64).at[slot].set(slo, mode="drop")
    u_hi = jnp.zeros((N,), dtype=jnp.uint64).at[slot].set(shi, mode="drop")
    return u_lo, u_hi, counts, n_unique


def _count_step(codes, lengths, *, extract_kwargs, n_shards, route_cap):
    """Per-shard body (runs under shard_map): extract, route, count, index."""
    from ..ops.extract import _device_extract

    out = _device_extract(codes, lengths, **extract_kwargs)
    B, W = out["valid_w"].shape
    key_lo = out["key_lo"].reshape(-1)
    key_hi = out["key_hi"].reshape(-1)
    valid = out["valid_w"].reshape(-1)
    payload = out["seqlen"].reshape(-1).astype(jnp.uint32)

    b_lo, b_hi, b_pay, b_val, dropped = _bucket_by_owner(
        key_lo, key_hi, payload, valid, n_shards, route_cap
    )
    # the all_to_all: shard d receives bucket[d] from every source
    r_lo = jax.lax.all_to_all(b_lo, AXIS, split_axis=0, concat_axis=0, tiled=True)
    r_hi = jax.lax.all_to_all(b_hi, AXIS, split_axis=0, concat_axis=0, tiled=True)
    r_val = jax.lax.all_to_all(
        b_val.astype(jnp.int8), AXIS, split_axis=0, concat_axis=0, tiled=True
    ) > 0

    u_lo, u_hi, counts, n_unique = _count_local(
        r_lo.reshape(-1), r_hi.reshape(-1), r_val.reshape(-1)
    )
    # deterministic global id base: exclusive scan of per-shard unique counts
    my = jax.lax.axis_index(AXIS)
    all_counts = jax.lax.all_gather(n_unique, AXIS)  # [n_shards]
    base = jnp.sum(jnp.where(jnp.arange(n_shards) < my, all_counts, 0))
    # dropped: route-capacity overflow; overflow: reads whose minimizers
    # exceeded M (extraction capacity).  Both are psum'd so any nonzero value
    # tells the caller to re-run affected rows with a larger capacity / on the
    # host path (exactness guard).
    total_dropped = jax.lax.psum(dropped, AXIS)
    total_overflow = jax.lax.psum(jnp.sum(out["overflow"].astype(jnp.int32)), AXIS)
    return dict(
        unique_lo=u_lo, unique_hi=u_hi, counts=counts,
        n_unique=n_unique[None], id_base=base[None],
        dropped=total_dropped[None], overflow=total_overflow[None],
    )


def make_sharded_count_step(mesh, params, B, L, M, route_cap=None):
    """Jitted multi-chip count step over `mesh`.

    codes [B, L] / lengths [B] are sharded on the batch axis; outputs are
    per-shard (rank-local) arrays.  B must be divisible by mesh size.
    """
    n = mesh.devices.size
    if route_cap is None:
        # expected windows per (src, dst) pair, with 3x headroom
        per_dev = (B // n) * max(1, M - params.k + 1)
        route_cap = max(64, (3 * per_dev) // n)
    extract_kwargs = dict(
        l=params.l, k=params.k, hash_bound=params.hash_bound, M=M,
        already_hpc=params.reads_already_hpc,
    )
    body = functools.partial(
        _count_step, extract_kwargs=extract_kwargs, n_shards=n,
        route_cap=route_cap,
    )
    smapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS)),
        out_specs=P(AXIS),
    )
    fn = jax.jit(smapped)
    in_shardings = (
        NamedSharding(mesh, P(AXIS, None)),
        NamedSharding(mesh, P(AXIS)),
    )
    return fn, in_shardings, route_cap


def sharded_counts_to_host(out, n_shards):
    """Collect (key -> count) dict from a sharded step output (test helper)."""
    res: dict[tuple[int, int], int] = {}
    n_unique = np.asarray(out["n_unique"]).reshape(-1)
    u_lo = np.asarray(out["unique_lo"]).reshape(n_shards, -1)
    u_hi = np.asarray(out["unique_hi"]).reshape(n_shards, -1)
    counts = np.asarray(out["counts"]).reshape(n_shards, -1)
    for s in range(n_shards):
        for i in range(int(n_unique[s])):
            res[(int(u_lo[s, i]), int(u_hi[s, i]))] = int(counts[s, i])
    return res
