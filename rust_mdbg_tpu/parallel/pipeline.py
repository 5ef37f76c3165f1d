"""Multi-chip mdBG construction pipeline (production shape of SURVEY P1-P3).

Extends parallel/sharded.py's one-shot count step to a full streaming run:

  per round (one jitted call over the mesh):
    - every device extracts windows from its read shard          (P1)
    - windows route to owner = key mod n via one all_to_all      (P2)
    - each owner APPENDS received windows (keys/meta/vecs) into
      its device-resident shard buffers at the round offset
  finalize (one jitted call):
    - per-shard sort + segment-reduce with crossing-occurrence
      capture (the same _finalize as the single-chip counter)
    - deterministic global ids: exclusive scan of per-shard
      passing-node counts (all_gather)                           (P3)

Node ids come out grouped by owner shard and ordered by first occurrence
within each shard — deterministic, graph-isomorphic to the single-chip
order.  Host-side outputs (.sequences, GFA) reuse the native writers.

On this box the mesh is virtual (CPU devices) — the driver's
dryrun_multichip compiles/executes the same code; on a real pod slice the
all_to_all rides ICI.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..params import staging_width
from .mesh import AXIS
from .sharded import _bucket_by_owner


def make_sharded_pipeline(mesh, params, B, L, M, window_cap, node_cap,
                          route_cap=None):
    """Returns (step_fn, finalize_fn, make_buffers, shardings).

    B = GLOBAL batch rows per round (divisible by mesh size);
    window_cap/node_cap are PER SHARD.  Buffers are sharded arrays with
    leading dim n*window_cap (window_cap rows per shard).
    """
    from ..ops.extract import _device_extract

    n = mesh.devices.size
    W = M - params.k + 1
    k = params.k
    B_local = B // n
    if route_cap is None:
        route_cap = max(64, (3 * B_local * W) // n)
    ek = dict(l=params.l, k=params.k, hash_bound=params.hash_bound, M=M,
              already_hpc=params.reads_already_hpc, compact_output=True,
              use_pallas=(params.engine == "pallas"),
              ref_cuts=getattr(params, "seq_ref_cuts", False))
    # meta columns routed with each window: extract's 4 (+extpack on raw
    # inputs) + the global read row; row stays at column 4 (consumers index
    # it there), extpack lands at column 5
    mc = 5 if (params.reads_already_hpc
               or getattr(params, "seq_ref_cuts", False)) else 6
    recv = n * route_cap  # windows landing per shard per round

    def _step(codes, lengths, b_lo, b_hi, b_meta, b_vecs, offset,
              read_base):
        out = _device_extract(codes, lengths, **ek)
        key_lo = out["keys"][..., 0].reshape(-1)
        key_hi = out["keys"][..., 1].reshape(-1)
        valid = (out["meta"][..., 1].reshape(-1) >> 31) > 0
        # payload = row index within this shard's batch; meta columns +
        # vecs route alongside in their own buckets
        my = jax.lax.axis_index(AXIS)
        rows_g = (
            jax.lax.broadcasted_iota(jnp.uint32, (B_local, W), 0).reshape(-1)
            + read_base + (my * B_local).astype(jnp.uint32)
        )
        m4 = out["meta"].reshape(-1, out["meta"].shape[-1])
        meta5 = jnp.concatenate(
            [m4[:, :4], rows_g[:, None], m4[:, 4:]], axis=1
        )

        owner = (key_lo % np.uint64(n)).astype(jnp.int32)
        owner = jnp.where(valid, owner, n)
        one_hot = owner[:, None] == jnp.arange(n + 1, dtype=jnp.int32)[None, :]
        rank = jnp.cumsum(one_hot.astype(jnp.int32), axis=0) - 1
        rank = jnp.take_along_axis(rank, owner[:, None], axis=1)[:, 0]
        dropped = jnp.sum((rank >= route_cap) & valid)
        slot = jnp.where((owner < n) & (rank < route_cap),
                         owner * route_cap + rank, n * route_cap)
        flat = n * route_cap

        def scat(vals, fill, extra=()):
            base = jnp.full((flat,) + extra, fill, dtype=vals.dtype)
            return base.at[slot].set(vals, mode="drop")

        bk_lo = scat(key_lo, np.uint64(0))
        bk_hi = scat(key_hi, np.uint64(0))
        bmeta = scat(meta5, np.uint32(0), (mc,))
        bvecs = scat(out["vecs"].reshape(-1, k), np.uint64(0), (k,))

        a2a = functools.partial(jax.lax.all_to_all, axis_name=AXIS,
                                split_axis=0, concat_axis=0, tiled=True)
        r_lo = a2a(bk_lo)
        r_hi = a2a(bk_hi)
        r_meta = a2a(bmeta)
        r_vecs = a2a(bvecs)

        # keys appended as separate lo/hi planes: a [N, 2] u64 buffer can
        # take a T(8,128) tiled copy on real TPU (minor dim 2 pads 64x; the
        # single-chip counter hit 9 GB of padding before the same split)
        b_lo = jax.lax.dynamic_update_slice(b_lo, r_lo, (offset,))
        b_hi = jax.lax.dynamic_update_slice(b_hi, r_hi, (offset,))
        b_meta = jax.lax.dynamic_update_slice(b_meta, r_meta,
                                              (offset, jnp.int32(0)))
        b_vecs = jax.lax.dynamic_update_slice(b_vecs, r_vecs,
                                              (offset, jnp.int32(0)))
        n_over = out["overflow"].sum().astype(jnp.int32)
        return b_lo, b_hi, b_meta, b_vecs, jax.lax.psum(dropped, AXIS), \
            jax.lax.psum(n_over, AXIS)

    def _fin(b_lo, b_hi, b_meta, b_vecs):
        from ..ops.sort_count import _finalize

        res = _finalize(b_lo, b_hi, b_meta, b_vecs,
                        minab=params.min_kmer_abundance, node_cap=node_cap,
                        keep_all=False)
        my = jax.lax.axis_index(AXIS)
        all_pass = jax.lax.all_gather(res["n_pass"], AXIS)
        base = jnp.sum(jnp.where(jnp.arange(n) < my, all_pass, 0))
        res["id_base"] = base[None]
        for key in ("n_pass", "n_unique", "node_overflow"):
            res[key] = res[key][None]
        return res

    step = jax.jit(jax.shard_map(
        _step, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(AXIS),
                  P(AXIS, None), P(AXIS, None), P(), P()),
        out_specs=(P(AXIS), P(AXIS), P(AXIS, None), P(AXIS, None),
                   P(), P()),
    ), donate_argnums=(2, 3, 4, 5))
    fin = jax.jit(jax.shard_map(
        _fin, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS, None), P(AXIS, None)),
        out_specs=P(AXIS),
    ))

    def make_buffers():
        sh2 = NamedSharding(mesh, P(AXIS, None))
        sh1 = NamedSharding(mesh, P(AXIS))
        return (
            jax.device_put(np.zeros(n * window_cap, dtype=np.uint64), sh1),
            jax.device_put(np.zeros(n * window_cap, dtype=np.uint64), sh1),
            jax.device_put(np.zeros((n * window_cap, mc), dtype=np.uint32),
                           sh2),
            jax.device_put(np.zeros((n * window_cap, k), dtype=np.uint64),
                           sh2),
        )

    in_shardings = (
        NamedSharding(mesh, P(AXIS, None)),
        NamedSharding(mesh, P(AXIS)),
    )
    return step, fin, make_buffers, in_shardings, recv


def assemble_sharded(reads_path: str, params, prefix: str,
                     n_devices: int | None = None) -> dict:
    """Full multi-device assembly to GFA + .sequences."""
    from ..core.graph import build_gfa
    from ..io import fastx
    from ..io.sequences import remove_stale, write_records_native_sharded
    from ..ops.extract import DeviceExtractor
    from .mesh import make_mesh

    mesh = make_mesh(n_devices)
    n = mesh.devices.size
    mean_len, mx = fastx.read_first_n_reads(reads_path, 100)
    L = params.max_read_len or staging_width(mx)
    B = ((params.batch_reads + n - 1) // n) * n
    dev = DeviceExtractor(params)
    M = dev.capacity(L)
    W = M - params.k + 1

    import os as _os

    fsize = _os.path.getsize(reads_path)
    if str(reads_path).endswith((".gz", ".lz4")):
        fsize *= 6  # DNA text compresses ~3.5-4x; headroom on top
    est_reads = max(n * 64, int(3.0 * fsize / max(1, mean_len)))
    n_rounds_est = (est_reads + B - 1) // B
    route_cap = max(64, (3 * (B // n) * W) // n)
    window_cap = n_rounds_est * n * route_cap  # per shard
    step, fin, make_buffers, shardings, recv = make_sharded_pipeline(
        mesh, params, B, L, M, window_cap, node_cap=1 << 20,
        route_cap=route_cap,
    )
    buffers = make_buffers()
    # trust the ALLOCATED capacity, not the requested one: a mismatch would
    # make the in-loop dynamic_update_slice clamp and silently overwrite
    # the tail rows
    window_cap = buffers[0].shape[0] // n

    remove_stale(prefix)
    raw_reads: list[bytes] = []
    nb_reads = 0
    offset = 0
    read_base = 0
    drops = []
    for batch in fastx.batches(reads_path, B, L):
        codes = jax.device_put(batch.codes, shardings[0])
        lengths = jax.device_put(batch.lengths, shardings[1])
        blo, bhi, bm, bv, dropped, n_over = step(
            codes, lengths, *buffers, np.int32(offset), np.uint32(read_base)
        )
        buffers = (blo, bhi, bm, bv)
        drops.append((dropped, n_over))
        raw_reads.extend(batch.raw)
        nb_reads += batch.n_reads
        offset += recv
        read_base += B
        if offset + recv > window_cap:
            # adaptive growth: double every shard's local block in place
            # (rows stay device-resident and sharded; zero rows are inert
            # in finalize since their valid bit is unset).  Doubling keeps
            # the number of distinct compiled shapes logarithmic.
            def _grow(blo, bhi, bm, bv, _cap=window_cap):
                def pad(x):
                    return jnp.concatenate(
                        [x, jnp.zeros((_cap,) + x.shape[1:], x.dtype)],
                        axis=0)
                return pad(blo), pad(bhi), pad(bm), pad(bv)

            specs = (P(AXIS), P(AXIS), P(AXIS, None), P(AXIS, None))
            buffers = jax.jit(
                jax.shard_map(_grow, mesh=mesh, in_specs=specs,
                              out_specs=specs),
                donate_argnums=(0, 1, 2, 3),
            )(*buffers)
            window_cap *= 2
    res = fin(*buffers)
    for d, o in drops:
        if int(np.asarray(d).reshape(-1)[0]) or int(np.asarray(o).reshape(-1)[0]):
            raise RuntimeError("route/extraction overflow in sharded run")

    # collect per-shard results with global id bases
    n_pass = np.asarray(res["n_pass"]).reshape(-1)
    bases = np.asarray(res["id_base"]).reshape(-1)
    key_shape = np.asarray(res["key_lo"]).reshape(n, -1)
    counts = np.asarray(res["count"]).reshape(n, -1)
    meta_all_arr = np.asarray(res["meta"])
    mc = meta_all_arr.shape[-1]
    metas = meta_all_arr.reshape(n, key_shape.shape[1], mc)
    vecs = np.asarray(res["vec"]).reshape(n, key_shape.shape[1], params.k)
    idx_all, cnt_all, meta_all, vec_all = [], [], [], []
    for s in range(n):
        m = int(n_pass[s])
        idx_all.append(np.arange(bases[s], bases[s] + m, dtype=np.uint32))
        cnt_all.append(counts[s, :m])
        meta_all.append(metas[s, :m])
        vec_all.append(vecs[s, :m])
    index = np.concatenate(idx_all)
    count = np.concatenate(cnt_all)
    meta = np.concatenate(meta_all)
    vec = np.concatenate(vec_all)

    stats = dict(nb_reads=nb_reads, nb_windows=int(count.sum()),
                 n_devices=n)
    if not params.no_basespace and len(index):
        offsets = np.zeros(len(raw_reads) + 1, dtype=np.int64)
        np.cumsum([len(r) for r in raw_reads], out=offsets[1:])
        blob = np.frombuffer(b"".join(raw_reads), dtype=np.uint8)
        start_a = meta[:, 3].astype(np.int64)
        read_g = meta[:, 4].astype(np.int64)
        abs_start = offsets[read_g] + start_a
        abs_end = abs_start + meta[:, 0].astype(np.int64) + (params.l - 2)
        rev8 = (meta[:, 2] >> 31).astype(np.uint8)
        sq0 = (meta[:, 1] & 0x7FFFFFFF).astype(np.uint16)
        sq1 = (meta[:, 2] & 0x7FFFFFFF).astype(np.uint16)
        if mc > 5:
            # exact-cut corrections (extpack col 5, ops/extract compact meta)
            from ..ops.extract import _unpack_ext

            ext_delta, de1 = _unpack_ext(meta[:, 5])
            abs_end = abs_end + ext_delta
            r = rev8.astype(bool)
            sq0 = np.where(r, sq0 + de1, sq0).astype(np.uint16)
            sq1 = np.where(r, sq1, sq1 + de1).astype(np.uint16)
        write_records_native_sharded(
            prefix, params.k, params.l, index, vec, blob, abs_start, abs_end,
            rev8, sq0, sq1,
            n_shards=params.threads,
        )
    g = None
    if os.environ.get("MDBG_SHARDED_EDGES", "1") != "0":
        g = _distributed_gfa(mesh, params, prefix, res, n_pass, bases,
                             key_shape.shape[1])
    if g is None:
        # fallback: single-host km_index join over the gathered table
        nodes = dict(
            index=index, abundance=count,
            seqlen=meta[:, 0].astype(np.uint32),
            shift0=(meta[:, 1] & 0x7FFFFFFF).astype(np.uint16),
            shift1=(meta[:, 2] & 0x7FFFFFFF).astype(np.uint16),
        )
        g = build_gfa(f"{prefix}.gfa", nodes, vec, presimp=params.presimp)
    stats.update(g)
    return stats


def _distributed_gfa(mesh, params, prefix, res, n_pass, bases, cap,
                     out_path: str | None = None) -> dict | None:
    """Distributed edge construction + GFA emission (parallel/edges.py):
    two all_to_all rounds replace the single-host km_index join — no shard
    ever holds another shard's node table.  Returns None on capacity
    overflow (caller falls back to the gathered join).

    Byte-identical to the single-chip writer: S lines per shard in global id
    order, L lines per probe-owner shard in the host join's exact emission
    order, symmetric presimp drops exchanged globally
    (main.rs:1006-1117 semantics)."""
    import jax

    from .edges import emit_l_lines, make_sharded_edge_join, presimp_pass

    n = mesh.devices.size
    total = int(n_pass.sum())
    max_np = int(n_pass.max()) if len(n_pass) else 0
    rcap = 64
    while rcap < max(64, (8 * max(1, max_np)) // n):
        rcap *= 2
    pot_cap = 1024
    while pot_cap < max(1024, 8 * max(1, max_np)):
        pot_cap *= 2
    pot_cap = ((pot_cap + n - 1) // n) * n
    join = make_sharded_edge_join(mesh, params.k, cap, rcap, pot_cap)
    seqlen_dev = jax.jit(lambda m: m[:, 0])(res["meta"])
    out = join(res["vec"], res["count"], seqlen_dev, res["n_pass"],
               res["id_base"], jax.device_put(bases.astype(np.uint32)))
    so, sr, sj, sc, sab, slen, n_pot, overflow = out
    overflow = np.asarray(overflow)
    if overflow.any():
        import warnings

        warnings.warn(
            f"sharded edge join overflow {overflow.tolist()}; falling back "
            "to the single-host join")
        return None

    so = np.asarray(so).reshape(n, -1)
    sr = np.asarray(sr).reshape(n, -1)
    sj = np.asarray(sj).reshape(n, -1)
    sc = np.asarray(sc).reshape(n, -1)
    sab = np.asarray(sab).reshape(n, -1)
    slen_h = np.asarray(slen).reshape(n, -1)
    n_pot = np.asarray(n_pot).reshape(-1)
    counts = np.asarray(res["count"]).reshape(n, -1)
    metas_seqlen = np.asarray(seqlen_dev).reshape(n, -1)
    meta_h = np.asarray(res["meta"])
    mc = meta_h.shape[-1]
    metas = meta_h.reshape(n, -1, mc)

    # pass 1: per-shard presimp -> global removed union
    removed_parts = []
    keeps = []
    for s in range(n):
        m = int(n_pot[s])
        rem, keep = presimp_pass(so[s, :m], sj[s, :m], sab[s, :m],
                                 counts[s], int(bases[s]), params.presimp)
        removed_parts.append(rem)
        keeps.append(keep)
    removed_union = (np.unique(np.concatenate(removed_parts))
                     if removed_parts else np.zeros(0, np.uint64))

    # pass 2: per-shard S + L emission, concatenated in shard (= id) order
    nb_edges = 0
    path = out_path or f"{prefix}.gfa"
    with open(path, "w", buffering=1 << 20) as f:
        f.write("H\tVN:Z:1.0\n")
        for s in range(n):
            m_nodes = int(n_pass[s])
            base = int(bases[s])
            ab = counts[s]
            sl = metas_seqlen[s]
            f.write("".join(
                f"S\t{base + i}\t*\tLN:i:{int(sl[i])}\tKC:i:{int(ab[i])}\n"
                for i in range(m_nodes)))
        for s in range(n):
            m = int(n_pot[s])
            nb_edges += emit_l_lines(
                f, so[s, :m], sj[s, :m], sc[s, :m], slen_h[s, :m],
                keeps[s], removed_union,
                metas_seqlen[s],
                (metas[s, :, 1] & 0x7FFFFFFF).astype(np.uint16),
                (metas[s, :, 2] & 0x7FFFFFFF).astype(np.uint16),
                int(bases[s]))
    n_removed = sum(int((~k).sum()) for k in keeps)
    return dict(nb_nodes=total, nb_edges=nb_edges,
                presimp_removed=n_removed, distributed_edges=True)
