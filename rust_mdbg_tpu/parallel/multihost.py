"""Multi-host mdBG construction: jax.distributed + per-host sharded reading.

The reference is single-node shared-memory (SURVEY §2); its scale ceiling is
one machine's cores and RAM.  This driver runs the SAME sharded pipeline as
parallel/pipeline.py over a global mesh spanning every process connected
through `jax.distributed` — all_to_all window routing rides ICI within a
slice and DCN (or TCP/Gloo on CPU hosts) across hosts; no NCCL/MPI analog is
needed beyond XLA's collectives.

Per-host input sharding (the analog of the reference's per-thread seq_io
partitioning, main.rs:834-838):
  - a comma-separated file list is assigned round-robin across hosts;
  - a single plain FASTA is byte-range split, with each host scanning
    forward to the next record boundary (">" after newline);
  - each host parses only its share and keeps only its reads' raw bytes.

Every host drives the same number of collective steps: a host that exhausts
its share feeds empty batches, and a psum'd "alive" counter ends the loop
when every host has drained.  Node ids are globally deterministic (per-shard
exclusive scan, P3), so the per-host `.sequences` shard files
(`prefix.h<pid>.<shard>.sequences`) and the rank-0 GFA compose into exactly
the single-host output contract.

Launch recipe (one command per host):

  MDBG_COORD=host0:29500 MDBG_NPROCS=4 MDBG_PROC_ID=<0..3> \
      python -m rust_mdbg_tpu reads.fa -k 21 -l 14 -d 0.003 \
          --multihost --prefix out

On Cloud TPU pods, omit the env vars — jax.distributed auto-detects.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.alloc import full_fast

from ..params import Params, staging_width


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed from args or MDBG_* env; returns
    (process_id, num_processes).  No-op (0, 1) when nothing is configured."""
    import jax

    coordinator = coordinator or os.environ.get("MDBG_COORD")
    if num_processes is None and os.environ.get("MDBG_NPROCS"):
        num_processes = int(os.environ["MDBG_NPROCS"])
    if process_id is None and os.environ.get("MDBG_PROC_ID"):
        process_id = int(os.environ["MDBG_PROC_ID"])
    if coordinator is None and num_processes is None:
        try:  # TPU pod / Slurm / OpenMPI auto-detection
            jax.distributed.initialize()
        except Exception:
            return 0, 1
        return jax.process_index(), jax.process_count()
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def fasta_range_records(path: str, start: int, end: int):
    """Yield (id, seq_bytes) for records whose '>' byte lies in [start, end).

    Plain (uncompressed) FASTA only: a host seeks to `start`, scans to the
    next record boundary, and parses past `end` until its last record
    completes — the standard byte-split that keeps every record exactly once
    across hosts."""
    with open(path, "rb") as f:
        f.seek(0, 2)
        fsize = f.tell()
        if start >= fsize:
            return
        buf = b""
        if start > 0:
            # discard the (possibly partial) record the range starts inside;
            # scan from start-1 so a record whose '>' sits exactly AT the
            # boundary (newline at start-1) is found and kept by THIS host
            # (the previous host excludes it via its line_start >= end check)
            start -= 1
            f.seek(start)
            chunk = f.read(1 << 20)
            while chunk:
                i = chunk.find(b"\n>")
                if i >= 0:
                    buf = chunk[i + 1:]
                    start += i + 1
                    break
                start += len(chunk)
                chunk = f.read(1 << 20)
            if not chunk:
                return
        else:
            f.seek(start)
        pos = start  # byte offset of buf[0]
        name = None
        seq_parts: list[bytes] = []
        done = False
        while not done:
            if not buf:
                buf = f.read(1 << 20)
                if not buf:
                    break
            nl = buf.find(b"\n")
            if nl < 0:
                more = f.read(1 << 20)
                if not more:
                    nl = len(buf)
                    buf += b"\n"
                else:
                    buf += more
                    continue
            line, buf = buf[:nl], buf[nl + 1:]
            line_start = pos
            pos += nl + 1
            line = line.rstrip(b"\r")
            if line.startswith(b">"):
                if name is not None:
                    yield name, b"".join(seq_parts)
                if line_start >= end:
                    return  # next record belongs to the following host
                name = line[1:].split()[0].decode()
                seq_parts = []
            elif line:
                seq_parts.append(line)
        if name is not None:
            yield name, b"".join(seq_parts)


def count_range_records(path: str, start: int, end: int) -> int:
    """Number of FASTA records whose '>' byte lies in [start, end) — same
    ownership rule as fasta_range_records, by raw byte scan (no parsing).
    Lets every host know its round count UP FRONT, so the streaming loop
    needs no per-round liveness collective."""
    n = 0
    with open(path, "rb") as f:
        f.seek(0, 2)
        fsize = f.tell()
        if start >= fsize:
            return 0
        lo = max(0, start - 1)
        f.seek(lo)
        prev = b""   # '>' at byte 0 is handled by the explicit check below
        pos = lo
        while pos < end:
            chunk = f.read(min(1 << 20, end - pos))
            if not chunk:
                break
            data = prev + chunk
            # '>' at a line start, with the '>' byte itself in [start, end)
            n += data.count(b"\n>")
            prev = chunk[-1:]
            pos += len(chunk)
        if start == 0:
            f.seek(0)
            if f.read(1) == b">":
                n += 1
    return n


def _host_inputs(reads_path: str, pid: int, nproc: int):
    """Resolve this host's input share: (list of (path, start, end))."""
    if "," in str(reads_path):
        files = [p for p in str(reads_path).split(",") if p]
        bad = [f for f in files if f.endswith((".gz", ".lz4"))]
        if bad:
            raise ValueError(
                f"multihost file-list sharding needs plain FASTA: {bad[0]}")
        return [(f, 0, os.path.getsize(f)) for i, f in enumerate(files)
                if i % nproc == pid]
    p = str(reads_path)
    if p.endswith((".gz", ".lz4")):
        raise ValueError(
            "multihost byte-range splitting needs plain FASTA; pass a "
            "comma-separated list of files to shard compressed inputs")
    fsize = os.path.getsize(p)
    step = (fsize + nproc - 1) // nproc
    return [(p, pid * step, min(fsize, (pid + 1) * step))]


def _host_batches(inputs, B_host: int, L: int):
    """Yield (codes[B_host, L], lengths, raw_list) from this host's share."""
    from ..utils.seq import BASE_CODE

    codes = full_fast((B_host, L), 5, np.uint8)
    lengths = np.zeros(B_host, dtype=np.int32)
    raw: list[bytes] = []
    fill = 0
    for path, start, end in inputs:
        for _name, seq in fasta_range_records(path, start, end):
            if len(seq) > L:
                raise ValueError(
                    f"read of {len(seq)}bp exceeds staging width {L}; "
                    "set --max-read-len")
            c = BASE_CODE[np.frombuffer(seq, dtype=np.uint8)]
            codes[fill, : len(c)] = c
            lengths[fill] = len(c)
            raw.append(seq)
            fill += 1
            if fill == B_host:
                yield codes, lengths, raw
                codes = full_fast((B_host, L), 5, np.uint8)
                lengths = np.zeros(B_host, dtype=np.int32)
                raw = []
                fill = 0
    if fill:
        yield codes, lengths, raw


def assemble_multihost(reads_path: str, params: Params, prefix: str) -> dict:
    """Full multi-host assembly; every participating process calls this."""
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..core.graph import build_gfa
    from ..io.sequences import remove_stale, write_records_native
    from ..ops.extract import DeviceExtractor
    from .mesh import AXIS
    from .pipeline import make_sharded_pipeline

    pid, nproc = jax.process_index(), jax.process_count()
    # contiguous per-process device blocks so a host's batch rows are a
    # contiguous global slice (raw-byte ownership below depends on it)
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    mesh = Mesh(np.array(devs), (AXIS,))
    n = len(devs)
    d_local = jax.local_device_count()
    assert n == nproc * d_local, "uneven device counts per process"

    inputs = _host_inputs(reads_path, pid, nproc)
    # capacity parameters must be identical on every host: derive them from
    # the full input spec, not from this host's share
    if "," in str(reads_path):
        files = [p for p in str(reads_path).split(",") if p]
        fsize = sum(os.path.getsize(f) for f in files)
        probe = files[0]
    else:
        fsize = os.path.getsize(str(reads_path))
        probe = str(reads_path)
    from ..io import fastx

    mean_len, mx = fastx.read_first_n_reads(probe, 100)
    L = params.max_read_len or staging_width(mx)
    B = ((params.batch_reads + n - 1) // n) * n
    B_host = B // nproc
    dev = DeviceExtractor(params)
    M = dev.capacity(L)
    W = M - params.k + 1
    est_reads = max(n * 64, int(3.0 * fsize / max(1, mean_len)))
    n_rounds_est = (est_reads + B - 1) // B + 2
    route_cap = max(64, (3 * (B // n) * W) // n)
    window_cap = n_rounds_est * n * route_cap
    step, fin, make_buffers, shardings, recv = make_sharded_pipeline(
        mesh, params, B, L, M, window_cap,
        node_cap=1 << 20, route_cap=route_cap,
    )
    buffers = make_buffers()

    if pid == 0:
        remove_stale(prefix)
    multihost_utils.sync_global_devices("mdbg:stale-cleanup")

    raw_reads: list[bytes] = []   # this host's reads, in local row order
    batches = _host_batches(inputs, B_host, L)
    offset = 0
    read_base = 0
    zeros_c = full_fast((B_host, L), 5, np.uint8)
    zeros_l = np.zeros(B_host, dtype=np.int32)
    drops = []
    # ONE upfront collective replaces the round-2 per-round alive-flag
    # allgather (N tiny Gloo collectives under load were the flaky part):
    # every host counts its share's records by raw byte scan, and all hosts
    # run exactly max(ceil(count / B_host)) rounds, feeding zero batches
    # past their own end.
    my_reads = sum(count_range_records(p, s, e) for p, s, e in inputs)
    all_counts = np.asarray(multihost_utils.process_allgather(
        np.asarray([my_reads], dtype=np.int64), tiled=True)).reshape(-1)
    rounds = int(max(1, -(-int(all_counts.max()) // B_host)))
    for _ in range(rounds):
        nxt = next(batches, None)
        if nxt is None:
            codes_h, lens_h = zeros_c, zeros_l
        else:
            codes_h, lens_h, raw = nxt
            raw_reads.extend(raw)
            raw_reads.extend([b""] * (B_host - len(raw)))
        codes = jax.make_array_from_process_local_data(shardings[0], codes_h)
        lengths = jax.make_array_from_process_local_data(shardings[1], lens_h)
        blo, bhi, bm, bv, dropped, n_over = step(
            codes, lengths, *buffers, np.int32(offset), np.uint32(read_base)
        )
        buffers = (blo, bhi, bm, bv)
        drops.append((dropped, n_over))
        offset += recv
        read_base += B
        if offset + recv > window_cap:
            raise RuntimeError("sharded window capacity exceeded")
    res = fin(*buffers)
    for d, o in drops:
        dv = np.asarray(jax.device_get(
            [s for s in d.addressable_shards][0].data)).reshape(-1)[0]
        ov = np.asarray(jax.device_get(
            [s for s in o.addressable_shards][0].data)).reshape(-1)[0]
        if int(dv) or int(ov):
            raise RuntimeError("route/extraction overflow in multihost run")

    # small per-shard scalars everywhere (8 B x n); the node TABLE is never
    # allgathered — .sequences payloads route to their read-owner host and
    # the edge phase runs as the distributed join (round-4 verdict item #1)
    n_pass = np.asarray(multihost_utils.process_allgather(
        res["n_pass"], tiled=True)).reshape(-1)
    bases = np.asarray(multihost_utils.process_allgather(
        res["id_base"], tiled=True)).reshape(-1)
    total_nodes = int(n_pass.sum())
    cap = res["key_lo"].shape[0] // n
    max_np = int(n_pass.max()) if len(n_pass) else 0
    d_local_ = jax.local_device_count()

    use_dist = os.environ.get("MDBG_SHARDED_EDGES", "1") != "0"
    nb_windows_local = 0

    if use_dist and total_nodes:
        from .edges import make_record_router

        # --- .sequences: one all_to_all routes each node's payload to the
        # host that loaded its crossing read ----------------------------
        if not params.no_basespace:
            mc = res["meta"].shape[-1]
            rcap_r = 64
            while rcap_r < max(64, (4 * max(1, max_np)) // max(1, nproc)):
                rcap_r *= 2
            router = make_record_router(mesh, params.k, cap, mc, rcap_r,
                                        B, B_host, d_local_)
            r_gid, r_meta, r_vec, r_drop = router(
                res["vec"], res["meta"], res["n_pass"], res["id_base"])
            if int(np.asarray(r_drop).reshape(-1)[0]):
                raise RuntimeError("record-router bucket overflow; rerun "
                                   "with MDBG_SHARDED_EDGES=0")
            offsets = np.zeros(len(raw_reads) + 1, dtype=np.int64)
            np.cumsum([len(r) for r in raw_reads], out=offsets[1:])
            blob = np.frombuffer(b"".join(raw_reads), dtype=np.uint8)
            for j, (sg, sm, sv) in enumerate(zip(
                    r_gid.addressable_shards, r_meta.addressable_shards,
                    r_vec.addressable_shards)):
                gid_h = np.asarray(sg.data)
                keep = gid_h != np.uint32(0xFFFFFFFF)
                if not keep.any():
                    continue
                meta_h = np.asarray(sm.data)[keep]
                vec_h = np.asarray(sv.data)[keep]
                gid_h = gid_h[keep]
                rows = meta_h[:, 4].astype(np.int64)
                local_row = (rows // B) * B_host + (rows % B_host)
                abs_start = offsets[local_row] + meta_h[:, 3].astype(np.int64)
                abs_end = abs_start + meta_h[:, 0].astype(np.int64) \
                    + (params.l - 2)
                rev8 = (meta_h[:, 2] >> 31).astype(np.uint8)
                sq0 = (meta_h[:, 1] & 0x7FFFFFFF).astype(np.uint16)
                sq1 = (meta_h[:, 2] & 0x7FFFFFFF).astype(np.uint16)
                if meta_h.shape[1] > 5:
                    from ..ops.extract import _unpack_ext

                    ext_delta, de1 = _unpack_ext(meta_h[:, 5])
                    abs_end = abs_end + ext_delta
                    rb = rev8.astype(bool)
                    sq0 = np.where(rb, sq0 + de1, sq0).astype(np.uint16)
                    sq1 = np.where(rb, sq1, sq1 + de1).astype(np.uint16)
                write_records_native(
                    f"{prefix}.h{pid}x{j}.sequences", params.k, params.l,
                    gid_h, vec_h, blob, abs_start, abs_end, rev8, sq0, sq1)

        # --- GFA: distributed join, per-shard part emission -------------
        nb_windows_local = _multihost_gfa(
            mesh, params, prefix, res, n_pass, bases, cap, pid, nproc,
            d_local_, multihost_utils)
        stats = dict(nb_reads=int(sum(1 for r in raw_reads if r)),
                     n_devices=n, n_hosts=nproc, rounds=rounds,
                     distributed_edges=True)
        stats.update(nb_windows_local)
        multihost_utils.sync_global_devices("mdbg:done")
        return stats

    # fallback: gathered single-host table (MDBG_SHARDED_EDGES=0)
    g = {key: np.asarray(multihost_utils.process_allgather(res[key],
                                                           tiled=True))
         for key in ("key_lo", "count", "meta", "vec")}
    mc = g["meta"].shape[-1]
    metas = g["meta"].reshape(n, cap, mc)
    vecs = g["vec"].reshape(n, cap, params.k)
    counts = g["count"].reshape(n, cap)
    idx_all, cnt_all, meta_all, vec_all = [], [], [], []
    for s in range(n):
        m = int(n_pass[s])
        idx_all.append(np.arange(bases[s], bases[s] + m, dtype=np.uint32))
        cnt_all.append(counts[s, :m])
        meta_all.append(metas[s, :m])
        vec_all.append(vecs[s, :m])
    index = np.concatenate(idx_all) if idx_all else np.zeros(0, np.uint32)
    count = np.concatenate(cnt_all)
    meta = np.concatenate(meta_all)
    vec = np.concatenate(vec_all)

    # .sequences: each host writes the crossing occurrences whose source
    # read it loaded (global row -> host by contiguous block within a round)
    if not params.no_basespace and len(index):
        rows = meta[:, 4].astype(np.int64)
        host_of = (rows % B) // B_host
        mine = np.nonzero(host_of == pid)[0]
        if mine.size:
            local_row = (rows[mine] // B) * B_host + (rows[mine] % B_host)
            offsets = np.zeros(len(raw_reads) + 1, dtype=np.int64)
            np.cumsum([len(r) for r in raw_reads], out=offsets[1:])
            blob = np.frombuffer(b"".join(raw_reads), dtype=np.uint8)
            start_a = meta[mine, 3].astype(np.int64)
            abs_start = offsets[local_row] + start_a
            abs_end = abs_start + meta[mine, 0].astype(np.int64) \
                + (params.l - 2)
            rev8 = (meta[mine, 2] >> 31).astype(np.uint8)
            sq0 = (meta[mine, 1] & 0x7FFFFFFF).astype(np.uint16)
            sq1 = (meta[mine, 2] & 0x7FFFFFFF).astype(np.uint16)
            if mc > 5:
                # exact-cut corrections (extpack col, ops/extract)
                from ..ops.extract import _unpack_ext

                ext_delta, de1 = _unpack_ext(meta[mine, 5])
                abs_end = abs_end + ext_delta
                r = rev8.astype(bool)
                sq0 = np.where(r, sq0 + de1, sq0).astype(np.uint16)
                sq1 = np.where(r, sq1, sq1 + de1).astype(np.uint16)
            write_records_native(
                f"{prefix}.h{pid}.sequences", params.k, params.l,
                index[mine], vec[mine], blob, abs_start, abs_end,
                rev8, sq0, sq1)

    stats = dict(nb_reads=int(sum(1 for r in raw_reads if r)),
                 nb_windows=int(count.sum()), n_devices=n, n_hosts=nproc,
                 rounds=rounds)
    if pid == 0:
        nodes = dict(
            index=index, abundance=count,
            seqlen=meta[:, 0].astype(np.uint32),
            shift0=(meta[:, 1] & 0x7FFFFFFF).astype(np.uint16),
            shift1=(meta[:, 2] & 0x7FFFFFFF).astype(np.uint16),
        )
        stats.update(build_gfa(f"{prefix}.gfa", nodes, vec,
                               presimp=params.presimp))
    multihost_utils.sync_global_devices("mdbg:done")
    return stats


def _multihost_gfa(mesh, params, prefix, res, n_pass, bases, cap, pid,
                   nproc, d_local, multihost_utils) -> dict:
    """Distributed edge phase across processes: every process runs the
    collective join, then finishes ONLY its addressable shards — presimp
    locally, removed pairs exchanged (tiny), S/L part files per shard, and
    process 0 concatenates parts in shard (= global id) order.

    Part files compose on a shared filesystem (or single box); without one
    they remain as `prefix.gfapart.*` per host — the same composition
    contract as the per-host .sequences shards."""
    import jax

    from .edges import (emit_l_lines, make_sharded_edge_join, presimp_pass)

    n = mesh.devices.size
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
    # overflow is psum-replicated (out_specs P()): every process holds the
    # full value — read the local shard, no collective (process_allgather
    # with tiled=False rejects non-fully-addressable arrays)
    overflow = np.asarray(overflow.addressable_data(0))
    if overflow.any():
        raise RuntimeError(
            f"multihost edge join overflow {overflow.tolist()}; rerun with "
            "MDBG_SHARDED_EDGES=0")

    # local shards of this process, in global shard order
    def local(arr):
        return sorted(
            ((sh.index[0].start or 0, np.asarray(sh.data))
             for sh in arr.addressable_shards), key=lambda t: t[0])

    pot_local = {name: local(a) for name, a in zip(
        ("so", "sr", "sj", "sc", "sab", "slen"),
        (so, sr, sj, sc, sab, slen))}
    npot_local = local(n_pot)
    cnt_local = local(res["count"])
    sl_local = local(seqlen_dev)
    meta_local = local(res["meta"])
    shard_of = {off // pot_cap: i for i, (off, _) in
                enumerate(pot_local["so"])}
    my_shards = sorted(shard_of)

    # pass 1: presimp per local shard -> global removed union
    removed_parts = []
    keeps = {}
    nb_windows = 0
    for s in my_shards:
        i = shard_of[s]
        m = int(npot_local[i][1][0])
        ords = pot_local["so"][i][1][:m]
        rem, keep = presimp_pass(
            ords, pot_local["sj"][i][1][:m], pot_local["sab"][i][1][:m],
            cnt_local[i][1], int(bases[s]), params.presimp)
        removed_parts.append(rem)
        keeps[s] = keep
        nb_windows += int(cnt_local[i][1][: int(n_pass[s])].sum())
    mine = (np.concatenate(removed_parts) if removed_parts
            else np.zeros(0, np.uint64))
    cnt = np.asarray(multihost_utils.process_allgather(
        np.asarray([len(mine)], dtype=np.int64), tiled=True)).reshape(-1)
    pad = np.zeros(int(cnt.max()) if len(cnt) else 0, dtype=np.uint64)
    pad[: len(mine)] = mine
    allr = np.asarray(multihost_utils.process_allgather(
        pad, tiled=False)).reshape(nproc, -1)
    removed_union = np.unique(np.concatenate(
        [allr[p, : int(cnt[p])] for p in range(nproc)])) \
        if allr.size else np.zeros(0, np.uint64)

    # pass 2: per-shard part files
    nb_edges = 0
    for s in my_shards:
        i = shard_of[s]
        m_nodes = int(n_pass[s])
        base = int(bases[s])
        ab = cnt_local[i][1]
        sl = sl_local[i][1]
        with open(f"{prefix}.gfapart.s{s:04d}", "w") as f:
            f.write("".join(
                f"S\t{base + r}\t*\tLN:i:{int(sl[r])}\tKC:i:{int(ab[r])}\n"
                for r in range(m_nodes)))
        m = int(npot_local[i][1][0])
        meta_h = meta_local[i][1]
        with open(f"{prefix}.gfapart.l{s:04d}", "w") as f:
            nb_edges += emit_l_lines(
                f, pot_local["so"][i][1][:m], pot_local["sj"][i][1][:m],
                pot_local["sc"][i][1][:m], pot_local["slen"][i][1][:m],
                keeps[s], removed_union, sl,
                (meta_h[:, 1] & 0x7FFFFFFF).astype(np.uint16),
                (meta_h[:, 2] & 0x7FFFFFFF).astype(np.uint16), base)
    multihost_utils.sync_global_devices("mdbg:gfaparts")
    tot = np.asarray(multihost_utils.process_allgather(
        np.asarray([nb_windows, nb_edges], dtype=np.int64),
        tiled=True)).reshape(nproc, 2).sum(axis=0)
    stats = dict(nb_windows=int(tot[0]), nb_edges=int(tot[1]),
                 nb_nodes=int(n_pass.sum()))
    if pid == 0:
        import glob as _glob
        import shutil

        s_parts = sorted(_glob.glob(f"{prefix}.gfapart.s*"))
        l_parts = sorted(_glob.glob(f"{prefix}.gfapart.l*"))
        if len(s_parts) == n and len(l_parts) == n:
            with open(f"{prefix}.gfa", "w", buffering=1 << 20) as out_f:
                out_f.write("H\tVN:Z:1.0\n")
                for p in s_parts + l_parts:
                    with open(p) as f:
                        shutil.copyfileobj(f, out_f)
                    os.remove(p)
        else:
            print(f"[multihost] GFA parts left as {prefix}.gfapart.* "
                  "(no shared filesystem); concatenate H + s* + l*")
    return stats
