"""Chunked hierarchical counting: device reduction per chunk, native C++
global merge — bounded HBM and host RSS at arbitrary input scale.

The whole-run device counter (ops/sort_count.DeviceNodeCounter.finalize)
keeps every window key in HBM and every raw read byte in host RAM; both fail
at the reference's headline scale (114 Gbp of HG002 input, README.md:128).
This driver streams the input in fixed-size chunks:

  per chunk (all on device):   fused extract -> per-chunk sort/segment-reduce
                               -> compact (unique key, count) + a device-side
                               [unique, minab] matrix of each key's first
                               minab in-chunk occurrences
  host merge (C++):            nt_merge_chunk accumulates global abundances,
                               assigns deterministic node ids, and reports
                               which keys' min-abundance crossing
                               (main.rs:680-707) landed in this chunk and on
                               WHICH in-chunk appearance (sel = minab - prior)
  device gather:               vec + metadata for exactly the crossing
                               occurrences (one row per NODE over the whole
                               run crosses the link — never per window)
  host write:                  the chunk's .sequences shard, while the
                               chunk's raw bytes are still resident; they are
                               dropped before the next chunk loads

Exactness: the crossing occurrence of a key is its (minab - prior_count)-th
appearance within the crossing chunk, which never exceeds minab — so carrying
minab occurrence slots per unique key makes the capture exact for ANY
--minabund (<= MAX_CHUNK_SLOTS; the host streaming engine covers the rest).
--bf Bloom semantics are preserved by the merge (first global sighting only
marks the filter, main.rs:639-655), which keeps error singletons out of host
memory.

Memory model: HBM = one chunk's buffers (~7 KB/read at HiFi lengths); host =
node table + one chunk of raw reads + per-node vectors.
"""

from __future__ import annotations

import numpy as np

from ..io import fastx
from ..io.sequences import remove_stale, write_records_native
from ..params import Params, staging_width
from ..utils.timing import PhaseTimer
from .graph import build_gfa
from .nodetable import NodeTable


#: occurrence-slot ceiling: each slot costs 4 B x window_cap of transient
#: HBM during the per-chunk finalize (~30 MB/slot at default chunk sizing),
#: so slots = minab is sized exactly and capped here.  No published reference
#: run uses --minabund beyond single digits (README.md:133-135 uses --bf
#: with minabund 2; robust-minimizer runs 3-5).
MAX_CHUNK_SLOTS = 16


def chunked_eligible(params: Params) -> bool:
    """The chunk emission carries min_abundance occurrence slots, making
    crossing capture exact for ANY min_abundance <= MAX_CHUNK_SLOTS (the
    selector sel = minab - prior_count never exceeds minab).  Beyond the
    slot ceiling the pipeline uses the host streaming engine instead."""
    return params.min_kmer_abundance <= MAX_CHUNK_SLOTS or params.reference


def _host_join_gfa(prefix, params, nodes, gk: np.ndarray, gf: np.ndarray):
    """Host km_index join from id-ordered fingerprints (the non-catalog path
    and the G_SLOTS-overflow fallback)."""
    from .graph import build_gfa_precomputed

    Fs, Fp, FsR, FpR = gk[:, 0:2], gk[:, 2:4], gk[:, 4:6], gk[:, 6:8]
    key_suf = np.where((gf & 1).astype(bool)[:, None], Fs, FsR)
    key_pre = np.where((gf & 2).astype(bool)[:, None], Fp, FpR)
    return build_gfa_precomputed(
        f"{prefix}.gfa", nodes, (Fs, Fp, FsR, FpR, key_suf, key_pre),
        presimp=params.presimp)


def assemble_device_chunked(reads_path: str, params: Params, prefix: str,
                            timer: PhaseTimer | None = None,
                            stats: dict | None = None,
                            chunk_reads: int = 0) -> dict:
    """Bounded-memory device construction for inputs past HBM capacity."""
    import jax

    from ..ops.extract import DeviceExtractor
    from ..ops.sort_count import DeviceNodeCounter, make_fused_construct

    timer = timer or PhaseTimer()
    stats = stats if stats is not None else {}
    if not chunked_eligible(params):
        raise RuntimeError(
            "chunked counting carries at most "
            f"{MAX_CHUNK_SLOTS} occurrence slots; use --engine host for "
            f"--minabund > {MAX_CHUNK_SLOTS}")

    mean_len, mx = fastx.read_first_n_reads(reads_path, 100)
    L = params.max_read_len or staging_width(mx)
    B = params.batch_reads
    dev = DeviceExtractor(params)
    M = dev.capacity(L)

    from ..ops.sort_count import window_slot_capacity

    if chunk_reads <= 0:
        # target ~0.15 GB of HBM window/minimizer buffers per chunk; host
        # staging RSS scales with chunk size (parsed codes + raw blob + the
        # in-flight prefetch chunk), so smaller chunks keep the whole run's
        # peak under the reference's <=10 GB bar (measured 8-9 GB at
        # 10.4 Gbp; SCALE_DEMO.json)
        per_read = 20 * window_slot_capacity(params, B, L, M) + 12 * M
        chunk_reads = max(B, int(1.5e8 / per_read) // B * B)
        # never size the chunk past the input itself (+10% headroom,
        # power-of-2 rounded for compile-shape reuse): a small input would
        # otherwise stage -- and ship over the H2D link -- a full
        # HBM-budget chunk of padding
        import os as _os

        fsize = _os.path.getsize(reads_path)
        if str(reads_path).endswith((".gz", ".lz4")):
            fsize *= 6
        est = max(B, int(1.1 * fsize / max(1, mean_len)))
        cap2 = B
        while cap2 < est:
            cap2 *= 2
        chunk_reads = min(chunk_reads, cap2)
    else:
        # small forced chunks (tests): shrink the batch to fit the chunk
        B = min(B, chunk_reads)
        chunk_reads = (chunk_reads // B) * B
    n_batches = chunk_reads // B

    W_slot = window_slot_capacity(params, B, L, M)
    counter = DeviceNodeCounter(
        k=params.k, M=M, read_cap=chunk_reads, node_cap=1 << 22,
        minab=params.min_kmer_abundance, w_slot=W_slot,
        chunk_slots=(1 if params.reference
                     else min(params.min_kmer_abundance, MAX_CHUNK_SLOTS)),
        mpos_u16=L <= 65535,
        with_ext=not (params.reads_already_hpc or params.seq_ref_cuts),
    )
    packed = L % 8 == 0  # 2-bit+mask H2D feed (ops/pack); L is 512-aligned
    # L carries 2x headroom over the sampled max read length (reads longer
    # than the sample would otherwise be fatal), but chunks whose longest
    # read fits L/2 feed at half width through a second compiled construct —
    # on length-uniform HiFi data that halves the H2D wire bytes (the
    # dominant cost through this environment's relay, and its RSS retention)
    L_half = L // 2 if (L // 2) % 512 == 0 and L // 2 >= 1024 else 0
    # bf=False: --bf semantics live in the host merge here (nt_merge_chunk
    # tracks the Bloom across chunks); the construct must not screen twice
    _constructs = {L: make_fused_construct(params, B, L, M, n_batches,
                                           packed=packed, w_slot=W_slot,
                                           bf=False)}
    if L_half:
        _constructs[L_half] = make_fused_construct(
            params, B, L_half, M, n_batches, packed=packed, w_slot=W_slot,
            bf=False)

    # surface XLA compile cost as its own phase (the persistent compilation
    # cache set by the CLI makes later runs hit disk instead): drive the
    # full-width construct once with device-resident zeros and an empty
    # batch range (fori_loop(0, 0) — full graph compiles, no batch
    # executes), plus one finalize of the sentinel buffers.  The half-width
    # variant compiles lazily on its first real chunk — many runs never
    # take it.
    with timer.phase("compile"):
        import jax.numpy as jnp

        fn = _constructs[L]
        if packed:
            z = (jnp.zeros((chunk_reads, L // 4), jnp.uint8),
                 jnp.zeros((chunk_reads, L // 8), jnp.uint8))
        else:
            z = jnp.zeros((chunk_reads, L), jnp.uint8)
        bufs, _, _ = fn(z, jnp.zeros((chunk_reads,), jnp.int32),
                        counter.buffers, 0, 0, 0)
        counter.buffers = bufs
        counter.finalize_chunk()
        counter.reset_chunk()
    table = NodeTable(
        min_abundance=params.min_kmer_abundance,
        use_bf=params.use_bf,
        bloom_log2_bits=params.bloom_log2_bits,
        keep_all=params.reference,
        capacity_hint=1 << 22,
    )

    remove_stale(prefix)
    W = M - params.k + 1
    nb_reads = 0
    nb_windows = 0
    h2d_bytes = 0   # fed over the host->device link (relay-leak accounting)
    chunk_i = 0
    # recompute mode (density + already-HPC, core/device_out gate): fetch
    # 65 B/node GFA fingerprints instead of 8k B/node vectors, and let the
    # native writer re-derive minimizer text from sequence bytes — slims both
    # the device->host link and the host-RSS vector accumulation
    from .device_out import minimizer_recompute_ok

    rec_ok = minimizer_recompute_ok(params)
    vec_ids: list[np.ndarray] = []
    vec_arrs: list[np.ndarray] = []   # [n, k] u64 vectors (vector mode)
    gk_arrs: list[np.ndarray] = []    # [n, 8] u64 fingerprints (recompute)
    gf_arrs: list[np.ndarray] = []    # [n] u8 orientation flags

    # device edge join (main.rs:1014-1106 semantics via ops/edge_join): the
    # crossing keys accumulate in a bounded DEVICE catalog instead of being
    # fetched per chunk (65 B/node saved off the D2H link); at GFA time the
    # id-order permutation goes up (4 B/node) and only the ~12 B/candidate
    # POT list comes down.  On catalog overflow or a G_SLOTS join overflow
    # the driver spills to the host join — exactness never depends on it.
    import os as _os2

    catalog = None
    if rec_ok and _os2.environ.get("MDBG_CHUNK_DEVICE_JOIN", "1") != "0":
        from ..ops.edge_join import DeviceKeyCatalog

        cat_cap = int(_os2.environ.get("MDBG_CHUNK_CAT_CAP", 1 << 22))
        catalog = DeviceKeyCatalog(cat_cap)

    def _spill_catalog():
        """Move the device catalog to the host arrays (append order kept)."""
        nonlocal catalog
        gk_sp, gf_sp = catalog.spill()
        if len(gk_sp):
            gk_arrs.append(gk_sp)
            gf_arrs.append(gf_sp)
        catalog = None

    def flush_chunk(staged, lens_d, blob, blob_off, fill, Lc):
        """One chunk through: device reduce -> native merge -> crossing
        gather -> .sequences shard.  staged/lens_d are device arrays (the
        H2D transfer happened in the staging thread, overlapped with the
        previous chunk's device work)."""
        nonlocal chunk_i, nb_windows
        with timer.phase("construct"):
            # partial chunks (the tail, or a small whole input) only loop
            # over the batches that hold reads
            nbat = min(n_batches, (fill + B - 1) // B)
            bufs, _n, n_over = _constructs[Lc](staged, lens_d,
                                               counter.buffers, 0, 0, nbat)
            counter.buffers = bufs
            res = counter.finalize_chunk()
            n_over = int(np.asarray(n_over))
            # eagerly drop the staged feed (client+device sides): chunk
            # arrays are the largest per-chunk allocations, and RSS must
            # stay bounded by ONE chunk regardless of client-side buffering
            for a in (staged if isinstance(staged, tuple) else (staged,)):
                a.delete()
            lens_d.delete()
        if n_over:
            raise RuntimeError(
                f"{n_over} reads overflowed minimizer capacity; "
                "use --engine host")
        with timer.phase("merge"):
            sel, _ = table.merge_chunk(
                res["key_lo"], res["key_hi"], res["count"])
            nb_windows += int(res["count"].sum())
        cross = np.nonzero(sel)[0]
        if cross.size:
            occs = counter.occ_at_chunk(cross, sel[cross])
            # node ids are assigned in crossing-OCCURRENCE order (the
            # whole-run engines' order, so GFA/.sequences come out
            # byte-identical): sort this chunk's crossings by the selected
            # occurrence before metadata/id assignment
            order = np.argsort(occs, kind="stable")
            cross = cross[order]
            occs = occs[order]
            with timer.phase("gather"):
                gk = gflag = None
                if rec_ok and catalog is not None:
                    vec = None
                    gk_d, gf_d, meta, mpos = \
                        counter.gather_crossing_keys_dev(occs)
                    if catalog.fits(gk_d.shape[0]):
                        catalog.append(gk_d, gf_d, len(occs))
                    else:  # bounded catalog full: spill, go host from here
                        _spill_catalog()
                        gk = np.asarray(gk_d)[:len(occs)]
                        gflag = np.asarray(gf_d)[:len(occs)]
                        gk_d.delete()
                        gf_d.delete()
                elif rec_ok:
                    vec = None
                    gk, gflag, meta, mpos = counter.gather_crossing_keys(occs)
                else:
                    vec, meta = counter.gather_crossing(occs)
                    mpos = None
            seqlen = meta[:, 0].astype(np.uint32)
            shift0 = (meta[:, 1] & 0x7FFFFFFF).astype(np.uint16)
            shift1 = (meta[:, 2] & 0x7FFFFFFF).astype(np.uint16)
            rev = (meta[:, 2] >> 31).astype(np.uint8)
            seq_shift0, seq_shift1 = shift0, shift1
            ext_delta = 0
            if meta.shape[1] > 5:
                # exact-cut corrections (extpack col, ops/sort_count gather)
                from ..ops.extract import _unpack_ext

                ext_delta, de1 = _unpack_ext(meta[:, 5])
                r = rev.astype(bool)
                seq_shift0 = np.where(r, shift0 + de1, shift0) \
                    .astype(np.uint16)
                seq_shift1 = np.where(r, shift1, shift1 + de1) \
                    .astype(np.uint16)
            with timer.phase("meta"):
                index_c = table.set_meta_batch(res["key_lo"][cross],
                                               res["key_hi"][cross],
                                               seqlen, shift0, shift1)
                vec_ids.append(index_c)
                if rec_ok:
                    if gk is not None:  # host-mode (no catalog, or spilled)
                        gk_arrs.append(gk)
                        gf_arrs.append(gflag)
                else:
                    vec_arrs.append(vec)
            if not params.no_basespace:
                with timer.phase("sequences"):
                    start = meta[:, 3].astype(np.int64)
                    rows = meta[:, 4].astype(np.int64)
                    abs_start = blob_off[rows] + start
                    abs_end = abs_start + seqlen + (params.l - 2) + ext_delta
                    write_records_native(
                        f"{prefix}.{chunk_i}.sequences", params.k, params.l,
                        index_c, vec, blob, abs_start, abs_end, rev,
                        seq_shift0, seq_shift1,
                        hash_bound=params.hash_bound if rec_ok else 0,
                        mpos=mpos)
        with timer.phase("reset"):
            counter.reset_chunk()
        chunk_i += 1

    from .fastx_feed import stream_chunks

    it = iter(stream_chunks(reads_path, chunk_reads, B, L, mean_len))

    def fetch_and_stage():
        """Pull the next parsed chunk and push it over the H2D link."""
        while True:
            tup = next(it, None)
            if tup is None:
                return None
            codes, lens, blob, blob_off, fill = tup
            if fill == 0:
                continue
            if codes.shape[1] != L:
                raise RuntimeError("read longer than staging width")
            Lc = L
            if L_half and fill and int(lens[:fill].max()) <= L_half:
                # half-width feed: copy the live column prefix (contiguous
                # for the packer); the copy is host-memory-bandwidth cheap
                # next to the relay bytes it saves
                codes = np.ascontiguousarray(codes[:, :L_half])
                Lc = L_half
            nonlocal h2d_bytes
            if packed:
                from ..ops.pack import pack_codes_np

                pk_h, mk_h = pack_codes_np(codes)
                del codes, tup  # drop the 1 B/base plane before the H2D
                h2d_bytes += pk_h.nbytes + mk_h.nbytes + lens.nbytes
                staged = (jax.device_put(pk_h), jax.device_put(mk_h))
            else:
                h2d_bytes += codes.nbytes + lens.nbytes
                staged = jax.device_put(codes)
            lens_d = jax.device_put(lens)
            return staged, lens_d, blob, blob_off, fill, Lc

    # Double-buffered feed (default on): a staging thread packs and ships
    # chunk N+1 over the H2D link while the main thread runs chunk N's
    # device construct + host merge/emit — feed-wait drops to residual
    # backpressure.  Cost: up to one extra staged chunk resident on host
    # and device (queue depth 1).  MDBG_CHUNK_FEED_OVERLAP=0 restores the
    # serial feed (useful when a single-stream dev relay makes bulk H2D
    # stall the per-chunk D2H fetches).
    overlap = _os2.environ.get("MDBG_CHUNK_FEED_OVERLAP", "1") != "0"
    stop_feed = None
    if overlap:
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=1)
        stop_feed = threading.Event()

        def _stager():
            while not stop_feed.is_set():
                try:
                    item = fetch_and_stage()
                except BaseException as e:  # surfaced on the main thread
                    item = e
                # bounded put that notices consumer abort (a raised
                # flush_chunk would otherwise leave this thread parked on a
                # full queue holding a staged chunk's device+host memory)
                while not stop_feed.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if item is None or isinstance(item, BaseException):
                    return

        threading.Thread(target=_stager, daemon=True).start()
        get_item = q.get
    else:
        get_item = fetch_and_stage

    try:
        with timer.phase("stream"):
            while True:
                with timer.phase("feed-wait"):
                    item = get_item()
                if isinstance(item, BaseException):
                    raise item
                if item is None:
                    break
                nb_reads += item[4]
                flush_chunk(*item)  # (staged, lens_d, blob, blob_off, fill, Lc)
    finally:
        if stop_feed is not None:
            stop_feed.set()

    stats["nb_reads"] = nb_reads
    stats["nb_windows"] = nb_windows
    stats["nb_nodes_prefilter"] = len(table)
    stats["nb_chunks"] = chunk_i
    stats["h2d_bytes"] = h2d_bytes

    with timer.phase("gfa"):
        if params.min_kmer_abundance > 1:
            table.retain(params.min_kmer_abundance)
        nodes = table.dump(params.min_kmer_abundance)
        order = (np.argsort(np.concatenate(vec_ids), kind="stable")
                 if vec_ids else np.zeros(0, dtype=np.int64))
        if rec_ok and catalog is not None and catalog.n > 0:
            # device join: permute the catalog into id order on device, ship
            # the POT list only (gfawriter applies presimp + symmetric drop)
            assert catalog.n == len(nodes["index"]), \
                "crossing set diverged from passing set"
            pot, gk_p, gf_p = catalog.join(order.astype(np.int32))
            stats["h2d_bytes"] = h2d_bytes = h2d_bytes + 4 * len(order)
            arrays = pot.resolve()
            if arrays is not None:
                from .graph import IncrementalGFA

                gfa = IncrementalGFA(cap_hint=len(nodes["index"]))
                gfa.add_chunk(nodes["index"], nodes["abundance"],
                              nodes["seqlen"], nodes["shift0"],
                              nodes["shift1"], None)
                g = gfa.finish_pot(f"{prefix}.gfa", params.presimp, *arrays)
            else:  # some key group exceeded G_SLOTS: host join fallback
                gk = np.asarray(gk_p)[: catalog.n]
                gf = np.asarray(gf_p)[: catalog.n]
                g = _host_join_gfa(prefix, params, nodes, gk, gf)
        elif rec_ok:
            gk = (np.concatenate(gk_arrs) if gk_arrs
                  else np.zeros((0, 8), dtype=np.uint64))[order]
            gf = (np.concatenate(gf_arrs) if gf_arrs
                  else np.zeros(0, dtype=np.uint8))[order]
            assert len(gk) == len(nodes["index"]), \
                "crossing set diverged from passing set"
            g = _host_join_gfa(prefix, params, nodes, gk, gf)
        else:
            varr = (np.concatenate(vec_arrs) if vec_arrs
                    else np.zeros((0, params.k), dtype=np.uint64))[order]
            assert len(varr) == len(nodes["index"]), \
                "crossing set diverged from passing set"
            g = build_gfa(f"{prefix}.gfa", nodes, varr,
                          presimp=params.presimp)
    stats.update(g)
    stats["phases"] = timer.report()
    # per-chunk distribution (mean/max) — stragglers matter at 30+ chunks
    stats["phase_stats"] = timer.report_stats()
    return stats
