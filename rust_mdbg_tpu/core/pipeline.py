"""Single-process assembly pipeline: reads -> mdBG GFA + .sequences sidecars.

This is the framework's equivalent of the reference's main() flow
(/root/reference/src/main.rs:425-1160): stream reads in fixed-shape batches,
run an extraction engine (host numpy / device JAX / Pallas) to get k-min-mer
windows, feed them through the native node table, write .sequences records at
the abundance-crossing occurrence, then abundance-filter and emit the GFA with
presimp.  Error correction (minimizer-space POA) plugs in between the first
pass and graph construction, mirroring main.rs:846-914.
"""

from __future__ import annotations

import os
import threading
import time

import numpy as np

from ..io import fastx
from ..io.ec_data import EcWriter
from ..io.sequences import SequencesWriter, remove_stale
from ..params import Params, staging_width
from ..utils.seq import revcomp
from ..utils.timing import PhaseTimer
from .extract import extract_windows_host
from .graph import build_gfa
from .nodetable import NodeTable


def _pick_engine(params: Params, minimizer_to_int=None, uhs_filter=None,
                 lcp_filter=None):
    if params.engine in ("device", "pallas", "auto"):
        try:
            from ..ops.extract import make_device_extractor

            return make_device_extractor(params, minimizer_to_int,
                                         uhs_filter, lcp_filter)
        except Exception:
            if params.engine != "auto":
                raise
    return None


def assemble(reads_path: str, params: Params, prefix: str,
             read_stats_path: str | None = None) -> dict:
    """Run the full single-k assembly. Returns stats dict.

    If read_stats_path is given, mirror the reference's read_stats mode
    (main.rs:938-1004): after the abundance filter, write per-read k-min-mer
    abundances of that file's reads and return WITHOUT writing a GFA.
    """
    timer = PhaseTimer()
    stats: dict = {}

    if _device_table_eligible(params, read_stats_path):
        from .chunked import assemble_device_chunked, chunked_eligible

        try:
            if chunked_eligible(params):
                # the single production device driver: native prefetch
                # parser, host RSS bounded by one chunk of raw bytes at ANY
                # input scale, exact crossing capture (minab occurrence
                # slots), per-chunk phased emission
                return assemble_device_chunked(
                    reads_path, params, prefix, timer, stats,
                    chunk_reads=params.chunk_reads)
            # minabund beyond the chunk slot ceiling: whole-run device
            # finalize (crossing selection fully on device; raw bytes stay
            # resident for the run)
            return assemble_device_table(reads_path, params, prefix, timer,
                                         stats)
        except RuntimeError as e:
            print(f"[device-table] falling back to streaming path: {e}")
            timer = PhaseTimer()
            stats = {}

    # --- parameter-dependent preparation ---------------------------------
    minimizer_to_int = None
    int_to_minimizer = None
    if params.has_lmer_counts or params.error_correct:
        from ..ops.minimizers import minimizers_preparation

        lmer_counts = {}
        if params.has_lmer_counts and getattr(params, "_lmer_counts_path", None):
            lmer_counts = load_lmer_counts(params._lmer_counts_path)
        minimizer_to_int, int_to_minimizer, _ = minimizers_preparation(
            params, lmer_counts
        )

    uhs_filter = lcp_filter = None
    if params.uhs and getattr(params, "_uhs_path", None):
        from ..models.schemes import uhs_preparation

        uhs_filter = uhs_preparation(params, params._uhs_path)
    if params.lcp and getattr(params, "_lcp_path", None):
        from ..models.schemes import lcp_preparation

        lcp_filter = lcp_preparation(params, params._lcp_path)

    remove_stale(prefix)

    table = NodeTable(
        min_abundance=params.min_kmer_abundance,
        use_bf=params.use_bf,
        bloom_log2_bits=params.bloom_log2_bits,
        keep_all=params.reference,
    )

    device_extract = _pick_engine(params, minimizer_to_int,
                                  uhs_filter, lcp_filter)

    write_seqs_first_pass = not params.error_correct
    seq_writer = None
    ec_writer = None
    buckets: dict[tuple, list[str]] = {}
    reads_by_id: dict = {}
    need_ec_file = params.error_correct or params.reference
    if need_ec_file:
        ec_writer = EcWriter(prefix)

    max_len = params.max_read_len
    if max_len <= 0:
        mean_len, mx = fastx.read_first_n_reads(reads_path, 100)
        max_len = max(1024, 2 * mx)
    nb_reads = 0
    nb_windows = 0

    use_compact = device_extract is not None and not need_ec_file

    with timer.phase("extract+count"):
        for batch in fastx.batches(reads_path, params.batch_reads, max_len):
            if use_compact:
                wb = device_extract.extract_compact(batch)
                get_vecs = wb.vecs_for
            elif device_extract is not None:
                wb = device_extract(batch)
                get_vecs = lambda idx: wb.vecs[idx]  # noqa: E731
            else:
                wb = extract_windows_host(batch, params, minimizer_to_int,
                                          uhs_filter, lcp_filter)
                get_vecs = lambda idx: wb.vecs[idx]  # noqa: E731
            nb_reads += batch.n_reads
            nb_windows += wb.n_windows
            if params.debug and wb.minimizers:
                # per-read minimizer-space representation (the reference's
                # debug display, main.rs:802-807 / Opt doc main.rs:239-244)
                for row, m in enumerate(wb.minimizers):
                    if m is not None and batch.ids[row]:
                        print(batch.ids[row],
                              " ".join(str(int(x)) for x in m[1]))
            flags, index = table.add_batch(
                wb.key_lo, wb.key_hi, wb.seqlen, wb.shift0, wb.shift1
            )
            # record .sequences lines for crossing occurrences
            hit = np.nonzero(flags)[0]
            if hit.size:
                vecs = get_vecs(hit)
                for vi, j in enumerate(hit):
                    table.vectors[int(index[j])] = vecs[vi].copy()
                if write_seqs_first_pass and not params.no_basespace:
                    if seq_writer is None:
                        seq_writer = SequencesWriter(prefix, 0, params.k, params.l)
                    for vi, j in enumerate(hit):
                        row = int(wb.read_row[j])
                        raw = batch.raw[row]
                        s = raw[int(wb.start[j]) : int(wb.end[j])].decode()
                        if wb.reversed_[j]:
                            s = revcomp(s)
                        seq_writer.record(
                            int(index[j]), vecs[vi], s, "*",
                            (int(wb.seq_shift0[j]), int(wb.seq_shift1[j])),
                        )

            if need_ec_file:
                for row in range(batch.codes.shape[0]):
                    m = wb.minimizers[row] if row < len(wb.minimizers) else None
                    if m is None:
                        continue
                    pos, hashes = m
                    if len(hashes) < params.n:
                        continue
                    rid = batch.ids[row]
                    seq_str = batch.raw[row].decode()
                    if params.reference:
                        seq_str = seq_str.replace("\n", "").replace("\r", "")
                    ec_writer.record(rid, seq_str, hashes, [], pos)
                    if params.error_correct:
                        reads_by_id[rid] = dict(
                            id=rid, seq=seq_str,
                            transformed=[int(x) for x in hashes],
                            pos=[int(x) for x in pos],
                        )
                        from ..utils.seq import normalize_vec

                        t = [int(x) for x in hashes]
                        for i in range(len(t) - params.n + 1):
                            buckets.setdefault(
                                normalize_vec(t[i : i + params.n]), []
                            ).append(rid)

    if ec_writer is not None:
        ec_writer.flush()
    stats["nb_reads"] = nb_reads
    stats["nb_windows"] = nb_windows

    # --- error correction pass ------------------------------------------
    if params.error_correct:
        from ..models.correct import run_error_correction, reingest_postcor

        with timer.phase("error-correct"):
            run_error_correction(
                prefix, params, int_to_minimizer, buckets, reads_by_id
            )
        with timer.phase("reingest"):
            table.clear()
            seq_writer = reingest_postcor(prefix, params, table, seq_writer)

    if seq_writer is not None:
        seq_writer.close()

    # --- abundance filter -----------------------------------------------
    stats["nb_nodes_prefilter"] = len(table)
    if params.min_kmer_abundance > 1:
        table.retain(params.min_kmer_abundance)

    if read_stats_path is not None:
        with timer.phase("read-stats"):
            run_read_stats(reads_path, read_stats_path, params, table,
                           f"{read_stats_path}.read_stats")
        stats["phases"] = timer.report()
        return stats

    with timer.phase("gfa"):
        nodes = table.dump()
        g = build_gfa(f"{prefix}.gfa", nodes, table.vectors, presimp=params.presimp)
    stats.update(g)
    stats["phases"] = timer.report()
    return stats


def _device_table_eligible(params: Params, read_stats_path) -> bool:
    return (
        params.engine in ("auto", "device", "pallas")
        and not params.error_correct
        and not params.reference
        and not (params.uhs or params.lcp or params.has_lmer_counts)
        and read_stats_path is None
    )


def assemble_device_table(reads_path: str, params: Params, prefix: str,
                          timer: PhaseTimer, stats: dict) -> dict:
    """Fully device-resident construction (the bench path, wired to real
    input): native prefetch-parsed H2D staging, one fused construct dispatch
    per chunk, single sort/segment-reduce finalize, native .sequences + GFA
    writers.

    Raw read bytes are kept in memory for crossing-sequence extraction, so
    this path only serves --minabund beyond core/chunked.MAX_CHUNK_SLOTS
    (the crossing is selected fully on device, exact for any minabund); all
    other device runs use the bounded-memory chunked driver.
    """
    import jax

    from ..ops.extract import DeviceExtractor
    from ..ops.sort_count import DeviceNodeCounter, make_fused_construct

    mean_len, mx = fastx.read_first_n_reads(reads_path, 100)
    L = params.max_read_len or staging_width(mx)
    B = params.batch_reads
    CHUNK_BATCHES = 16
    dev = DeviceExtractor(params)
    M = dev.capacity(L)
    W = M - params.k + 1

    import os as _os

    fsize = _os.path.getsize(reads_path)
    if str(reads_path).endswith((".gz", ".lz4")):
        fsize *= 6  # DNA text compresses ~3.5-4x; headroom on top
    est_reads = max(1024, int(1.5 * fsize / max(1, mean_len)))
    read_cap = ((est_reads + B - 1) // B) * B

    from ..ops.sort_count import window_slot_capacity

    W_slot = window_slot_capacity(params, B, L, M)
    # device --bf (the reference's headline protocol): the Bloom screen
    # drops first sightings before the counter, so the per-batch slot — and
    # with it every finalize sort — can shrink by the expected surviving
    # fraction.  The survivor rate is input-dependent (error rate x
    # coverage), so the shrink is opt-in via MDBG_BF_SLOT_FRAC; slot
    # overflow is detected (n_over) and aborts rather than truncating.
    from ..ops.sort_count import counter_flags

    flags = counter_flags(params)
    bf_on = flags["use_bf"]
    if bf_on:
        frac = float(_os.environ.get("MDBG_BF_SLOT_FRAC", "1.0"))
        W_slot = max(8, (int(W_slot * frac) + 7) & ~7)
    # beyond the whole-run HBM budget, switch to bounded-memory chunked
    # counting (exact for any minabund <= MAX_CHUNK_SLOTS; core/chunked.py)
    per_read = 20 * W_slot + 12 * M
    if read_cap * per_read > 4e9:
        from .chunked import assemble_device_chunked, chunked_eligible

        if chunked_eligible(params):
            return assemble_device_chunked(reads_path, params, prefix, timer,
                                           stats)
        raise RuntimeError(
            "input exceeds whole-run HBM capacity; chunked counting caps "
            "occurrence slots — use --engine host for this --minabund")
    from .device_out import minimizer_recompute_ok

    counter = DeviceNodeCounter(
        k=params.k, M=M, read_cap=read_cap, node_cap=1 << 22,
        minab=params.min_kmer_abundance, w_slot=W_slot,
        emit_overlap_keys=minimizer_recompute_ok(params),
        mpos_u16=L <= 65535, **flags,
    )
    packed = L % 8 == 0  # 2-bit+mask H2D feed (ops/pack)
    construct = make_fused_construct(params, B, L, M, CHUNK_BATCHES,
                                     packed=packed, w_slot=W_slot)

    remove_stale(prefix)
    nb_reads = 0
    read_base = 0
    n_over_acc = []
    CH = CHUNK_BATCHES * B
    # raw bytes stay resident for the whole run (crossing occurrences may
    # reference any read) — this path only serves minabund beyond the chunk
    # slot ceiling; core/chunked.py is the bounded-memory production driver.
    # Parse/encode runs on the native prefetch parser (core/fastx_feed), so
    # it overlaps device compute like the reference's seq_io reader thread
    # (main.rs:834-838) — no per-read Python objects are held.
    blob_parts: list[np.ndarray] = []
    row_off_parts: list[np.ndarray] = []
    bytes_base = 0

    def flush_chunk(codes, lens, fill):
        nonlocal read_base
        if packed:
            from ..ops.pack import pack_codes_np

            pk_h, mk_h = pack_codes_np(codes)
            staged = (jax.device_put(pk_h), jax.device_put(mk_h))
        else:
            staged = jax.device_put(codes)
        nbat = min(CHUNK_BATCHES, (fill + B - 1) // B)
        bufs, _n, n_over = construct(
            staged, jax.device_put(lens), counter.buffers, read_base, 0, nbat,
        )
        counter.buffers = bufs
        n_over_acc.append(n_over)
        read_base += CH

    # Phased emission (device_out.PhasedEmitter): at a power-of-2 chunk
    # boundary near ~25% of the estimated input, a prefix finalize
    # identifies the nodes that already crossed min_abundance (the vast
    # majority at typical coverage), and a helper thread emits their
    # .sequences records + GFA index rows while the main thread keeps
    # streaming/staging the rest.  Power-of-2 boundaries keep the set of
    # prefix-finalize compile shapes bounded across runs.
    from .device_out import PhasedEmitter

    est_chunks = max(1, read_cap // CH)
    trigger_chunks = 4
    while trigger_chunks * 4 < est_chunks:
        trigger_chunks *= 2
    phase: dict = {}

    def start_phase1():
        pr = read_base * W_slot
        out1 = counter.finalize_dispatch(prefix_rows=pr)
        blob1 = np.concatenate(blob_parts)
        ro1 = np.concatenate(row_off_parts)
        em = PhasedEmitter(prefix, params, blob1, ro1,
                           no_basespace=params.no_basespace,
                           device_join=True)

        def run():
            ph1 = counter.finalize_resolve(out1, lazy=True, prefix_rows=pr,
                                           gk_mode="none")
            em.emit_phase(ph1)
            phase["ph1"] = ph1

        t = threading.Thread(target=run)
        t.start()
        phase["em"] = em
        phase["thread"] = t

    from .fastx_feed import stream_chunks

    with timer.phase("extract+count(device)"):
        chunks_flushed = 0
        for codes, lens, cblob, cblob_off, fill in stream_chunks(
                reads_path, CH, B, L, mean_len):
            if fill == 0:
                continue
            if codes.shape[1] != L:
                raise RuntimeError("read longer than staging width")
            if read_base + CH > counter.read_cap:
                counter.grow(read_base + CH)
            flush_chunk(codes, lens, fill)
            # global read row -> raw-byte offset (rows past fill are never
            # referenced: length-0 rows produce no windows)
            ro = np.full(CH, bytes_base, dtype=np.int64)
            ro[:fill] += cblob_off[:fill]
            blob_parts.append(cblob)
            row_off_parts.append(ro)
            bytes_base += int(cblob.size)
            nb_reads += fill
            chunks_flushed += 1
            if (chunks_flushed == trigger_chunks and "em" not in phase
                    and minimizer_recompute_ok(params)):
                start_phase1()
        if "thread" in phase:
            phase["thread"].join()  # phase-1 emission ran under the stream
        row_lo = phase["ph1"].n_pass if "ph1" in phase else 0
        # async device reduction starts; the blob concat overlaps it
        nodes = counter.finalize(lazy=True, row_lo=row_lo,
                                 gk_mode="device" if "em" in phase
                                 else "host")
        blob = (np.concatenate(blob_parts) if blob_parts
                else np.zeros(0, dtype=np.uint8))
        row_off = (np.concatenate(row_off_parts) if row_off_parts
                   else np.zeros(0, dtype=np.int64))
        n_over = sum(int(np.asarray(x)) for x in n_over_acc)
        if n_over:
            raise RuntimeError(
                f"{n_over} reads overflowed minimizer capacity; "
                "use --engine host"
            )

    stats["nb_reads"] = nb_reads
    with timer.phase("sequences+gfa"):
        from .device_out import emit_device_outputs

        nodes.prefetch_full("count")  # rides the relay under tail emission
        if "em" in phase:
            em = phase["em"]
            pot = counter.edge_join(nodes)  # device join + async POT fetch
            em.emit_phase(nodes, reads_buf=blob, row_off=row_off)
            counts = nodes.fetch_full("count")
            g = em.finish(counts, pot=pot)
        else:
            g = emit_device_outputs(prefix, params, nodes, blob, row_off,
                                    no_basespace=params.no_basespace)
            counts = nodes.fetch_full("count")
        stats["nb_windows"] = int(counts.sum())
    stats.update(g)
    stats["phases"] = timer.report()
    return stats


def sequences_path_for(prefix: str) -> str:
    from ..io.sequences import sequences_path

    return sequences_path(prefix, 0)


def load_lmer_counts(path: str) -> dict[str, int]:
    """Parse k-mer-counter output: `<lmer> <count>` lines, canonicalized
    (main.rs:546-566)."""
    counts: dict[str, int] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            lmer = parts[0]
            lrev = revcomp(lmer)
            counts[min(lmer, lrev)] = int(parts[1])
    return counts


def run_read_stats(reads_path: str, stats_path: str, params: Params,
                   table: NodeTable, out_path: str):
    """Second input pass writing per-read k-min-mer abundances
    (read_stats mode, main.rs:938-1004 + read_stats.rs)."""
    from ..ops.kminmer import fingerprint128_np
    from .extract import extract_minimizers_host, extract_windows_host

    max_len = max(1024, 2 * fastx.read_first_n_reads(stats_path, 100)[1])
    with open(out_path, "w") as out:
        for batch in fastx.batches(stats_path, params.batch_reads, max_len,
                                   keep_raw=False):
            wb = extract_windows_host(batch, params)
            ab = table.lookup_batch(wb.key_lo, wb.key_hi)
            for row in range(batch.codes.shape[0]):
                if batch.lengths[row] == 0:
                    continue
                sel = wb.read_row == row
                counts = "".join(f"{int(a)} " for a in ab[sel])
                out.write(f"{batch.ids[row]}: {counts}\n")
