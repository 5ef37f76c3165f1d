"""Pipelined host-side output emission for the device-table pipeline.

The device->host link in this environment is a ~20-35 MB/s relay, so the
per-node payload crossing it decides the output-phase wall time.  Two paths:

1. **Recompute path** (density scheme + reads already HPC'd): the finalize
   kernel emits 128-bit (k-1)-overlap fingerprints ON DEVICE (sort_count
   `emit_overlap_keys`), and the native .sequences writer re-derives each
   node's minimizer values from the record's own sequence bytes with a
   rolling ntHash (native/seqwriter.cpp) — the [n, k] u64 vector array never
   crosses the link.  Per-node transfer: 20 B meta + 4 B count + 64 B
   fingerprints + 1 B flags ~= 89 B, vs 8k+24 ~= 192 B with vectors.
   The fingerprint fetch rides the relay while the writer threads (C++,
   GIL-released) chew through the sequence formatting.

2. **Vector path** (any other scheme/mode): the per-node vector array — the
   bulk of the transfer — is fetched in chunks, and each fetched chunk
   immediately feeds (a) a native .sequences shard writer and (b) incremental
   GFA overlap-key computation, while the next chunk is in flight.

.sequences shard files map 1:1 to writer threads (`prefix.<i>.sequences`),
preserving the reference's multi-file glob contract (main.rs:616-630).
"""

from __future__ import annotations

import threading

import numpy as np


def minimizer_recompute_ok(params) -> bool:
    """True when stored node sequences live in the same space the density
    hash ran over, so native/seqwriter.cpp can re-derive minimizer values
    from sequence bytes: plain density scheme (no syncmers/UHS/LCP/robust
    remap) over reads that are already homopolymer-compressed (otherwise
    device hashing is HPC-space while the stored seq is raw-space)."""
    return (getattr(params, "reads_already_hpc", False)
            and not params.use_syncmers
            and not params.uhs
            and not params.lcp
            and not params.has_lmer_counts)


class LazyNodes:
    """Device-side finalize result with chunked host fetch.

    Wraps the _finalize_compact output dict (device arrays padded to
    node_cap).  Scalar-ish fields fetch eagerly; `vec` fetches in chunks of
    `chunk_rows` via vec_chunks().  want_vec=False skips staging the vec
    chunks entirely (recompute path).
    """

    def __init__(self, out: dict, n_pass: int, chunk_rows: int = 16384,
                 want_vec: bool = True, row_lo: int = 0,
                 want_gk: bool = True):
        self._out = out
        self.n_pass = n_pass
        # phased emission: rows [0, row_lo) were already emitted by an
        # earlier-prefix finalize (crossing order makes them an exact prefix
        # of this result), so only [row_lo, n_pass) is prefetched/yielded
        self.row_lo = row_lo
        self.n_new = n_pass - row_lo
        self.chunk_rows = chunk_rows
        # Slice out the transfers up front; small fields needed first (meta,
        # count) start their device->host copies immediately; the overlap
        # fingerprints (gk/gflag, recompute path) queue behind them and ride
        # the relay while the .sequences writer threads run.  The (large) vec
        # chunks are fetched by a small thread pool in emit_device_outputs so
        # transfer overlaps the per-chunk host formatting/compression.
        self._pre = {}
        pre_names = ["meta", "meta16", "metarow", "count", "mpos"]
        if want_gk:
            # the device-join path never reads gflag on the host
            pre_names.append("gflag")
        for name in pre_names:
            if name not in out:
                continue
            self._pre[name] = self._slice(out[name])
            try:
                self._pre[name].copy_to_host_async()
            except Exception:
                pass
        # the fingerprint array is fetched in chunks so the per-chunk GFA
        # S-line/index build overlaps the next chunk's transfer.
        # want_gk=False: the device edge join consumes gk in place — no host
        # staging (the POT list crosses instead, ops/edge_join.py)
        self._gk_chunks = []
        if "gk" in out and want_gk:
            c = max(8192, chunk_rows // 2)
            for row0 in range(self._lo_r(), n_pass, c):
                sl = out["gk"][row0 : row0 + c]
                try:
                    sl.copy_to_host_async()
                except Exception:
                    pass
                self._gk_chunks.append((row0, sl))
        self._chunks = []
        if want_vec:
            c = chunk_rows
            for row0 in range(self._lo_r(), n_pass, c):
                self._chunks.append((row0, out["vec"][row0 : row0 + c]))

    def has(self, name: str) -> bool:
        return name in self._out

    def _lo_r(self) -> int:
        # row_lo rounded down to an 8k boundary: bounded set of slice shapes
        return self.row_lo & ~8191

    def _slice(self, arr):
        cap2 = 1
        while cap2 < max(1, self.n_pass):
            cap2 <<= 1
        cap2 = min(cap2, arr.shape[0])
        return arr[self._lo_r() : cap2]

    def fetch(self, name: str) -> np.ndarray:
        """Host array for rows [row_lo, n_pass) — the phase's NEW nodes."""
        trim = self.row_lo - self._lo_r()
        if name == "meta" and "meta16" in self._pre:
            # re-widen the u16 wire packing (ops/sort_count meta16/metarow)
            # into the canonical 5-col u32 meta layout
            m16 = self.fetch("meta16").astype(np.uint32)
            mrow = self.fetch("metarow")
            meta = np.empty((len(mrow), 5), dtype=np.uint32)
            meta[:, 0] = m16[:, 0]
            meta[:, 1] = m16[:, 1] | np.uint32(1 << 31)
            meta[:, 2] = m16[:, 2] | (mrow & np.uint32(1 << 31))
            meta[:, 3] = m16[:, 3]
            meta[:, 4] = mrow & np.uint32(0x7FFFFFFF)
            return meta
        if name == "gk" and self._gk_chunks:
            parts = []
            for r, a in self._gk_chunks:
                hi = min(r + a.shape[0], self.n_pass)
                parts.append(np.asarray(a)[: hi - r])
            return np.concatenate(parts)[trim:]
        if name in self._pre:
            arr = np.asarray(self._pre[name])
            return arr[: self.n_pass - self._lo_r()][trim:]
        return np.asarray(self._slice(self._out[name]))[
            : self.n_pass - self._lo_r()][trim:]

    def prefetch_full(self, name: str) -> None:
        """Start the device->host copy of fetch_full(name) now, so it rides
        the relay while the caller does other host work (e.g. the final
        counts fetch starting under the tail .sequences emission)."""
        if not hasattr(self, "_full"):
            self._full = {}
        if name in self._full:
            return
        cap2 = 1
        while cap2 < max(1, self.n_pass):
            cap2 <<= 1
        arr = self._out[name]
        sl = arr[: min(cap2, arr.shape[0])]
        try:
            sl.copy_to_host_async()
        except Exception:
            pass
        self._full[name] = sl

    def fetch_full(self, name: str) -> np.ndarray:
        """Host array for ALL rows [0, n_pass) regardless of row_lo (the
        whole-run abundance fetch at finish time)."""
        if hasattr(self, "_full") and name in self._full:
            return np.asarray(self._full[name])[: self.n_pass]
        cap2 = 1
        while cap2 < max(1, self.n_pass):
            cap2 <<= 1
        arr = self._out[name]
        cap2 = min(cap2, arr.shape[0])
        return np.asarray(arr[:cap2])[: self.n_pass]

    def gk_chunks(self):
        """Yield (row0 - row_lo, gk_chunk) in row order for rows >= row_lo;
        transfers were started async at construction, so chunk i+1 rides the
        relay while the caller feeds chunk i to the native GFA builder."""
        for row0, a in self._gk_chunks:
            hi = min(row0 + a.shape[0], self.n_pass)
            arr = np.asarray(a)[: hi - row0]
            if row0 < self.row_lo:
                arr = arr[self.row_lo - row0 :]
                row0 = self.row_lo
            if len(arr):
                yield row0 - self.row_lo, arr

    def vec_chunks(self):
        """Yield (row0 - row_lo, vec_chunk ndarray) in row order, with the
        next transfers in flight on fetcher threads while the caller
        processes the current chunk (the relay moves ~25 MB/s; two streams
        gain ~20%)."""
        import concurrent.futures as cf

        if not self._chunks and self.n_new:
            # want_vec=False but a caller needs vectors after all (e.g. the
            # recompute writer hit a gate violation): stage chunks now
            c = self.chunk_rows
            for row0 in range(self._lo_r(), self.n_pass, c):
                self._chunks.append((row0, self._out["vec"][row0 : row0 + c]))

        def pull(item):
            row0, a = item
            hi = min(row0 + self.chunk_rows, self.n_pass)
            return row0, np.asarray(a)[: hi - row0]

        with cf.ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(pull, it) for it in self._chunks]
            for f in futs:
                row0, arr = f.result()
                if row0 < self.row_lo:
                    arr = arr[self.row_lo - row0 :]
                    row0 = self.row_lo
                if len(arr):
                    yield row0 - self.row_lo, arr


def _node_offsets(params, meta, row_start_offsets):
    """Decode the packed finalize meta into writer-ready arrays.

    Returns (shift0, shift1, seq_shift0, seq_shift1, rev, abs_start,
    abs_end): the first pair is the node-table/GFA pair (reference
    semantics), the second the exact-cut pair written to .sequences — equal
    unless the 6-col meta carries the extpack column (raw-input runs)."""
    seqlen = meta[:, 0].astype(np.int64)
    shift0 = (meta[:, 1] & 0x7FFFFFFF).astype(np.uint16)
    shift1 = (meta[:, 2] & 0x7FFFFFFF).astype(np.uint16)
    rev = (meta[:, 2] >> 31).astype(np.uint8)
    start = meta[:, 3].astype(np.int64)
    read_g = meta[:, 4].astype(np.int64)
    abs_start = row_start_offsets[read_g] + start
    abs_end = abs_start + seqlen + (params.l - 2)
    seq_shift0, seq_shift1 = shift0, shift1
    if meta.shape[1] > 5:
        from ..ops.extract import _unpack_ext

        ext_delta, de1 = _unpack_ext(meta[:, 5])
        abs_end = abs_end + ext_delta
        r = rev.astype(bool)
        seq_shift0 = np.where(r, shift0 + de1, shift0).astype(np.uint16)
        seq_shift1 = np.where(r, shift1, shift1 + de1).astype(np.uint16)
    return shift0, shift1, seq_shift0, seq_shift1, rev, abs_start, abs_end


def emit_device_outputs(prefix: str, params, nodes: LazyNodes,
                        reads_buf: np.ndarray, row_start_offsets: np.ndarray,
                        no_basespace: bool = False) -> dict:
    """Write .sequences shards + GFA from a LazyNodes finalize result.

    reads_buf: uint8 ASCII base buffer; node i's sequence is
    reads_buf[row_start_offsets[read_row] + start : ... + seqlen + l - 2],
    reverse-complemented when the crossing occurrence was reversed.

    Returns the build_gfa stats dict.
    """
    from ..core.graph import IncrementalGFA, _fp_pair, _le_rev
    from ..io.sequences import write_records_native

    if nodes.has("gk") and minimizer_recompute_ok(params):
        em = PhasedEmitter(prefix, params, reads_buf, row_start_offsets,
                           no_basespace=no_basespace, cap_hint=nodes.n_pass)
        em.emit_phase(nodes)
        return em.finish(nodes.fetch_full("count"))

    meta = nodes.fetch("meta")
    count = nodes.fetch("count")
    n = nodes.n_pass
    index = np.arange(n, dtype=np.uint32)
    shift0, shift1, sq0, sq1, rev, abs_start, abs_end = _node_offsets(
        params, meta, row_start_offsets)
    seqlen32 = meta[:, 0].astype(np.uint32)

    writers: list[threading.Thread] = []
    gfa = IncrementalGFA(cap_hint=n)

    shard = 0
    for row0, vec in nodes.vec_chunks():
        hi = row0 + len(vec)
        if not no_basespace:
            t = threading.Thread(
                target=write_records_native,
                args=(f"{prefix}.{shard}.sequences", params.k, params.l,
                      index[row0:hi], vec, reads_buf, abs_start[row0:hi],
                      abs_end[row0:hi], rev[row0:hi], sq0[row0:hi],
                      sq1[row0:hi]),
            )
            t.start()
            writers.append(t)
        # overlap keys (numpy) + native index build for this chunk, both
        # hidden under the next chunk's device->host transfer
        suf = vec[:, 1:]
        pre = vec[:, :-1]
        Fs, FsR = _fp_pair(suf)
        Fp, FpR = _fp_pair(pre)
        key_suf = np.where(_le_rev(suf)[:, None], Fs, FsR)
        key_pre = np.where(_le_rev(pre)[:, None], Fp, FpR)
        gfa.add_chunk(index[row0:hi], count[row0:hi], seqlen32[row0:hi],
                      shift0[row0:hi], shift1[row0:hi],
                      (Fs, Fp, FsR, FpR, key_suf, key_pre))
        shard += 1

    g = gfa.finish(f"{prefix}.gfa", presimp=params.presimp)
    for t in writers:
        t.join()
    return g


class PhasedEmitter:
    """Recompute-path emission, one phase at a time.

    Each phase receives the nodes whose abundance CROSSING fell inside the
    phase's window range (a row range of the crossing-ordered finalize,
    ops/sort_count `prefix_rows`/`row_lo`); their
    .sequences records and GFA index rows are final at that point — only the
    abundance keeps growing, so the S-line KC values arrive late via
    `finish(counts)` (deferred-S native builder).  The whole point: phases
    1..K-1 run while the device is still counting later batches, so the
    emission CPU (writers, LZ4, km_index build) hides under the construct
    loop instead of serializing after it.

    Single-shot use (emit_device_outputs) is one emit_phase + finish."""

    def __init__(self, prefix, params, reads_buf, row_start_offsets,
                 no_basespace: bool = False, cap_hint: int = 0,
                 accel: int = 2, device_join: bool = False):
        from ..core.graph import IncrementalGFA

        self.prefix = prefix
        self.params = params
        self.reads_buf = reads_buf
        self.row_off = row_start_offsets
        self.no_basespace = no_basespace
        self.accel = accel
        # device_join: edges arrive as a device-joined POT list at finish
        # (ops/edge_join); phases feed no fingerprints and build no km_index
        self.device_join = device_join
        self.gfa = IncrementalGFA(cap_hint=cap_hint, defer_abundance=True)
        self.writers: list[threading.Thread] = []
        self.errors: list[BaseException] = []
        self.shard = 0
        self.id_base = 0
        self._phases: list[tuple] = []  # fallback state (gate violation)
        self._meta_parts: list[tuple] = []  # (seqlen32, shift0, shift1)

    def _write(self, *a, **kw):
        from ..io.sequences import write_records_native

        try:
            write_records_native(*a, **kw)
        except BaseException as e:  # surfaced at finish
            self.errors.append(e)

    def emit_phase(self, nodes: LazyNodes, n_shards: int = 8,
                   reads_buf=None, row_off=None):
        """reads_buf/row_off override the constructor's (streaming callers
        snapshot only the reads a phase can reference: a phase's crossing
        metadata never points past its own window range)."""
        p = self.params
        rb = self.reads_buf if reads_buf is None else reads_buf
        ro = self.row_off if row_off is None else row_off
        n = nodes.n_new
        if n == 0:
            return
        meta = nodes.fetch("meta")
        index = np.arange(self.id_base, self.id_base + n, dtype=np.uint32)
        self.id_base += n
        shift0, shift1, sq0, sq1, rev, abs_start, abs_end = _node_offsets(
            p, meta, ro)
        seqlen32 = meta[:, 0].astype(np.uint32)

        if not self.no_basespace:
            # device-computed record-space minimizer positions (84 B/node,
            # prefetched async at LazyNodes construction): the writer hashes
            # k l-mers per node instead of rolling over every base
            mpos = nodes.fetch("mpos") if nodes.has("mpos") else None
            n_shards = max(1, min(n_shards, (n + 4095) // 4096))
            bounds = np.linspace(0, n, n_shards + 1).astype(int)
            for s in range(n_shards):
                a, b = bounds[s], bounds[s + 1]
                t = threading.Thread(
                    target=self._write,
                    args=(f"{self.prefix}.{self.shard}.sequences", p.k, p.l,
                          index[a:b], None, rb, abs_start[a:b],
                          abs_end[a:b], rev[a:b], sq0[a:b], sq1[a:b]),
                    kwargs=dict(hash_bound=p.hash_bound, accel=self.accel,
                                mpos=None if mpos is None else mpos[a:b]),
                )
                t.start()
                self.writers.append(t)
                self.shard += 1

        if self.device_join:
            # keys stay on device: one keys-free feed (S-line data only);
            # finish receives the POT list
            self.gfa.add_chunk(index, np.zeros(n, np.uint32), seqlen32,
                               shift0, shift1, None)
            self._meta_parts.append((seqlen32, shift0, shift1))
        else:
            # fingerprint fetch + km_index build, overlapped with the writer
            # threads; chunked so the build rides under the next transfer
            gflag = nodes.fetch("gflag")
            for row0, gk in nodes.gk_chunks():
                hi = row0 + len(gk)
                Fs, Fp = gk[:, 0:2], gk[:, 2:4]
                FsR, FpR = gk[:, 4:6], gk[:, 6:8]
                gf = gflag[row0:hi]
                key_suf = np.where((gf & 1).astype(bool)[:, None], Fs, FsR)
                key_pre = np.where((gf & 2).astype(bool)[:, None], Fp, FpR)
                self.gfa.add_chunk(index[row0:hi],
                                   np.zeros(hi - row0, np.uint32),
                                   seqlen32[row0:hi], shift0[row0:hi],
                                   shift1[row0:hi],
                                   (Fs, Fp, FsR, FpR, key_suf, key_pre))
        # the fallback rewrite needs the .sequences cut pair (sq0/sq1), not
        # the GFA pair (which _meta_parts keeps for the host join)
        self._phases.append((nodes, index, abs_start, abs_end, rev,
                             sq0, sq1, rb))

    def finish(self, counts: np.ndarray, pot=None) -> dict:
        """counts: whole-run abundances for ALL emitted nodes, in id order
        (= global crossing order = the per-phase feed order concatenated).

        pot: an ops.sort_count.PotJoin handle when device_join is on (its
        transfers ride the relay under the tail emission; resolve() blocks
        here).  None from edge_join, or resolve() returning None
        (G_SLOTS group overflow), falls back to the host km_index join with
        a full fingerprint fetch from the final finalize (covers all ids)."""
        import os as _os
        import time as _time

        detail = _os.environ.get("MDBG_BENCH_DETAIL")
        t0 = _time.perf_counter()
        self.gfa.set_abundance(counts)
        if self.device_join:
            arrays = pot.resolve() if pot is not None else None
            t1 = _time.perf_counter()
            if arrays is not None:
                g = self.gfa.finish_pot(f"{self.prefix}.gfa",
                                        self.params.presimp, *arrays)
            else:
                g = self._finish_host_join(counts)
        else:
            t1 = _time.perf_counter()
            g = self.gfa.finish(f"{self.prefix}.gfa",
                                presimp=self.params.presimp)
        t2 = _time.perf_counter()
        for t in self.writers:
            t.join()
        if detail:
            import sys as _sys

            print(f"# finish: resolve={t1 - t0:.3f} gfa={t2 - t1:.3f} "
                  f"writer_join={_time.perf_counter() - t2:.3f}",
                  file=_sys.stderr)
        if self.errors:
            import warnings

            warnings.warn(
                f"minimizer recompute failed ({self.errors[0]}); rewriting "
                ".sequences shards from device vectors")
            self._rewrite_from_vec()
        return g

    def _finish_host_join(self, counts: np.ndarray) -> dict:
        """Rare fallback when a key group exceeds the device join's G_SLOTS
        cap (very deep repeats): fetch the FINAL finalize's fingerprints for
        all ids and run the host km_index join on a fresh builder.  The
        original builder (keys-free) is discarded."""
        from ..core.graph import IncrementalGFA

        self.gfa.abort()
        final = self._phases[-1][0]
        gk = final.fetch_full("gk")
        gflag = final.fetch_full("gflag")
        n = len(counts)
        gk, gflag = gk[:n], gflag[:n]
        Fs, Fp, FsR, FpR = gk[:, 0:2], gk[:, 2:4], gk[:, 4:6], gk[:, 6:8]
        key_suf = np.where((gflag & 1).astype(bool)[:, None], Fs, FsR)
        key_pre = np.where((gflag & 2).astype(bool)[:, None], Fp, FpR)
        seqlen = np.concatenate([m[0] for m in self._meta_parts])
        shift0 = np.concatenate([m[1] for m in self._meta_parts])
        shift1 = np.concatenate([m[2] for m in self._meta_parts])
        g = IncrementalGFA(cap_hint=n)
        g.add_chunk(np.arange(n, dtype=np.uint32), counts[:n], seqlen,
                    shift0, shift1, (Fs, Fp, FsR, FpR, key_suf, key_pre))
        return g.finish(f"{self.prefix}.gfa", presimp=self.params.presimp)

    def _rewrite_from_vec(self):
        """Correctness fallback for a recompute-gate violation: fetch the
        vectors after all and rewrite every shard (never expected to run;
        the GFA is unaffected)."""
        from ..io.sequences import write_records_native

        shard = 0
        for nodes, index, abs_start, abs_end, rev, shift0, shift1, rb \
                in self._phases:
            for row0, vec in nodes.vec_chunks():
                hi = row0 + len(vec)
                write_records_native(
                    f"{self.prefix}.{shard}.sequences", self.params.k,
                    self.params.l, index[row0:hi], vec, rb,
                    abs_start[row0:hi], abs_end[row0:hi], rev[row0:hi],
                    shift0[row0:hi], shift1[row0:hi])
                shard += 1
        import glob as _glob
        import os as _os

        for pth in _glob.glob(f"{self.prefix}.*.sequences"):
            try:
                s = int(pth.rsplit(".", 2)[-2])
            except ValueError:
                continue
            if s >= shard:
                try:
                    _os.remove(pth)
                except OSError:
                    pass


