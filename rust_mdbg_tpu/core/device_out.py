"""Pipelined host-side output emission for the device-table pipeline.

The device->host link in this environment is a ~35 MB/s relay, so the naive
sequence (fetch everything) -> (write .sequences) -> (build GFA) serializes
~27 MB of transfer with ~1 s of host formatting.  Here the per-node vector
array — the bulk of the transfer — is fetched in chunks, and each fetched
chunk immediately feeds (a) a native .sequences shard writer (C++, releases
the GIL) and (b) incremental GFA overlap-key computation, while the next
chunk is in flight.  The GFA edge join + write runs once the last chunk
lands.  Everything else (meta, counts) is fetched up front — it is small.

.sequences shard files map 1:1 to fetch chunks (`prefix.<i>.sequences`),
preserving the reference's multi-file glob contract (main.rs:616-630).
"""

from __future__ import annotations

import threading

import numpy as np


class LazyNodes:
    """Device-side finalize result with chunked host fetch.

    Wraps the _finalize_compact output dict (device arrays padded to
    node_cap).  Scalar-ish fields fetch eagerly; `vec` fetches in chunks of
    `chunk_rows` via vec_chunks().
    """

    def __init__(self, out: dict, n_pass: int, chunk_rows: int = 16384):
        self._out = out
        self.n_pass = n_pass
        self.chunk_rows = chunk_rows
        # Slice out the transfers up front; meta/count (small, needed first)
        # start their device->host copies immediately.  The (large) vec
        # chunks are fetched by a small thread pool in emit_device_outputs so
        # transfer overlaps the per-chunk host formatting/compression.
        self._pre = {}
        for name in ("meta", "count"):
            self._pre[name] = self._slice(out[name])
            try:
                self._pre[name].copy_to_host_async()
            except Exception:
                pass
        self._chunks = []
        c = chunk_rows
        for row0 in range(0, n_pass, c):
            self._chunks.append((row0, out["vec"][row0 : row0 + c]))

    def _slice(self, arr):
        cap2 = 1
        while cap2 < max(1, self.n_pass):
            cap2 <<= 1
        cap2 = min(cap2, arr.shape[0])
        return arr[:cap2]

    def fetch(self, name: str) -> np.ndarray:
        if name in self._pre:
            return np.asarray(self._pre[name])[: self.n_pass]
        return np.asarray(self._slice(self._out[name]))[: self.n_pass]

    def vec_chunks(self):
        """Yield (row0, vec_chunk ndarray) in row order, with the next
        transfers in flight on fetcher threads while the caller processes
        the current chunk (the relay moves ~25 MB/s; two streams gain
        ~20%)."""
        import concurrent.futures as cf

        def pull(item):
            row0, a = item
            hi = min(row0 + self.chunk_rows, self.n_pass)
            return row0, np.asarray(a)[: hi - row0]

        with cf.ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(pull, it) for it in self._chunks]
            for f in futs:
                yield f.result()


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

    meta = nodes.fetch("meta")
    count = nodes.fetch("count")
    n = nodes.n_pass
    index = np.arange(n, dtype=np.uint32)
    seqlen = meta[:, 0].astype(np.int64)
    shift0 = (meta[:, 1] & 0x7FFFFFFF).astype(np.uint16)
    shift1 = (meta[:, 2] & 0x7FFFFFFF).astype(np.uint16)
    rev = (meta[:, 2] >> 31).astype(np.uint8)
    start = meta[:, 3].astype(np.int64)
    read_g = meta[:, 4].astype(np.int64)
    abs_start = row_start_offsets[read_g] + start
    abs_end = abs_start + seqlen + (params.l - 2)

    writers: list[threading.Thread] = []
    gfa = IncrementalGFA(cap_hint=n)
    seqlen32 = meta[:, 0].astype(np.uint32)

    shard = 0
    for row0, vec in nodes.vec_chunks():
        hi = row0 + len(vec)
        if not no_basespace:
            t = threading.Thread(
                target=write_records_native,
                args=(f"{prefix}.{shard}.sequences", params.k, params.l,
                      index[row0:hi], vec, reads_buf, abs_start[row0:hi],
                      abs_end[row0:hi], rev[row0:hi], shift0[row0:hi],
                      shift1[row0:hi]),
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
