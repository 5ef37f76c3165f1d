#!/usr/bin/env python
"""Break down emit_device_outputs: vec transfer wait / .sequences native
write / GFA add_chunk / GFA finish, at bench scale."""
import os, sys, time, threading
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rust_mdbg_tpu.params import Params
    from rust_mdbg_tpu.ops.extract import DeviceExtractor
    from rust_mdbg_tpu.ops.sort_count import (DeviceNodeCounter,
                                              make_fused_construct,
                                              window_slot_capacity)
    from rust_mdbg_tpu.utils.seq import CODE_BASE
    from bench import synth_reads

    p = Params(k=21, l=14, density=0.003, min_kmer_abundance=2,
               engine="pallas", batch_reads=128, reads_already_hpc=True)
    genome, starts, L = synth_reads()
    B = p.batch_reads
    n_reads = len(starts) - (len(starts) % B)
    n_batches = n_reads // B
    dev = DeviceExtractor(p)
    M = dev.capacity(L)
    W_slot = window_slot_capacity(p, B, L, M)
    counter = DeviceNodeCounter(k=p.k, M=M, read_cap=n_reads,
                                node_cap=1 << 18, minab=2, w_slot=W_slot)
    construct = make_fused_construct(p, B, L, M, n_batches, w_slot=W_slot)

    genome_dev = jax.device_put(genome)
    starts_dev = jax.device_put(starts[:n_reads].astype(np.int32))
    all_lengths = jax.device_put(np.full((n_reads,), L, dtype=np.int32))

    @jax.jit
    def stage(g, st):
        return g[st[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]]
    all_codes = stage(genome_dev, starts_dev)

    genome_ascii = CODE_BASE[genome]
    prefix = "/tmp/mdbg_bench/prof"
    os.makedirs("/tmp/mdbg_bench", exist_ok=True)

    def run_once():
        t0 = time.perf_counter()
        bufs, n_filled, n_over = construct(all_codes, all_lengths,
                                           counter.buffers)
        counter.buffers = bufs
        np.asarray(n_over)
        t_loop = time.perf_counter() - t0
        nodes = counter.finalize(lazy=True)
        t_fin_dispatch = time.perf_counter() - t0 - t_loop

        # instrumented emit
        from rust_mdbg_tpu.core.graph import IncrementalGFA, _fp_pair, _le_rev
        from rust_mdbg_tpu.io.sequences import write_records_native
        params = p
        reads_buf = genome_ascii
        row_start_offsets = starts.astype(np.int64)

        te0 = time.perf_counter()
        meta = nodes.fetch("meta")
        count = nodes.fetch("count")
        t_meta = time.perf_counter() - te0
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

        writers = []
        gfa = IncrementalGFA(cap_hint=n)
        seqlen32 = meta[:, 0].astype(np.uint32)
        t_xfer = 0.0
        t_gfa_add = 0.0
        wbytes = 0
        t_write_cpu = [0.0]
        lock = threading.Lock()

        def timed_write(*a):
            w0 = time.perf_counter()
            write_records_native(*a)
            with lock:
                t_write_cpu[0] += time.perf_counter() - w0

        shard = 0
        tx0 = time.perf_counter()
        for row0, vec in nodes.vec_chunks():
            t_xfer += time.perf_counter() - tx0
            wbytes += vec.nbytes
            hi = row0 + len(vec)
            t = threading.Thread(target=timed_write, args=(
                f"{prefix}.{shard}.sequences", params.k, params.l,
                index[row0:hi], vec, reads_buf, abs_start[row0:hi],
                abs_end[row0:hi], rev[row0:hi], shift0[row0:hi],
                shift1[row0:hi]))
            t.start()
            writers.append(t)
            g0 = time.perf_counter()
            suf = vec[:, 1:]
            pre = vec[:, :-1]
            Fs, FsR = _fp_pair(suf)
            Fp, FpR = _fp_pair(pre)
            key_suf = np.where(_le_rev(suf)[:, None], Fs, FsR)
            key_pre = np.where(_le_rev(pre)[:, None], Fp, FpR)
            gfa.add_chunk(index[row0:hi], count[row0:hi], seqlen32[row0:hi],
                          shift0[row0:hi], shift1[row0:hi],
                          (Fs, Fp, FsR, FpR, key_suf, key_pre))
            t_gfa_add += time.perf_counter() - g0
            shard += 1
            tx0 = time.perf_counter()
        gf0 = time.perf_counter()
        g = gfa.finish(f"{prefix}.gfa", presimp=params.presimp)
        t_gfa_fin = time.perf_counter() - gf0
        jw0 = time.perf_counter()
        for t in writers:
            t.join()
        t_join = time.perf_counter() - jw0
        wall = time.perf_counter() - t0
        seq_bytes = int((abs_end - abs_start).sum())
        return dict(wall=wall, loop=t_loop, fin=t_fin_dispatch, meta=t_meta,
                    xfer=t_xfer, gfa_add=t_gfa_add, gfa_fin=t_gfa_fin,
                    join=t_join, wcpu=t_write_cpu[0], n=n,
                    vec_mb=wbytes / 1e6, seq_mb=seq_bytes / 1e6,
                    nodes=g["nb_nodes"])

    run_once()
    r = min((run_once() for _ in range(2)), key=lambda d: d["wall"])
    for k, v in r.items():
        print(f"{k}: {v:.3f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
