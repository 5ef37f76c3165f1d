#!/usr/bin/env python
"""Profiling variant of bench.py: fine-grained timers on each stage."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rust_mdbg_tpu.ops.extract import DeviceExtractor
    from rust_mdbg_tpu.params import Params
    from rust_mdbg_tpu.core.graph import build_gfa
    from rust_mdbg_tpu.ops.sort_count import DeviceNodeCounter, make_fused_construct, window_slot_capacity
    from bench import synth_reads

    p = Params(k=21, l=14, density=0.003, min_kmer_abundance=2,
               engine="pallas", batch_reads=128, reads_already_hpc=True)
    genome, starts, L = synth_reads()
    B = p.batch_reads
    n_reads = len(starts) - (len(starts) % B)
    total_bases = n_reads * L

    dev = DeviceExtractor(p)
    tmpdir = "/tmp/mdbg_bench"
    os.makedirs(tmpdir, exist_ok=True)
    prefix = os.path.join(tmpdir, "bench")

    import jax.numpy as jnp
    n_batches = n_reads // B
    M = dev.capacity(L)
    W = M - p.k + 1
    print(f"n_reads={n_reads} n_batches={n_batches} M={M} W={W} "
          f"window_cap={n_batches*B*W}", file=sys.stderr)
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

    # warmup
    bufs, n_filled, n_over = construct(all_codes, all_lengths, counter.buffers)
    counter.buffers = bufs
    counter.finalize()

    t0 = time.perf_counter()
    bufs, n_filled, n_over = construct(all_codes, all_lengths, counter.buffers)
    counter.buffers = bufs
    np.asarray(n_over)
    t_loop = time.perf_counter() - t0

    # finalize, decomposed: device part vs host fetch
    tf0 = time.perf_counter()
    out = counter._finalize(*counter.buffers)
    np.asarray(out["stats3"])
    t_fin_dev = time.perf_counter() - tf0
    tf1 = time.perf_counter()
    n_pass = int(np.asarray(out["stats3"])[0])
    cap2 = 1
    while cap2 < max(1, n_pass):
        cap2 <<= 1
    cap2 = min(cap2, counter.node_cap)
    res = {}
    for name in ("key_lo", "key_hi", "count", "meta", "vec"):
        if name in out:
            res[name] = np.asarray(out[name][:cap2])[:n_pass]
    res["index"] = np.arange(n_pass, dtype=np.uint32)
    t_fin_fetch = time.perf_counter() - tf1
    nodes_dev = res

    # host side, decomposed
    th0 = time.perf_counter()
    from rust_mdbg_tpu.io.sequences import write_records_native_sharded
    from rust_mdbg_tpu.utils.seq import CODE_BASE
    meta = nodes_dev["meta"]
    seqlen_a = meta[:, 0].astype(np.int64)
    shift0_a = (meta[:, 1] & 0x7FFFFFFF).astype(np.uint16)
    shift1_a = (meta[:, 2] & 0x7FFFFFFF).astype(np.uint16)
    rev_a = (meta[:, 2] >> 31).astype(np.uint8)
    start_a = meta[:, 3].astype(np.int64)
    read_g = meta[:, 4].astype(np.int64)
    abs_start = starts[read_g] + start_a
    abs_end = abs_start + seqlen_a + (p.l - 2)
    t_meta = time.perf_counter() - th0

    th1 = time.perf_counter()
    genome_ascii = CODE_BASE[genome]
    t_ascii = time.perf_counter() - th1

    seq_bytes = int((abs_end - abs_start).sum())
    th2 = time.perf_counter()
    write_records_native_sharded(
        prefix, p.k, p.l, nodes_dev["index"], nodes_dev["vec"], genome_ascii,
        abs_start, abs_end, rev_a, shift0_a, shift1_a)
    t_write = time.perf_counter() - th2

    th3 = time.perf_counter()
    nodes = dict(index=nodes_dev["index"], abundance=nodes_dev["count"],
                 seqlen=meta[:, 0].astype(np.uint32), shift0=shift0_a,
                 shift1=shift1_a)
    g = build_gfa(prefix + ".gfa", nodes, nodes_dev["vec"], presimp=0.01)
    t_gfa = time.perf_counter() - th3
    t1 = time.perf_counter()
    gbps = total_bases / (t1 - t0) / 1e9
    print(json.dumps({
        "gbps": round(gbps, 4), "vs": round(gbps / (114.4/411.0), 2),
        "wall": round(t1 - t0, 3), "loop": round(t_loop, 3),
        "fin_dev": round(t_fin_dev, 3), "fin_fetch": round(t_fin_fetch, 3),
        "meta": round(t_meta, 3), "ascii": round(t_ascii, 3),
        "seqwrite": round(t_write, 3), "gfa": round(t_gfa, 3),
        "n_pass": n_pass, "seq_MB": round(seq_bytes/1e6, 1),
        "edges": g["nb_edges"],
    }))

if __name__ == "__main__":
    main()
