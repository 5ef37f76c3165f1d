#!/usr/bin/env python
"""Capture a jax.profiler trace of the real construct loop (few batches)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rust_mdbg_tpu.params import Params
    from rust_mdbg_tpu.ops.extract import DeviceExtractor
    from rust_mdbg_tpu.ops.sort_count import DeviceNodeCounter, make_fused_construct, window_slot_capacity
    from bench import synth_reads

    p = Params(k=21, l=14, density=0.003, min_kmer_abundance=2,
               engine="pallas", batch_reads=128, reads_already_hpc=True)
    genome, starts, L = synth_reads(genome_mbp=20, coverage=10)
    B = p.batch_reads
    n_batches = int(os.environ.get("NB", "32"))
    n_reads = n_batches * B
    dev = DeviceExtractor(p)
    M = dev.capacity(L)
    W = M - p.k + 1
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

    bufs, n_filled, n_over = construct(all_codes, all_lengths, counter.buffers)
    counter.buffers = bufs
    np.asarray(n_over)
    t0 = time.perf_counter()
    bufs, n_filled, n_over = construct(all_codes, all_lengths, counter.buffers)
    counter.buffers = bufs
    np.asarray(n_over)
    t = time.perf_counter() - t0
    print(f"loop: {t:.3f}s = {t/n_batches*1000:.2f} ms/batch "
          f"({n_reads*L/t/1e9:.3f} Gbp/s)")

    if os.environ.get("TRACE"):
        with jax.profiler.trace("/tmp/mdbg_trace"):
            bufs, n_filled, n_over = construct(all_codes, all_lengths, counter.buffers)
            counter.buffers = bufs
            np.asarray(n_over)
        print("trace written to /tmp/mdbg_trace")

if __name__ == "__main__":
    main()
