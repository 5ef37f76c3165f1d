#!/usr/bin/env python
"""Isolate finalize cost: emit_overlap_keys on/off, plus fetch staging."""
import os, sys, time
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

    genome_dev = jax.device_put(genome)
    starts_dev = jax.device_put(starts[:n_reads].astype(np.int32))
    all_lengths = jax.device_put(np.full((n_reads,), L, dtype=np.int32))

    @jax.jit
    def stage(g, st):
        return g[st[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]]
    all_codes = stage(genome_dev, starts_dev)

    for keys in (False, True):
        counter = DeviceNodeCounter(k=p.k, M=M, read_cap=n_reads,
                                    node_cap=1 << 18, minab=2, w_slot=W_slot,
                                    emit_overlap_keys=keys)
        construct = make_fused_construct(p, B, L, M, n_batches, w_slot=W_slot)
        bufs, _n, n_over = construct(all_codes, all_lengths, counter.buffers)
        counter.buffers = bufs
        jax.block_until_ready(bufs)
        # warm compile
        out = counter._finalize(*counter.buffers)
        jax.block_until_ready(out["stats3"])
        best_dev = 1e9
        best_stats = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = counter._finalize(*counter.buffers)
            jax.block_until_ready(out)  # FULL device completion
            best_dev = min(best_dev, time.perf_counter() - t0)
            t0 = time.perf_counter()
            out = counter._finalize(*counter.buffers)
            np.asarray(out["stats3"])   # what bench's construct_s sees
            best_stats = min(best_stats, time.perf_counter() - t0)
        print(f"emit_overlap_keys={keys}: device={best_dev*1000:.1f} ms "
              f"stats3-visible={best_stats*1000:.1f} ms")


if __name__ == "__main__":
    main()
