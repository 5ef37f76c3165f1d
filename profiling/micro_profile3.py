#!/usr/bin/env python
"""Sub-profile the batch-slot compaction stage."""
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
    from rust_mdbg_tpu.ops.extract import _device_extract, DeviceExtractor
    from rust_mdbg_tpu.ops.sort_count import window_slot_capacity
    from bench import synth_reads

    p = Params(k=21, l=14, density=0.003, min_kmer_abundance=2,
               engine="pallas", batch_reads=128, reads_already_hpc=True)
    genome, starts, L = synth_reads(genome_mbp=20, coverage=10)
    B = 128
    n_reads = len(starts) - (len(starts) % B)
    n_batches = min(n_reads // B, 64)
    n_reads = n_batches * B

    genome_dev = jax.device_put(genome)
    starts_dev = jax.device_put(starts[:n_reads].astype(np.int32))
    lengths = jax.device_put(np.full((n_reads,), L, dtype=np.int32))

    @jax.jit
    def stagef(g, st):
        return g[st[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]]
    all_codes = stagef(genome_dev, starts_dev)
    np.asarray(all_codes[0, 0])

    dev = DeviceExtractor(p)
    M = dev.capacity(L)
    W = M - p.k + 1
    W_slot = window_slot_capacity(p, B, L, M)
    S = B * W_slot
    print(f"M={M} W={W} W_slot={W_slot} S={S}")

    ek = dict(l=p.l, k=p.k, hash_bound=p.hash_bound, M=M,
              already_hpc=True, count_output=True, use_pallas=True,
              syncmer=None)
    sentinel = ~np.uint64(0)

    def loop(fn):
        @jax.jit
        def run(codes, lens):
            def body(i, acc):
                c = jax.lax.dynamic_slice(codes, (i * B, 0), (B, L))
                ln = jax.lax.dynamic_slice(lens, (i * B,), (B,))
                return acc + fn(c, ln)
            return jax.lax.fori_loop(0, n_batches, body, jnp.uint32(0))
        return run

    def base(c, ln):
        out = _device_extract(c, ln, **ek)
        return ((out["keys"][..., 0] & jnp.uint64(0xFF)).sum(dtype=jnp.uint32)
                + out["nw"].sum().astype(jnp.uint32))

    def rowmap_only(c, ln):
        out = _device_extract(c, ln, **ek)
        nw = out["nw"].astype(jnp.int32)
        offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(nw)])
        nv = offs[B]
        pos = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)[:, 0]
        row = jnp.clip(jnp.searchsorted(offs, pos, side="right") - 1, 0, B - 1
                       ).astype(jnp.int32)
        w = pos - offs[row]
        return (row.sum().astype(jnp.uint32) + w.sum().astype(jnp.uint32)
                + (out["keys"][..., 0] & jnp.uint64(0xFF)).sum(dtype=jnp.uint32))

    def gather_only(c, ln):
        out = _device_extract(c, ln, **ek)
        nw = out["nw"].astype(jnp.int32)
        offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(nw)])
        nv = offs[B]
        pos = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)[:, 0]
        # fake rowmap: identity src (no searchsorted dependency)
        src = jnp.clip(pos, 0, B * W - 1)
        valid = pos < jnp.minimum(nv, S)
        keys_flat = out["keys"].reshape(B * W, 2)
        kc = jnp.where(valid[:, None], keys_flat[src], sentinel)
        return (kc[..., 0] & jnp.uint64(0xFF)).sum(dtype=jnp.uint32)

    def rowmap_bcast(c, ln):
        out = _device_extract(c, ln, **ek)
        nw = out["nw"].astype(jnp.int32)
        offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(nw)])
        nv = offs[B]
        pos = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)[:, 0]
        row = jnp.sum(
            (pos[:, None] >= offs[None, 1:]).astype(jnp.int32), axis=1)
        row = jnp.minimum(row, B - 1)
        w = pos - offs[row]
        valid = pos < jnp.minimum(nv, S)
        src = jnp.clip(row * W + w, 0, B * W - 1)
        keys_flat = out["keys"].reshape(B * W, 2)
        kc = jnp.where(valid[:, None], keys_flat[src], sentinel)
        return (kc[..., 0] & jnp.uint64(0xFF)).sum(dtype=jnp.uint32)

    variants = dict(base=base, rowmap=rowmap_only, gather=gather_only,
                    rowmap_bcast=rowmap_bcast)
    for name, fn in variants.items():
        run = loop(fn)
        out = run(all_codes, lengths); np.asarray(out)
        t0 = time.perf_counter()
        out = run(all_codes, lengths); np.asarray(out)
        dt = time.perf_counter() - t0
        print(f"{name}: {dt / n_batches * 1000:.3f} ms/batch")


if __name__ == "__main__":
    main()
