#!/usr/bin/env python
"""Isolate construct-loop costs: extraction / +keys / +compaction / +append."""
import os, sys, time, functools
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
    genome, starts, L = synth_reads(genome_mbp=20, coverage=52)
    B = 128
    n_reads = len(starts) - (len(starts) % B)
    n_batches = min(n_reads // B, 79)
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

    def compact(out, i):
        nw = out["nw"].astype(jnp.int32)
        offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(nw)])
        nv = offs[B]
        pos = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)[:, 0]
        row = jnp.minimum(
            jnp.sum((pos[:, None] >= offs[None, 1:]).astype(jnp.int32), axis=1),
            B - 1)
        w = pos - offs[row]
        valid = pos < jnp.minimum(nv, S)
        src = jnp.clip(row * W + w, 0, B * W - 1)
        keys_flat = out["keys"].reshape(B * W, 2)
        kc = jnp.where(valid[:, None], keys_flat[src], sentinel)
        occ = jnp.where(valid, ((i * B + row) * W + w).astype(jnp.uint32),
                        jnp.uint32(0xFFFFFFFF))
        return kc, occ, nv

    # variant A: extract + keys + compaction, NO buffer appends
    @jax.jit
    def run_nobuf(codes, lens):
        def body(i, acc):
            c = jax.lax.dynamic_slice(codes, (i * B, 0), (B, L))
            ln = jax.lax.dynamic_slice(lens, (i * B,), (B,))
            out = _device_extract(c, ln, **ek)
            kc, occ, nv = compact(out, i)
            return (acc + (kc[..., 0] & jnp.uint64(0xFF)).sum(dtype=jnp.uint32)
                    + occ.sum(dtype=jnp.uint32)
                    + (out["mh"] & jnp.uint64(0xFF)).sum(dtype=jnp.uint32))
        return jax.lax.fori_loop(0, n_batches, body, jnp.uint32(0))

    # variant B: appends only for keys/occ (no mh/mp append)
    bk = jnp.full((n_reads * W_slot, 2), sentinel, dtype=jnp.uint64)
    bo = jnp.full((n_reads * W_slot,), 0xFFFFFFFF, dtype=jnp.uint32)
    bmh = jnp.zeros((n_reads, M), dtype=jnp.uint64)
    bmp = jnp.zeros((n_reads, M), dtype=jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def run_keysapp(codes, lens, b_keys, b_occ):
        def body(i, carry):
            bk, bo = carry
            c = jax.lax.dynamic_slice(codes, (i * B, 0), (B, L))
            ln = jax.lax.dynamic_slice(lens, (i * B,), (B,))
            out = _device_extract(c, ln, **ek)
            kc, occ, nv = compact(out, i)
            bk = jax.lax.dynamic_update_slice(bk, kc, (jnp.int32(i * B * W_slot), jnp.int32(0)))
            bo = jax.lax.dynamic_update_slice(bo, occ, (jnp.int32(i * B * W_slot),))
            return bk, bo
        return jax.lax.fori_loop(0, n_batches, body, (b_keys, b_occ))

    # variant C: appends only for mh/mp
    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def run_mhapp(codes, lens, b_mh, b_mp):
        def body(i, carry):
            bmh, bmp = carry
            c = jax.lax.dynamic_slice(codes, (i * B, 0), (B, L))
            ln = jax.lax.dynamic_slice(lens, (i * B,), (B,))
            out = _device_extract(c, ln, **ek)
            bmh = jax.lax.dynamic_update_slice(bmh, out["mh"], (jnp.int32(i * B), jnp.int32(0)))
            bmp = jax.lax.dynamic_update_slice(bmp, out["mp"], (jnp.int32(i * B), jnp.int32(0)))
            return bmh, bmp
        return jax.lax.fori_loop(0, n_batches, body, (b_mh, b_mp))

    def t(run, *args, n=2):
        host = [np.asarray(x) for x in args]
        a = [jax.device_put(x) for x in host]
        out = run(*a)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(n):
            a = [jax.device_put(x) for x in host]
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            out = run(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    dt = t(run_nobuf, all_codes, lengths)
    print(f"extract+keys+compact (no append): {dt / n_batches * 1000:.3f} ms/batch "
          f"({n_reads * L / dt / 1e9:.2f} Gbp/s)")
    dt = t(run_keysapp, all_codes, lengths, bk, bo)
    print(f"+ keys/occ append: {dt / n_batches * 1000:.3f} ms/batch "
          f"({n_reads * L / dt / 1e9:.2f} Gbp/s)")
    dt = t(run_mhapp, all_codes, lengths, bmh, bmp)
    print(f"extract + mh/mp append only: {dt / n_batches * 1000:.3f} ms/batch "
          f"({n_reads * L / dt / 1e9:.2f} Gbp/s)")


if __name__ == "__main__":
    main()
