#!/usr/bin/env python
"""Micro-profile the construct loop stages on device."""
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
    jax.block_until_ready(all_codes)

    from rust_mdbg_tpu.ops.pallas_kernels import nthash_select_pallas
    from rust_mdbg_tpu.ops.kminmer import canonicalize_jax, fingerprint128_jax

    M = 256
    k = p.k
    W = M - k + 1
    hb = p.hash_bound

    def loop(fn):
        @jax.jit
        def run(codes, lens):
            def body(i, acc):
                c = jax.lax.dynamic_slice(codes, (i * B, 0), (B, L))
                ln = jax.lax.dynamic_slice(lens, (i * B,), (B,))
                out = fn(c, ln)
                return acc + out
            return jax.lax.fori_loop(0, n_batches, body, jnp.uint32(0))
        return run

    def stage_kernel(c, ln):
        canon, sel = nthash_select_pallas(c, p.l, hb, ln)
        return (canon & jnp.uint64(0xFF)).sum(dtype=jnp.uint32) + sel.sum(dtype=jnp.uint32)

    def compact(c, ln):
        canon, sel = nthash_select_pallas(c, p.l, hb, ln)
        idx = jnp.arange(L, dtype=jnp.int32)
        n_min_raw = sel.sum(axis=1).astype(jnp.int32)
        n_min = jnp.minimum(n_min_raw, M)
        iot = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        skey = jnp.where(sel, iot, jnp.int32(L))
        _, perm = jax.lax.sort((skey, iot), num_keys=1, dimension=1)
        perm_m = perm[:, :M]
        miot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
        in_range = miot < n_min[:, None]
        mh = jnp.where(in_range, jnp.take_along_axis(canon, perm_m, axis=1), jnp.uint64(0))
        mp = jnp.where(in_range, jnp.take_along_axis(idx[None, :].repeat(B, 0), perm_m, axis=1), jnp.int32(0))
        return (mh & jnp.uint64(0xFF)).sum(dtype=jnp.uint32) + mp.sum(dtype=jnp.uint32)

    def compact_searchsorted(c, ln):
        canon, sel = nthash_select_pallas(c, p.l, hb, ln)
        r = jnp.cumsum(sel.astype(jnp.int32), axis=1)
        n_min = jnp.minimum(r[:, -1], M)
        targets = jnp.arange(1, M + 1, dtype=jnp.int32)
        pos = jax.vmap(lambda row: jnp.searchsorted(row, targets))(r)
        pos = jnp.minimum(pos, L - 1).astype(jnp.int32)
        miot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
        in_range = miot < n_min[:, None]
        mh = jnp.where(in_range, jnp.take_along_axis(canon, pos, axis=1), jnp.uint64(0))
        return (mh & jnp.uint64(0xFF)).sum(dtype=jnp.uint32) + pos.sum(dtype=jnp.uint32).astype(jnp.uint32)

    def windows_from(mh, mp, n_min):
        vecs = jnp.stack([mh[:, j : j + W] for j in range(k)], axis=-1)
        wpos = jnp.stack([mp[:, j : j + W] for j in range(k)], axis=-1)
        widx = jnp.arange(W, dtype=jnp.int32)
        valid_w = (n_min[:, None] > k) & (widx[None, :] < n_min[:, None] - k + 1)
        canon_vecs, reversed_ = canonicalize_jax(vecs)
        fp = fingerprint128_jax(canon_vecs)
        return fp, canon_vecs, valid_w

    def full(c, ln):
        canon, sel = nthash_select_pallas(c, p.l, hb, ln)
        idx = jnp.arange(L, dtype=jnp.int32)
        n_min_raw = sel.sum(axis=1).astype(jnp.int32)
        n_min = jnp.minimum(n_min_raw, M)
        iot = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        skey = jnp.where(sel, iot, jnp.int32(L))
        _, perm = jax.lax.sort((skey, iot), num_keys=1, dimension=1)
        perm_m = perm[:, :M]
        miot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
        in_range = miot < n_min[:, None]
        mh = jnp.where(in_range, jnp.take_along_axis(canon, perm_m, axis=1), jnp.uint64(0))
        mp = jnp.where(in_range, jnp.take_along_axis(idx[None, :].repeat(B, 0), perm_m, axis=1), jnp.int32(0))
        fp, cv, vw = windows_from(mh, mp, n_min)
        return (fp & jnp.uint64(0xFF)).sum(dtype=jnp.uint32) + (cv & jnp.uint64(0xFF)).sum(dtype=jnp.uint32) + vw.sum(dtype=jnp.uint32)

    variants = dict(kernel=stage_kernel, compact=compact,
                    compact_ss=compact_searchsorted, full=full)
    res = {}
    for name, fn in variants.items():
        run = loop(fn)
        out = run(all_codes, lengths); np.asarray(out)
        t0 = time.perf_counter()
        out = run(all_codes, lengths); np.asarray(out)
        dt = time.perf_counter() - t0
        res[name] = dt / n_batches * 1000
        print(f"{name}: {res[name]:.3f} ms/batch  ({n_reads*L/dt/1e9*64/n_batches:.2f} Gbp/s)")

if __name__ == "__main__":
    main()
