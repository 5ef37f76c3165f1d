#!/usr/bin/env python
"""Stage ablation of the fused construct loop body (real TPU).

Times fori_loops that run successively larger prefixes of the per-batch
work, all consuming their outputs into a scalar carry (no DCE):

  hash      pallas ntHash + density select
  compact   + two-level sort -> perm_m + gathers (mh, mp)
  keys      + poly window fingerprints + validity
  slot      + batch-slot rank compaction (occ/key layout)
  append    + buffer dynamic_update_slice (the full body, minus counter)

Run: python profiling/micro_profile11.py  [NB=64 batches]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import synth_reads

    from rust_mdbg_tpu.ops.extract import (_chunk_slot_capacity,
                                           _window_keys_poly)
    from rust_mdbg_tpu.ops.pallas_kernels import nthash_select_pallas
    from rust_mdbg_tpu.ops.sort_count import window_slot_capacity
    from rust_mdbg_tpu.ops.extract import DeviceExtractor
    from rust_mdbg_tpu.params import Params

    p = Params(k=21, l=14, density=0.003, min_kmer_abundance=2,
               engine="pallas", batch_reads=128, reads_already_hpc=True)
    NB = int(os.environ.get("NB", "64"))
    B = p.batch_reads
    genome, starts, L = synth_reads(genome_mbp=20, coverage=4)
    n_reads = NB * B
    dev = DeviceExtractor(p)
    M = dev.capacity(L)
    k, l, hb = p.k, p.l, p.hash_bound
    W_slot = window_slot_capacity(p, B, L, M)
    S = B * W_slot
    print(f"B={B} L={L} M={M} W_slot={W_slot} NB={NB}")

    rng = np.random.default_rng(0)
    gdev = jax.device_put(genome)
    st = jax.device_put(starts[:n_reads].astype(np.int32))

    @jax.jit
    def stage(g, st):
        return g[st[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]]

    all_codes = jax.block_until_ready(stage(gdev, st))
    lengths = jax.device_put(np.full((B,), L, dtype=np.int32))

    def body_upto(level):
        def body(i, acc):
            codes = jax.lax.dynamic_slice(all_codes, (i * B, 0), (B, L))
            canon, sel = nthash_select_pallas(codes, l, hb, lengths)
            if level == 0:
                return acc + canon.sum() + sel.sum().astype(jnp.uint64)
            idx = jnp.arange(L, dtype=jnp.int32)
            n_min_raw = sel.sum(axis=1).astype(jnp.int32)
            n_min = jnp.minimum(n_min_raw, M)
            C = _chunk_slot_capacity(hb)
            nch = L // 512
            iot = jax.lax.broadcasted_iota(jnp.int32, (B * nch, 512), 1)
            selc = sel.reshape(B * nch, 512)
            posc = (iot + (jnp.arange(B * nch, dtype=jnp.int32) % nch)
                    [:, None] * 512)
            ck = jnp.where(selc, iot, jnp.int32(512))
            sck, cpos = jax.lax.sort((ck, posc), num_keys=1, dimension=1)
            cval = jnp.where(sck == jnp.int32(512), jnp.int32(L), cpos)
            lvl2 = cval[:, :C].reshape(B, nch * C)
            l2s = jax.lax.sort(lvl2, dimension=1)
            if nch * C < M:
                l2s = jnp.concatenate(
                    [l2s, jnp.full((B, M - nch * C), L, jnp.int32)], axis=1)
            perm_m = jnp.minimum(l2s[:, :M], L - 1)
            miot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
            in_range = miot < n_min[:, None]
            mh = jnp.where(in_range,
                           jnp.take_along_axis(canon, perm_m, axis=1),
                           jnp.uint64(0))
            mp = jnp.where(in_range,
                           jnp.take_along_axis(
                               jnp.broadcast_to(idx[None, :], (B, L)),
                               perm_m, axis=1), jnp.int32(0))
            if level == 1:
                return (acc + mh.sum()
                        + mp.sum(dtype=jnp.int32).astype(jnp.uint64))
            keys = _window_keys_poly(mh, k, M)
            Wn = M - k + 1
            widx = jnp.arange(Wn, dtype=jnp.int32)
            valid_w = ((n_min[:, None] > k)
                       & (widx[None, :] < n_min[:, None] - k + 1))
            keys = jnp.where(valid_w[..., None], keys, ~jnp.uint64(0))
            nw = jnp.where(n_min > k, n_min - k + 1, 0).astype(jnp.int32)
            if level == 2:
                return acc + keys.sum() + nw.sum().astype(jnp.uint64)
            offs = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(nw)])
            nv = offs[B]
            pos = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)[:, 0]
            row = jnp.minimum(
                jnp.sum((pos[:, None] >= offs[None, 1:]).astype(jnp.int32),
                        axis=1), B - 1)
            w = pos - offs[row]
            valid = pos < jnp.minimum(nv, S)
            W = M - k + 1
            src = jnp.clip(row * W + w, 0, B * W - 1)
            kc = jnp.where(valid[:, None], keys.reshape(B * W, 2)[src],
                           ~jnp.uint64(0))
            occ = jnp.where(valid, (row * W + w).astype(jnp.uint32),
                            jnp.uint32(0xFFFFFFFF))
            return acc + kc.sum() + occ.sum().astype(jnp.uint64)

        @jax.jit
        def run():
            return jax.lax.fori_loop(0, NB, body, jnp.uint64(0))

        return run

    names = ["hash+select", "+compact/gather", "+window keys", "+slot rank"]
    for lvl, name in enumerate(names):
        fn = body_upto(lvl)
        jax.block_until_ready(fn())  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        t1 = time.perf_counter()
        jax.block_until_ready(fn())
        t2 = time.perf_counter()
        dt = min(t1 - t0, t2 - t1)
        print(f"{name:18s} {dt:7.3f}s total  {dt/NB*1e3:7.3f} ms/batch")


if __name__ == "__main__":
    main()
