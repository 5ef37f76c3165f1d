#!/usr/bin/env python
"""Find the slow op in the finalize key block: gather -> canon -> fp."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def bench(fn, *args, n=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rust_mdbg_tpu.ops.kminmer import (canonicalize_jax,
                                           fingerprint128_jax, le_rev_jax)

    rng = np.random.default_rng(0)
    read_cap, M, k = 42368, 256, 21
    pass_cap = 262144
    W = M - k + 1
    b_mh = jnp.asarray(rng.integers(0, 2**63, (read_cap, M), dtype=np.int64)
                       .astype(np.uint64))
    occs = jnp.asarray(rng.integers(0, read_cap * W, pass_cap,
                                    dtype=np.int64).astype(np.uint32))

    def gather(b_mh, occs):
        rows = (occs // jnp.uint32(W)).astype(jnp.int32)
        wins = (occs % jnp.uint32(W)).astype(jnp.int32)
        gidx = (rows * M + wins)[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
        return b_mh.reshape(-1)[gidx]

    def keys(cv):
        suf = cv[:, 1:]
        pre = cv[:, :-1]
        gk = jnp.concatenate([fingerprint128_jax(suf), fingerprint128_jax(pre),
                              fingerprint128_jax(suf[:, ::-1]),
                              fingerprint128_jax(pre[:, ::-1])], axis=-1)
        gflag = (le_rev_jax(suf).astype(jnp.uint8)
                 | (le_rev_jax(pre).astype(jnp.uint8) << 1))
        return gk, gflag

    f_g = jax.jit(gather)
    f_gc = jax.jit(lambda b, o: canonicalize_jax(gather(b, o)))
    f_gck = jax.jit(lambda b, o: keys(canonicalize_jax(gather(b, o))[0]))
    f_gck_b = jax.jit(lambda b, o: keys(jax.lax.optimization_barrier(
        canonicalize_jax(gather(b, o))[0])))
    print(f"gather:                  {bench(f_g, b_mh, occs)*1000:.1f} ms")
    print(f"gather+canon:            {bench(f_gc, b_mh, occs)*1000:.1f} ms")
    print(f"gather+canon+keys:       {bench(f_gck, b_mh, occs)*1000:.1f} ms")
    print(f"gather+canon+keys(bar):  {bench(f_gck_b, b_mh, occs)*1000:.1f} ms")

    vec = np.asarray(f_gc(b_mh, occs)[0])
    f_k = jax.jit(keys)
    vdev = jnp.asarray(vec)
    print(f"keys on concrete:        {bench(f_k, vdev)*1000:.1f} ms")


if __name__ == "__main__":
    main()
