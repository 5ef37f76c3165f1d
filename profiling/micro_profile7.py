#!/usr/bin/env python
"""Cost of fingerprint128_jax / le_rev_jax on TPU at finalize shapes."""
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

    from rust_mdbg_tpu.ops.kminmer import fingerprint128_jax, le_rev_jax

    rng = np.random.default_rng(0)
    n, k = 262144, 21
    v = jnp.asarray(rng.integers(0, 2**63, (n, k), dtype=np.int64)
                    .astype(np.uint64))

    f_fp = jax.jit(fingerprint128_jax)
    f_fprev = jax.jit(lambda x: fingerprint128_jax(x[:, ::-1]))
    f_le = jax.jit(le_rev_jax)

    def allkeys(cv):
        suf = cv[:, 1:]
        pre = cv[:, :-1]
        gk = jnp.concatenate([fingerprint128_jax(suf), fingerprint128_jax(pre),
                              fingerprint128_jax(suf[:, ::-1]),
                              fingerprint128_jax(pre[:, ::-1])], axis=-1)
        gflag = (le_rev_jax(suf).astype(jnp.uint8)
                 | (le_rev_jax(pre).astype(jnp.uint8) << 1))
        return gk, gflag
    f_all = jax.jit(allkeys)

    print(f"fp128 [{n},{k}]:      {bench(f_fp, v)*1000:.1f} ms")
    print(f"fp128 reversed:      {bench(f_fprev, v)*1000:.1f} ms")
    print(f"le_rev:              {bench(f_le, v)*1000:.1f} ms")
    print(f"all keys (4fp+2le):  {bench(f_all, v)*1000:.1f} ms")

    # variant: single-lane mul-free? try u32 pair decomposition Horner
    def fp_lane(vecs, A, OFF):
        h = jnp.full(vecs.shape[:-1], OFF, dtype=jnp.uint64)
        for j in range(vecs.shape[-1]):
            h = h * A + vecs[..., j]
        return h
    f_lane = jax.jit(lambda x: fp_lane(x, np.uint64(0x100000001B3),
                                       np.uint64(0xCBF29CE484222325)))
    print(f"one lane:            {bench(f_lane, v)*1000:.1f} ms")


if __name__ == "__main__":
    main()
