"""Finalize sort cost at bench shapes (6.8M rows, singleton-dominated).

Historical result (kept for the record): a surrogate sort by lo alone with
post-sort gathers of hi/occ measured 762 ms vs 590 ms for the exact
3-operand (lo, hi, occ) sort — two 6.8M-row random gathers cost more than
the third sort operand they save, so the exact sort stays.

Run: python profiling/micro_profile12.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import functools

    import jax.numpy as jnp

    from rust_mdbg_tpu.ops.sort_count import _finalize_compact

    rng = np.random.default_rng(0)
    k, M = 21, 176
    W = M - k + 1
    n_reads = 53248
    W_slot = 128
    N = n_reads * W_slot
    print(f"N={N} rows")
    # singleton-dominated keys: 4.4M uniques over 6.8M rows
    uniq = 4_400_000
    ids = rng.integers(0, uniq, N).astype(np.uint64)
    lo = ids * np.uint64(0x9E3779B97F4A7C15)
    hi = ids * np.uint64(0xC2B2AE3D27D4EB4F)
    b_keys = np.stack([lo, hi], axis=1)
    b_occ = np.sort(rng.choice(n_reads * W, N, replace=False).astype(np.uint32))
    b_mh = rng.integers(0, 1 << 60, (n_reads, M)).astype(np.uint64)
    b_mp = np.sort(rng.integers(0, 24576, (n_reads, M)).astype(np.int32), 1)

    dk = jax.device_put(jnp.asarray(b_keys))
    do = jax.device_put(jnp.asarray(b_occ))
    dh = jax.device_put(jnp.asarray(b_mh))
    dp = jax.device_put(jnp.asarray(b_mp))

    for label in ("finalize",):
        fn = jax.jit(functools.partial(
            _finalize_compact, k=k, M=M, minab=2, node_cap=1 << 23,
            pass_cap=1 << 19, emit_mpos=True, mpos_u16=True))
        out = fn(dk, do, dh, dp)
        np.asarray(out["stats3"])  # compile + run
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(dk, do, dh, dp)
            np.asarray(out["stats3"])  # fetch forces completion
            ts.append(time.perf_counter() - t0)
        print(f"{label}: {min(ts)*1e3:7.1f} ms "
              f"(runs {[round(t*1e3) for t in ts]})  "
              f"stats={np.asarray(out['stats3'])}")


if __name__ == "__main__":
    main()
