"""Demonstrate the dev-environment relay client's H2D staging retention.

The axon PJRT relay (the only route to the TPU in this environment) retains
the host staging buffer of every `jax.device_put` — RSS grows by exactly the
transferred bytes per call, is not released by `Array.delete()`, `gc`, or
`malloc_trim`, and is unrelated to our pipeline (device->host fetches do NOT
grow RSS).  SCALE_DEMO.json therefore reports both the raw max RSS and
`rss_less_relay_gb` (RSS minus total H2D wire bytes), which is the pipeline's
own footprint and the number comparable to the reference's <=10 GB
measurement (/root/reference/README.md:128 — measured on a process whose
input feed does not retain).

Run: python -m rust_mdbg_tpu.experiments.relay_diag
Expected on a leaking relay: ~+100 MB RSS per iteration, fetch loop flat.
On real TPU hosts (PCIe PJRT), both loops stay flat.
"""

from __future__ import annotations

import ctypes
import gc
import sys


def _rss_mb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return -1


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    libc = ctypes.CDLL("libc.so.6")
    n = 100 * 1024 * 1024
    buf = np.ones(n, dtype=np.uint8)
    dev = jax.devices()[0]
    print(f"platform: {dev.platform}")

    jax.block_until_ready(jax.device_put(buf))  # settle allocator/first-use
    r0 = _rss_mb()
    print(f"-- H2D device_put 100 MB x8 (start RSS {r0} MB)")
    for i in range(8):
        d = jax.device_put(buf)
        jax.block_until_ready(d)
        d.delete()
        gc.collect()
        libc.malloc_trim(0)
        print(f"  iter {i}: +{_rss_mb() - r0} MB")

    make = jax.jit(lambda i: jnp.full((n,), i, jnp.uint8))
    jax.block_until_ready(make(0))
    r0 = _rss_mb()
    print(f"-- D2H fetch 100 MB x8 (start RSS {r0} MB)")
    for i in range(8):
        d = make(i)
        h = np.asarray(d)
        d.delete()
        del h
        gc.collect()
        print(f"  iter {i}: +{_rss_mb() - r0} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
