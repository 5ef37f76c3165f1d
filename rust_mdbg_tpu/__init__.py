"""rust_mdbg_tpu — a TPU-native minimizer-space de Bruijn graph (mdBG) assembler.

A brand-new framework with the capabilities of ekimb/rust-mdbg (reference mounted at
/root/reference), re-designed TPU-first:

- The per-base hot loops (ntHash rolling hash, density minimizer selection, k-min-mer
  windowing, canonicalization) run on device as vectorized JAX/XLA ops and Pallas
  kernels over packed base-code tensors (see `rust_mdbg_tpu.ops`).
- The global k-min-mer node table (the reference's concurrent DashMap,
  /root/reference/src/main.rs:595) is replaced by deterministic sort/segment-reduce
  counting plus a native C++ host table, and by hash-sharded ownership with
  `all_to_all` exchange on a multi-chip mesh (see `rust_mdbg_tpu.parallel`).
- Everything around the compute path (LZ4F codec, FASTX parsing, GFA graph ops,
  gfatools-equivalent simplification) is implemented natively (C++ + Python drivers),
  keeping the reference's on-disk contracts (.gfa / .sequences / .ec_data) intact.

64-bit integer semantics are required for ntHash parity, so x64 mode is enabled at
import time, before any tracing happens.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: compiles go through a remote helper in
# this environment (~1-4 min per shape), so cache them across processes.
# Override the location with MDBG_TPU_CACHE; set it empty to disable.
_cache = _os.environ.get(
    "MDBG_TPU_CACHE",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..",
                  ".cache", "jax"),
)
if _cache:
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .params import Params, autodetect_k_l_d  # noqa: E402,F401

__version__ = "0.1.0"
