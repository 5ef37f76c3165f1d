"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The axon sitecustomize force-registers the TPU backend and overrides
JAX_PLATFORMS, so env vars alone are not enough — the jax.config update below
takes precedence.  Real-TPU runs happen via bench.py / the CLI, not tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS fallback above

# persistent compilation cache: repeat test runs skip XLA compiles
_cache = pathlib.Path(__file__).resolve().parent.parent / ".cache" / "jax"
_cache.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

EXAMPLE_READS = "/root/reference/example/reads-0.00.fa.gz"


@pytest.fixture
def example_reads():
    return EXAMPLE_READS
