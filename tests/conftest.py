"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env before jax is imported anywhere.
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

import pytest  # noqa: E402

EXAMPLE_READS = "/root/reference/example/reads-0.00.fa.gz"


@pytest.fixture
def example_reads():
    return EXAMPLE_READS
