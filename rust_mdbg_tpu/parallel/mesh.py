"""Device mesh helpers.

The reference is a single-node shared-memory program (SURVEY §2: seq_io worker
pool + DashMap).  The TPU-native scale-out replaces that with a 1-D device
mesh used for BOTH data parallelism (read batches sharded over devices) and
table sharding (k-min-mer ownership by key hash over the same axis), with
`all_to_all` routing between the two — collectives ride ICI within a slice,
DCN across hosts via jax.distributed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))
