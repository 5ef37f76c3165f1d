"""Full multi-device pipeline == single-host pipeline (graph-isomorphic)."""

import numpy as np
import pytest

import jax

from rust_mdbg_tpu.core.pipeline import assemble
from rust_mdbg_tpu.io.sequences import iter_sequences
from rust_mdbg_tpu.params import Params
from rust_mdbg_tpu.parallel.pipeline import assemble_sharded

EXAMPLE = "/root/reference/example/reads-0.00.fa.gz"


def _node_map(prefix):
    """canonical minimizer tuple -> (KC, LN) from .sequences + .gfa."""
    meta = {}
    for line in open(prefix + ".gfa"):
        if line.startswith("S"):
            v = line.rstrip().split("\t")
            meta[int(v[1])] = (int(v[4][5:]), int(v[3][5:]))
    out = {}
    for r in iter_sequences(prefix):
        out[r["minimizers"]] = meta[r["index"]] + (r["shift"],)
    return out


@pytest.mark.parametrize("n_devices", [4])
def test_sharded_assemble_matches_host(n_devices, tmp_path):
    assert len(jax.devices()) >= n_devices
    p = Params(k=7, l=10, density=0.0008, min_kmer_abundance=2,
               engine="device", batch_reads=32, threads=2)
    ph = str(tmp_path / "host")
    ps = str(tmp_path / "shard")
    host_stats = assemble(EXAMPLE, p.replace(engine="host"), ph)
    shard_stats = assemble_sharded(EXAMPLE, p, ps, n_devices=n_devices)
    assert shard_stats["nb_reads"] == host_stats["nb_reads"] == 657
    assert shard_stats["nb_nodes"] == host_stats["nb_nodes"] == 104
    assert shard_stats["nb_edges"] == host_stats["nb_edges"] == 206
    # node-level equality including crossing metadata, keyed by minimizer vec
    assert _node_map(ps) == _node_map(ph)
