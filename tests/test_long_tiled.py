"""Device-tiled Mbp-scale minimizer extraction (ops/extract.py
extract_minimizers_tiled) against the host oracle, plus the long-sequence
end-to-end path (--reference-style genome input, main.rs:342-348 semantics:
long records flow through the same extraction loop as reads)."""

import numpy as np
import pytest

from rust_mdbg_tpu.ops.extract import (DeviceExtractor,
                                       extract_minimizers_tiled)
from rust_mdbg_tpu.ops.minimizers import extract_density_np
from rust_mdbg_tpu.params import Params


def _codes(n, seed):
    rng = np.random.default_rng(seed)
    c = rng.integers(0, 4, n).astype(np.uint8)
    # inject homopolymer runs so HPC compression is exercised
    idx = rng.integers(0, n - 2, n // 40)
    c[idx + 1] = c[idx]
    return c


@pytest.mark.parametrize("already_hpc", [False, True])
def test_tiled_matches_oracle(already_hpc):
    p = Params(k=21, l=14, density=0.003, engine="device",
               reads_already_hpc=already_hpc)
    dev = DeviceExtractor(p)
    codes = _codes(300_000, 1)
    pos_h, h_h = extract_density_np(codes, p.l, p.hash_bound,
                                    already_hpc=already_hpc)
    # tile of 2^16 => ~5 tiles incl. a ragged tail; halo crossings exercised
    pos_d, h_d = extract_minimizers_tiled(codes, p, dev, tile=1 << 16)
    np.testing.assert_array_equal(pos_d, pos_h)
    np.testing.assert_array_equal(h_d, h_h)


def test_tiled_short_input():
    p = Params(k=7, l=10, density=0.01, engine="device")
    dev = DeviceExtractor(p)
    codes = _codes(5_000, 2)  # far below one tile
    pos_h, h_h = extract_density_np(codes, p.l, p.hash_bound)
    pos_d, h_d = extract_minimizers_tiled(codes, p, dev, tile=1 << 16)
    np.testing.assert_array_equal(pos_d, pos_h)
    np.testing.assert_array_equal(h_d, h_h)


def test_long_sequence_assembly_device_matches_host(tmp_path):
    """A genome-scale record (>= 1 Mbp triggers the tiled path) assembled
    with --reference semantics: device engine == host engine, byte-for-byte."""
    from rust_mdbg_tpu.core.pipeline import assemble
    from rust_mdbg_tpu.utils.seq import CODE_BASE

    rng = np.random.default_rng(7)
    contigs = [rng.integers(0, 4, 1_300_000).astype(np.uint8),
               rng.integers(0, 4, 200_000).astype(np.uint8)]
    fa = tmp_path / "genome.fa"
    with open(fa, "w") as f:
        for i, c in enumerate(contigs):
            f.write(f">ctg{i}\n" + CODE_BASE[c].tobytes().decode() + "\n")

    p = Params(k=10, l=12, density=0.002, min_kmer_abundance=1,
               reference=True, no_basespace=True)
    pa = str(tmp_path / "host")
    pb = str(tmp_path / "dev")
    sa = assemble(str(fa), p.replace(engine="host"), pa)
    sb = assemble(str(fa), p.replace(engine="device"), pb)
    assert sa["nb_nodes"] > 50
    assert sb["nb_nodes"] == sa["nb_nodes"]
    assert open(pa + ".gfa").read() == open(pb + ".gfa").read()
