"""Medium-scale end-to-end: 2 Mbp genome, 30x 18kb reads, 0.05% errors
(HiFi-residual error model: substitutions that HPC cannot absorb are ~this
rare in real HiFi data) -> full pipeline -> near-single-contig assembly."""

import numpy as np
import pytest

from rust_mdbg_tpu.core.pipeline import assemble
from rust_mdbg_tpu.experiments.harness import assembly_stats
from rust_mdbg_tpu.params import Params
from rust_mdbg_tpu.tools.magic_simplify import magic_simplify


@pytest.mark.slow
def test_medium_genome_assembles_contiguously(tmp_path):
    rng = np.random.default_rng(11)
    G = 1_000_000
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, G)].tobytes().decode()
    cov, rl = 30, 15000
    reads_path = tmp_path / "reads.fa"
    with open(reads_path, "w") as f:
        for i in range(G * cov // rl):
            s = int(rng.integers(0, G - rl))
            read = list(genome[s : s + rl])
            for _ in range(int(rl * 0.0005)):
                p = int(rng.integers(0, rl))
                read[p] = "ACGT"[int(rng.integers(0, 4))]
            f.write(f">r{i}\n{''.join(read)}\n")

    p = Params(k=12, l=12, density=0.003, min_kmer_abundance=2, engine="host")
    prefix = str(tmp_path / "med")
    stats = assemble(str(reads_path), p, prefix)
    assert stats["nb_nodes"] > 3000
    fa = magic_simplify(prefix)
    s = assembly_stats(fa)
    # a random (repeat-free) genome should assemble nearly end-to-end
    # (seeds 7/11/12/42 give N50 ~= 1.0x G, seed 13 gives 0.81x; the round-1
    # seed-dependent split below 0.8x no longer reproduces)
    assert s["n_contigs"] <= 8
    assert s["n50"] > 0.8 * G
    assert 0.95 * G < s["assembly_size"] < 1.1 * G
