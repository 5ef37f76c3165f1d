"""Process-parallel EC (`--ec-procs`) vs the sequential host driver.

With correction_threshold == 0 (the default) the corrected map never
populates, so forked shard workers + part-file concatenation must reproduce
the sequential driver's output BYTE-IDENTICALLY (models/correct.py
run_error_correction_procs; reference thread-chunks main.rs:855-883).  With
a threshold > 0 the already-corrected skips are per-shard — the documented
deterministic divergence — so there we only assert a valid, complete run.
"""

import numpy as np

from rust_mdbg_tpu.core.pipeline import assemble
from rust_mdbg_tpu.params import Params


def _noisy_corpus(tmp_path, seed=5, n_reads=50):
    rng = np.random.default_rng(seed)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 16000))
    reads_path = tmp_path / "noisy.fa"
    with open(reads_path, "w") as f:
        for i in range(n_reads):
            start = int(rng.integers(0, 16000 - 2500))
            read = list(genome[start : start + 2500])
            for _ in range(25):
                p = int(rng.integers(0, len(read)))
                read[p] = "ACGT"[int(rng.integers(0, 4))]
            f.write(f">r{i}\n{''.join(read)}\n")
    return reads_path


def test_ec_procs_matches_sequential(tmp_path):
    reads_path = _noisy_corpus(tmp_path)
    base = Params(k=4, l=8, density=0.05, min_kmer_abundance=2,
                  error_correct=True, engine="host", n=2)
    pseq = base.replace()
    ppar = base.replace(ec_procs=2)
    pa, pb = str(tmp_path / "seq"), str(tmp_path / "par")
    sa = assemble(str(reads_path), pseq, pa)
    sb = assemble(str(reads_path), ppar, pb)
    assert open(pa + ".postcor.ec_data").read() == \
        open(pb + ".postcor.ec_data").read()
    assert open(pa + ".poa.ec_data").read() == \
        open(pb + ".poa.ec_data").read()
    assert open(pa + ".gfa").read() == open(pb + ".gfa").read()
    assert sa["nb_nodes"] == sb["nb_nodes"] > 0


def test_ec_procs_single_worker_identical(tmp_path):
    """ec_procs=1 is still the forked-worker flow (one shard) and must be
    byte-identical to the sequential driver even with a threshold (the
    corrected map is whole-run when there is only one shard)."""
    import shutil

    from rust_mdbg_tpu.io import ec_data as ecd
    from rust_mdbg_tpu.models.correct import run_error_correction_procs
    from rust_mdbg_tpu.utils.seq import normalize_vec

    reads_path = _noisy_corpus(tmp_path, seed=11)
    base = Params(k=4, l=8, density=0.05, min_kmer_abundance=2,
                  error_correct=True, engine="host", n=2,
                  correction_threshold=2)
    from rust_mdbg_tpu.models.correct import run_error_correction

    pa0, pa, pb = str(tmp_path / "full"), str(tmp_path / "seq"), \
        str(tmp_path / "one")
    assemble(str(reads_path), base.replace(), pa0)
    # rerun just the EC stage two ways over the same .ec_data checkpoint
    # with identical reconstructed inputs: the in-process sequential driver
    # vs one forked shard
    shutil.copy(pa0 + ".ec_data", pa + ".ec_data")
    shutil.copy(pa0 + ".ec_data", pb + ".ec_data")
    records = ecd.load(pb)
    reads_by_id_raw = {
        r.seq_id: {"seq": r.seq_str, "transformed": r.read_transformed,
                   "pos": r.read_minimizers_pos}
        for r in records
    }
    int_to_minimizer = {}
    buckets = {}
    for r in records:
        t = [int(x) for x in r.read_transformed]
        for h, s in zip(t, r.read_minimizers):
            int_to_minimizer[h] = s
        for i in range(len(t) - base.n + 1):
            buckets.setdefault(normalize_vec(t[i : i + base.n]),
                               []).append(r.seq_id)
    run_error_correction(pa, base.replace(), dict(int_to_minimizer),
                         dict(buckets), reads_by_id_raw)
    run_error_correction_procs(pb, base.replace(), int_to_minimizer,
                               buckets, reads_by_id_raw, 1)
    assert open(pa + ".postcor.ec_data").read() == \
        open(pb + ".postcor.ec_data").read()
    assert open(pa + ".poa.ec_data").read() == \
        open(pb + ".poa.ec_data").read()


def test_ec_procs_with_threshold_runs(tmp_path):
    """Threshold > 0: per-shard corrected maps (documented divergence) —
    assert a valid complete run, not byte parity."""
    reads_path = _noisy_corpus(tmp_path, seed=7)
    p = Params(k=4, l=8, density=0.05, min_kmer_abundance=2,
               error_correct=True, engine="host", n=2,
               correction_threshold=2, ec_procs=2)
    prefix = str(tmp_path / "thr")
    stats = assemble(str(reads_path), p, prefix)
    assert stats["nb_nodes"] > 0
    post = open(prefix + ".postcor.ec_data").read()
    assert post and len(post.splitlines()) % 5 == 0
