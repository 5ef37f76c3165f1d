"""Device POA DP == host PoaGraph.semiglobal, bit for bit.

Graphs are grown realistically (random queries woven via add_alignment), so
the device DP sees multi-predecessor nodes, branches, and terminals beyond
the template chain; alignments must match the host row-sweep exactly
(scores, ystart, operation lists — same tie-breaking).
"""

import numpy as np

from rust_mdbg_tpu.models.poa import PoaGraph
from rust_mdbg_tpu.ops.poa_device import poa_semiglobal_device


def _mut(rng, seq, alphabet, p_sub=0.15, p_ind=0.08):
    out = []
    for x in seq:
        r = rng.random()
        if r < p_sub:
            out.append(int(alphabet[rng.integers(len(alphabet))]))
        elif r < p_sub + p_ind / 2:
            continue
        elif r < p_sub + p_ind:
            out.append(int(x))
            out.append(int(alphabet[rng.integers(len(alphabet))]))
        else:
            out.append(int(x))
    return out or [int(alphabet[0])]


def _grow_graph(rng, alphabet, tlen, n_weave):
    template = [int(alphabet[rng.integers(len(alphabet))])
                for _ in range(tlen)]
    seq = "A" * (4 * tlen + 8)
    pos = list(range(0, 4 * tlen, 4))[:tlen]
    g = PoaGraph(template, seq, pos)
    for _ in range(n_weave):
        q = _mut(rng, template, alphabet)
        qpos = list(range(0, 4 * len(q), 4))
        aln = g.semiglobal(q)
        g.add_alignment(aln, q, "C" * (4 * len(q) + 8), qpos)
    return g, template


def test_device_poa_matches_host_fuzz():
    rng = np.random.default_rng(3)
    alphabet = rng.integers(1, 1 << 60, 40).astype(np.uint64)
    graphs, queries, want = [], [], []
    for trial in range(24):
        tlen = int(rng.integers(4, 60))
        g, template = _grow_graph(rng, alphabet, tlen,
                                  n_weave=int(rng.integers(0, 6)))
        q = _mut(rng, template, alphabet)
        graphs.append(g)
        queries.append(q)
        want.append(g.semiglobal(q))
    got = poa_semiglobal_device(graphs, queries)
    for w, d in zip(want, got):
        assert d.score == w.score
        assert d.ystart == w.ystart
        assert d.operations == w.operations


def test_device_poa_linear_template():
    rng = np.random.default_rng(9)
    alphabet = rng.integers(1, 1 << 60, 8).astype(np.uint64)
    template = [int(alphabet[i % 8]) for i in range(12)]
    g = PoaGraph(template, "A" * 64, list(range(0, 48, 4)))
    q = template[2:9]
    got = poa_semiglobal_device([g], [q])[0]
    want = g.semiglobal(q)
    assert (got.score, got.ystart, got.operations) == \
        (want.score, want.ystart, want.operations)


def test_ec_lockstep_matches_sequential(tmp_path):
    """Full --error-correct pipeline: the device lockstep driver's
    .postcor.ec_data must be byte-identical to the sequential host driver
    with exact double alignment (with correction_threshold 0 the
    corrected-map skip — the one documented divergence — never engages)."""
    from rust_mdbg_tpu.core.pipeline import assemble
    from rust_mdbg_tpu.params import Params

    rng = np.random.default_rng(5)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 16000))
    reads_path = tmp_path / "noisy.fa"
    with open(reads_path, "w") as f:
        for i in range(50):
            start = int(rng.integers(0, 16000 - 2500))
            read = list(genome[start : start + 2500])
            for _ in range(25):
                p = int(rng.integers(0, len(read)))
                read[p] = "ACGT"[int(rng.integers(0, 4))]
            f.write(f">r{i}\n{''.join(read)}\n")
    base = Params(k=4, l=8, density=0.05, min_kmer_abundance=2,
                  error_correct=True, engine="host", n=2)
    ph = base.replace()
    object.__setattr__(ph, "ec_fast_triage", False)  # exact double align
    pd = base.replace(ec_device_poa=True, ec_chunk=8)
    pa, pb = str(tmp_path / "seq"), str(tmp_path / "dev")
    sa = assemble(str(reads_path), ph, pa)
    sb = assemble(str(reads_path), pd, pb)
    post_a = open(pa + ".postcor.ec_data").read()
    post_b = open(pb + ".postcor.ec_data").read()
    assert post_a == post_b
    assert open(pa + ".gfa").read() == open(pb + ".gfa").read()
    assert sa["nb_nodes"] == sb["nb_nodes"] > 0
