"""POA graph aligner, pairwise aligner, and the EC driver."""

import numpy as np
import pytest

from rust_mdbg_tpu.models import pairwise
from rust_mdbg_tpu.models.poa import PoaGraph, consensus_boundary
from rust_mdbg_tpu.params import Params


def score(a, b):
    return 1 if a == b else -1


def test_pairwise_semiglobal_substring():
    x = [5, 6, 7]
    y = [1, 2, 5, 6, 7, 3]
    a = pairwise.Aligner.with_capacity(len(x), len(y), -1, -1, score)
    aln = a.semiglobal(x, y)
    assert aln.score == 3
    assert (aln.ystart, aln.yend) == (2, 5)
    assert aln.operations == ["Match", "Match", "Match"]


def test_pairwise_semiglobal_with_mismatch_and_gap():
    x = [1, 2, 3, 4]
    y = [9, 1, 2, 9, 3, 4, 9]
    a = pairwise.Aligner.with_capacity(len(x), len(y), -1, -1, score)
    aln = a.semiglobal(x, y)
    # match,match,(gap in x over the 9),match,match = 4 - 2 = 2
    assert aln.score == 2
    assert (aln.ystart, aln.yend) == (1, 6)


def _mk_graph(template, spacing=10):
    seq = "A" * (spacing * len(template) + spacing)
    pos = [i * spacing for i in range(len(template))]
    return PoaGraph(template, seq, pos)


def test_poa_identical_query_bumps_weights():
    t = [10, 20, 30, 40]
    g = _mk_graph(t)
    aln = g.semiglobal(t)
    assert aln.score == 4
    g.add_alignment(aln, t, "A" * 50, [0, 10, 20, 30])
    # all template edges now weight 2, no new nodes
    assert len(g.weights) == 4
    assert all(g.edges[(i, i + 1)][0] == 2 for i in range(3))
    cns, es = g.consensus(0)
    assert cns == t
    assert len(es) == 3


def test_poa_consensus_prefers_majority():
    t = [10, 20, 30, 40, 50]
    g = _mk_graph(t)
    variant = [10, 20, 99, 40, 50]
    seqv = "C" * 60
    posv = [0, 10, 20, 30, 40]
    for q in (t, t, variant):
        aln = g.semiglobal(q)
        g.add_alignment(aln, q, seqv, posv)
    cns, _ = g.consensus(0)
    assert cns == t  # majority path wins over the 99 variant


def test_consensus_boundary_trims_to_template():
    cns = [1, 2, 3, 4, 5, 6, 7]
    es = [f"e{i}" for i in range(6)]
    orig = [3, 4, 5]
    c2, e2 = consensus_boundary(cns, es, orig)
    assert c2 == [3, 4, 5]
    assert e2 == ["e2", "e3"]


def test_ec_end_to_end(tmp_path):
    """Pipeline with --error-correct on noisy synthetic reads."""
    from rust_mdbg_tpu.core.pipeline import assemble

    rng = np.random.default_rng(5)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    reads_path = tmp_path / "noisy.fa"
    with open(reads_path, "w") as f:
        for i in range(60):
            start = int(rng.integers(0, 20000 - 3000))
            read = list(genome[start : start + 3000])
            # ~1% substitution errors
            for _ in range(30):
                p = int(rng.integers(0, len(read)))
                read[p] = "ACGT"[int(rng.integers(0, 4))]
            f.write(f">r{i}\n{''.join(read)}\n")
    p = Params(k=4, l=8, density=0.05, min_kmer_abundance=2,
               error_correct=True, engine="host", n=2)
    prefix = str(tmp_path / "ec")
    stats = assemble(str(reads_path), p, prefix)
    assert stats["nb_reads"] == 60
    assert (tmp_path / "ec.postcor.ec_data").exists()
    assert (tmp_path / "ec.poa.ec_data").exists()
    assert stats["nb_nodes"] > 0
    # corrected reads should yield a cleaner graph than raw minabund-2 would:
    # at least assert the gfa exists and has edges
    gfa = open(prefix + ".gfa").read()
    assert gfa.count("\nL\t") > 0


def test_batched_device_scores_match_poa_linear():
    """ops/align batched scorer == PoaGraph.semiglobal on a linear template."""
    from rust_mdbg_tpu.ops.align import semiglobal_scores_batch

    rng = np.random.default_rng(8)
    template = [int(x) for x in rng.integers(1, 50, 40)]
    g = _mk_graph(template)
    queries = []
    for _ in range(6):
        q = list(template[5:30])
        for _ in range(3):
            q[int(rng.integers(0, len(q)))] = int(rng.integers(1, 50))
        queries.append(q)
    queries.append(template[::-1][:20])
    queries.append([int(x) for x in rng.integers(100, 200, 15)])
    batch = semiglobal_scores_batch(template, queries)
    for q, got in zip(queries, batch):
        expect = g.semiglobal(q).score
        assert int(got) == expect, (q, int(got), expect)


def test_poa_vec_matches_loop_fuzz():
    """_semiglobal_vec must reproduce _semiglobal_loop exactly (score,
    ystart, operations) on graphs grown through many weaves."""
    rng = np.random.default_rng(17)
    for trial in range(8):
        tlen = int(rng.integers(5, 40))
        template = [int(x) for x in rng.integers(1, 30, tlen)]
        g = _mk_graph(template)
        for _q in range(6):
            if rng.random() < 0.3:
                q = [int(x) for x in rng.integers(1, 30, int(rng.integers(3, 40)))]
            else:
                a, b = sorted(rng.integers(0, tlen, 2))
                q = list(template[a : b + 1])
                for _ in range(int(rng.integers(0, 4))):
                    q[int(rng.integers(0, len(q)))] = int(rng.integers(1, 30))
                if rng.random() < 0.3:
                    q.insert(int(rng.integers(0, len(q))),
                             int(rng.integers(1, 30)))
            va = g._semiglobal_vec(q)
            lo = g._semiglobal_loop(q)
            assert va.score == lo.score, (trial, q)
            assert va.ystart == lo.ystart, (trial, q)
            assert va.operations == lo.operations, (trial, q)
            spacing = 10
            seq = "C" * (spacing * len(q) + spacing)
            pos = [i * spacing for i in range(len(q))]
            g.add_alignment(va, q, seq, pos)


def test_pairwise_iy_closure_matches_loop_oracle():
    """The affine Iy prefix-max closure == the sequential per-cell loop."""
    rng = np.random.default_rng(23)

    def oracle(x, y, o, e):
        m, n = len(x), len(y)
        NEG = pairwise.MIN_SCORE
        M = np.full((m + 1, n + 1), NEG, dtype=np.int64)
        Ix = np.full((m + 1, n + 1), NEG, dtype=np.int64)
        Iy = np.full((m + 1, n + 1), NEG, dtype=np.int64)
        M[0, :] = 0
        for i in range(1, m + 1):
            Ix[i, 0] = o + e * i
        for i in range(1, m + 1):
            xi = x[i - 1]
            prev_best = np.maximum(np.maximum(M[i - 1], Ix[i - 1]), Iy[i - 1])
            Ix[i, :] = np.maximum(Ix[i - 1] + e, prev_best + o + e)
            sub = np.fromiter((1 if xi == yj else -1 for yj in y),
                              dtype=np.int64, count=n)
            M[i, 1:] = prev_best[:-1] + sub
            rbc = np.maximum(M[i], Ix[i])
            iy = NEG
            for j in range(1, n + 1):
                iy = max(iy + e, rbc[j - 1] + o + e)
                Iy[i, j] = iy
        final = np.maximum(np.maximum(M[m], Ix[m]), Iy[m])
        return int(final.max()), int(final.argmax())

    for o, e in ((-1, -1), (0, -1), (-3, -1), (-2, -2)):
        for _ in range(6):
            x = [int(v) for v in rng.integers(1, 8, int(rng.integers(2, 25)))]
            y = [int(v) for v in rng.integers(1, 8, int(rng.integers(2, 30)))]
            a = pairwise.Aligner(o, e, score, match_scores=(1, -1))
            aln = a.semiglobal(x, y)
            s, yend = oracle(x, y, o, e)
            assert aln.score == s, (x, y, o, e)
            assert aln.yend == yend, (x, y, o, e)


def test_scores_np_equals_jitted_path():
    """The numpy fast path and the jitted scan are the same recurrence."""
    import numpy as np

    from rust_mdbg_tpu.ops import align

    rng = np.random.default_rng(4)
    template = [int(x) for x in rng.integers(0, 9, 60)]
    queries = [[int(x) for x in rng.integers(0, 9, int(rng.integers(3, 70)))]
               for _ in range(17)]
    fast = align.semiglobal_scores_batch(template, queries)
    cut = align._NP_CUTOFF
    try:
        align._NP_CUTOFF = 0  # force the jitted path
        slow = align.semiglobal_scores_batch(template, queries)
    finally:
        align._NP_CUTOFF = cut
    assert np.array_equal(fast, slow)
