"""Evaluation + experiments tooling: N50, recruitment eval, kmer compare,
pangenome apps, ec identity."""

import numpy as np
import pytest

from rust_mdbg_tpu.experiments.harness import assembly_stats, make_table
from rust_mdbg_tpu.experiments.pangenome import (
    components, gene_coverage, scan,
)
from rust_mdbg_tpu.eval.evaluate_ec import blast_identity
from rust_mdbg_tpu.eval.evaluate_poa import evaluate as eval_poa, overlap_len


def test_assembly_stats(tmp_path):
    fa = tmp_path / "a.fa"
    fa.write_text(">a\n" + "A" * 100 + "\n>b\n" + "C" * 300 + "\n>c\n"
                  + "G" * 50 + "\n")
    s = assembly_stats(str(fa))
    assert s["n_contigs"] == 3
    assert s["assembly_size"] == 450
    assert s["largest"] == 300
    assert s["n50"] == 300


def test_overlap_len():
    assert overlap_len(0, 100, 50, 150) == 50
    assert overlap_len(50, 150, 0, 100) == 50
    assert overlap_len(0, 10, 20, 30) == 0
    assert overlap_len(0, 100, 10, 20) == 10


def test_evaluate_poa(tmp_path):
    p = tmp_path / "x.poa.ec_data"
    # template SYN_0 spans 0-10000; r1 overlaps (TP), r2 doesn't (FP);
    # r3 overlaps but not recruited (FN)
    p.write_text(
        "SYN_0_0_10000_x\tSYN_1_5000_15000_x\tSYN_2_50000_60000_x\n"
        "SYN_3_4000_14000_x\n"
    )
    # note: SYN_3 overlaps SYN_0 -> from SYN_0's perspective it's a FN
    r = eval_poa(str(p))
    assert r["tp"] == 1 and r["fp"] == 1
    assert r["fn"] >= 1


def test_blast_identity_perfect_and_noisy():
    ref = list(range(100))
    assert blast_identity(ref, ref[10:60]) == 100.0
    noisy = list(ref[10:60])
    noisy[5] = 999
    noisy[25] = 998
    ident = blast_identity(ref, noisy)
    assert 90.0 < ident < 100.0
    # reversed read: rev alignment should recover identity
    assert blast_identity(ref, ref[10:60][::-1]) == 100.0


def _write_ec(path_prefix, records):
    from rust_mdbg_tpu.io.ec_data import EcWriter

    w = EcWriter(str(path_prefix))
    for seq_id, transformed in records:
        w.record(seq_id, "*", transformed, ["m"] * len(transformed),
                 list(range(len(transformed))))
    w.close()


def test_evaluate_ec_with_poa(tmp_path):
    """Full evaluate_ec flow: corrected comparison + per-template POA
    TP/FP/FN with Jaccard/Mash distances + alignment strings
    (utils/evaluate_ec.py:174-284)."""
    from rust_mdbg_tpu.eval.evaluate_ec import evaluate, report

    ref = list(range(1000, 1100))
    t0 = ref[10:60]                      # template == SYN_0, perfect slice
    noisy = list(t0)
    noisy[7], noisy[31] = 7777, 8888     # 2 substitutions
    r1 = ref[15:65]                      # overlapping read (TP if recruited)
    r2 = list(range(5000, 5050))         # disjoint minimizers (FP)
    _write_ec(tmp_path / "ref", [("genome", ref)])
    _write_ec(tmp_path / "reads", [
        ("SYN_0_0_10000_x", noisy),
        ("SYN_1_5000_15000_x", r1),
        ("SYN_2_50000_60000_x", r2),
    ])
    _write_ec(tmp_path / "cor", [
        ("SYN_0_0_10000_x", t0),          # corrected back to perfect
        ("SYN_1_5000_15000_x", r1),
        ("SYN_2_50000_60000_x", r2),
    ])
    poa = tmp_path / "poa.ec_data"
    # SYN_0 recruited SYN_1 (true overlap) and SYN_2 (no overlap -> FP)
    poa.write_text(
        "SYN_0_0_10000_x\tSYN_1_5000_15000_x\tSYN_2_50000_60000_x\n")

    res = evaluate(str(tmp_path / "ref.ec_data"),
                   str(tmp_path / "reads.ec_data"),
                   str(tmp_path / "cor.ec_data"), str(poa))
    assert res["nb_better"] == 1 and res["nb_worse"] == 0
    assert res["per_read_corrected"]["SYN_0_0_10000_x"] == 100.0
    assert res["per_read"]["SYN_0_0_10000_x"] < 100.0
    g = res["poa"]["SYN_0_0_10000_x"]
    assert g["tp"]["n"] == 1 and g["fp"]["n"] == 1 and g["fn"]["n"] == 0
    # TP read truly shares minimizers -> small Jaccard distance; FP shares
    # none -> distance 1.0 and Mash distance 1.0
    assert g["tp"]["jac"] < 0.7 < g["fp"]["jac"] == 1.0
    assert g["fp"]["mash"] == 1.0
    assert g["tp"]["mash"] < 1.0
    # alignment strings use the reference's M/X/-/i alphabet
    assert set(res["aln"]["SYN_0_0_10000_x"]) <= set("MX-i")
    assert res["aln"]["SYN_0_0_10000_x"].count("X") == 2
    assert res["aln_corrected"]["SYN_0_0_10000_x"] == "M" * 50

    import io

    buf = io.StringIO()
    report(res, file=buf)
    text = buf.getvalue()
    assert "POA retrieval TP: 1" in text
    assert "1 reads improved" in text


def test_components(tmp_path):
    g = tmp_path / "g.gfa"
    g.write_text(
        "H\tVN:Z:1.0\nS\ta\t*\nS\tb\t*\nS\tc\t*\nS\td\t*\n"
        "L\ta\t+\tb\t+\t0M\nL\tc\t+\td\t+\t0M\nS\te\t*\n"
    )
    comps = components(str(g))
    sizes = sorted(len(c) for c in comps)
    assert sizes == [1, 2, 2]


def test_scan_and_gene_coverage(tmp_path):
    targets = tmp_path / "t.txt"
    targets.write_text("gene1 1 2 3 4 5 6\n")  # k=4 -> 3 kminmers
    corpus = tmp_path / "c.txt"
    corpus.write_text(
        "g1 9 1 2 3 4 8\n"      # contains kminmer (1,2,3,4)
        "g2 6 5 4 3 7\n"        # contains reversed (3,4,5,6)
        "g3 9 9 9 9 9\n"
    )
    hits = scan(str(targets), str(corpus), k=4)
    assert {h[0] for h in hits} == {"g1", "g2"}
    cov = gene_coverage(str(targets), hits, k=4)
    n, pct = cov["gene1"]
    assert n == 3
    assert pct == pytest.approx(100.0 * 2 / 3)


def test_make_table(tmp_path):
    import json

    (tmp_path / "a.result.json").write_text(json.dumps(
        dict(prefix="a", k=1, l=2, d=0.1, n50=5)))
    csv = make_table(str(tmp_path))
    assert csv.splitlines()[0].startswith("prefix,k,l,d")
    assert ",5," in csv.splitlines()[1] + ","
