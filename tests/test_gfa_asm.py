"""Graph simplification engine: tips, bubbles, unitig condensation."""

import pytest

from rust_mdbg_tpu.tools.gfa import Gfa, Segment
from rust_mdbg_tpu.tools.gfa_asm import cut_tips, pop_bubbles, unitigs


def mkgfa(segs, links):
    g = Gfa()
    for name, ln, kc in segs:
        tags = [f"KC:i:{kc}"] if kc is not None else []
        g.segments[name] = Segment(name, None, ln, tags)
    g.links = [(a, ao, b, bo, ov) for a, ao, b, bo, ov in links]
    return g


def path_graph(n, ln=1000, ov=100):
    segs = [(f"s{i}", ln, 10) for i in range(n)]
    links = [(f"s{i}", "+", f"s{i+1}", "+", ov) for i in range(n - 1)]
    return mkgfa(segs, links)


def test_cut_tip_removes_short_dead_end():
    # main path s0..s4 with a short tip t0 hanging off s2
    g = path_graph(5)
    g.segments["t0"] = Segment("t0", None, 500, [])
    g.links.append(("t0", "+", "s2", "+", 100))
    n = cut_tips(g, max_ext=10, max_bp=50000)
    assert n == 1 and "t0" not in g.segments
    assert len(g.segments) == 5


def test_cut_tip_keeps_long_tip():
    # the hanging branch is 90kb (> max_bp): it is NOT cuttable; the short
    # dead-end s0-s1 ending at the same junction becomes the tip instead
    g = path_graph(5)
    g.segments["t0"] = Segment("t0", None, 90000, [])
    g.links.append(("t0", "+", "s2", "+", 100))
    assert cut_tips(g, 10, 50000) == 2
    assert "t0" in g.segments
    assert "s0" not in g.segments and "s1" not in g.segments


def test_cut_tip_keeps_isolated_path():
    # a pure linear component is not a tip (doesn't attach to a junction)
    g = path_graph(3)
    assert cut_tips(g, 10, 50000) == 0
    assert len(g.segments) == 3


def test_cut_tip_multi_segment():
    g = path_graph(5)
    # two-segment tip t0->t1 attaching into s2
    g.segments["t0"] = Segment("t0", None, 300, [])
    g.segments["t1"] = Segment("t1", None, 300, [])
    g.links.append(("t0", "+", "t1", "+", 50))
    g.links.append(("t1", "+", "s2", "+", 50))
    assert cut_tips(g, 10, 50000) == 2
    assert "t0" not in g.segments and "t1" not in g.segments


def test_pop_simple_bubble_keeps_high_coverage():
    #      /-- b1 (KC 50) --\
    #  s0 -                  - s3
    #      \-- b2 (KC 2)  --/
    g = mkgfa(
        [("s0", 1000, 100), ("b1", 800, 50), ("b2", 800, 2), ("s3", 1000, 100)],
        [
            ("s0", "+", "b1", "+", 10), ("s0", "+", "b2", "+", 10),
            ("b1", "+", "s3", "+", 10), ("b2", "+", "s3", "+", 10),
        ],
    )
    n = pop_bubbles(g, max_dist=100000)
    assert n == 1
    assert "b2" not in g.segments and "b1" in g.segments


def test_pop_bubble_respects_radius():
    g = mkgfa(
        [("s0", 1000, 100), ("b1", 800, 50), ("b2", 800, 2), ("s3", 1000, 100)],
        [
            ("s0", "+", "b1", "+", 10), ("s0", "+", "b2", "+", 10),
            ("b1", "+", "s3", "+", 10), ("b2", "+", "s3", "+", 10),
        ],
    )
    assert pop_bubbles(g, max_dist=100) == 0  # too small a radius
    assert len(g.segments) == 4


def test_unitig_condense_linear_path():
    g = path_graph(4, ln=1000, ov=100)
    u = unitigs(g)
    assert len(u.segments) == 1
    (name, seg), = u.segments.items()
    assert name.startswith("utg") and name.endswith("l")
    assert seg.length == 4 * 1000 - 3 * 100
    assert len(u.a_lines) == 4
    # offsets are cumulative
    offs = [a[1] for a in u.a_lines]
    assert offs == [0, 900, 1800, 2700]
    assert not u.links


def test_unitig_stops_at_branches():
    # s0 -> s1 -> s2 and s3 -> s1 (s1 has 2 preds)
    g = mkgfa(
        [("s0", 100, 1), ("s1", 100, 1), ("s2", 100, 1), ("s3", 100, 1)],
        [("s0", "+", "s1", "+", 10), ("s3", "+", "s1", "+", 10),
         ("s1", "+", "s2", "+", 10)],
    )
    u = unitigs(g)
    # s1+s2 merge (s1 multi-pred so starts a unitig; s2 single): s0, s3, s1s2
    assert len(u.segments) == 3
    lens = sorted(s.length for s in u.segments.values())
    assert lens == [100, 100, 190]
    assert len(u.links) == 2


def test_unitig_merges_sequences_with_orientation():
    g = Gfa()
    g.segments["a"] = Segment("a", "AACCGGTT", 8, [])
    g.segments["b"] = Segment("b", "CCGG", 4, [])  # b- follows a+: rc(b)=CCGG
    g.links = [("a", "+", "b", "-", 2)]
    u = unitigs(g)
    (seg,) = u.segments.values()
    # oriented(b,-) = revcomp(CCGG) = CCGG; overlap 2 -> append 'GG'
    assert seg.seq == "AACCGGTTGG"


def test_reference_example_simplifies_to_one_unitig(tmp_path):
    from rust_mdbg_tpu.core.pipeline import assemble
    from rust_mdbg_tpu.params import Params
    from rust_mdbg_tpu.tools.gfa_asm import run_ops
    from rust_mdbg_tpu.tools.magic_simplify import ROUND1

    prefix = str(tmp_path / "ex")
    p = Params(k=7, l=10, density=0.0008, min_kmer_abundance=2, engine="host")
    assemble("/root/reference/example/reads-0.00.fa.gz", p, prefix)
    g = run_ops(Gfa.parse(prefix + ".gfa"), ROUND1, verbose=False)
    assert len(g.segments) == 1
    assert len(g.a_lines) == 104


def test_unitig_aline_composition_and_extreme_simplify(tmp_path):
    """Repeated unitig rounds compose A-lines back to original segments;
    extreme-simplify drives N rounds end-to-end on a real assembly."""
    import subprocess
    import sys

    from rust_mdbg_tpu.tools.gfa import Gfa
    from rust_mdbg_tpu.tools.gfa_asm import unitigs

    # chain a-b-c: one unitig; unitig it AGAIN -> A-lines must still
    # reference a/b/c with offsets equal to the single-round result
    g = Gfa()
    from rust_mdbg_tpu.tools.gfa import Segment
    for name, seq in (("a", "ACGTACGT"), ("b", "GTACCCC"), ("c", "CCCTTT")):
        g.segments[name] = Segment(name, seq, len(seq), [])
    g.links.append(("a", "+", "b", "+", 2))
    g.links.append(("b", "+", "c", "+", 3))
    u1 = unitigs(g)
    (utg,) = u1.segments.values()
    u2 = unitigs(u1)
    (utg2,) = u2.segments.values()
    assert utg2.seq == utg.seq
    a1 = sorted((a[3], int(a[1]), a[2]) for a in u1.a_lines)
    a2 = sorted((a[3], int(a[1]), a[2]) for a in u2.a_lines)
    assert a1 == a2 == [("a", 0, "+"), ("b", 6, "+"), ("c", 10, "+")]

    # end-to-end CLI flow on the example assembly
    out = subprocess.run(
        [sys.executable, "-m", "rust_mdbg_tpu", "/root/reference/example/"
         "reads-0.00.fa.gz", "-k", "7", "--density", "0.0008", "-l", "10",
         "--minabund", "2", "--prefix", str(tmp_path / "x")],
        capture_output=True, text=True, cwd=str(tmp_path),
        env=_env(), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    out = subprocess.run(
        [sys.executable, "-m", "rust_mdbg_tpu", "extreme-simplify",
         str(tmp_path / "x"), "2"],
        capture_output=True, text=True, cwd=str(tmp_path),
        env=_env(), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "x.2.gfa").exists()
    assert (tmp_path / "x.2.fa").exists()
    assert not (tmp_path / "x.1.gfa").exists()  # older round cleaned up
    fa = (tmp_path / "x.2.fa").read_text()
    assert fa.startswith(">") and len(fa) > 1000


def _env():
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    return env
