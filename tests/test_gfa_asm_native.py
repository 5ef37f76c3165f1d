"""Native (C++) graph-simplification engine: byte-identical to the Python oracle.

native/gfa_asm.cpp is the production engine behind magic_simplify (gfatools
replacement, /root/reference/utils/magic_simplify:29-57); tools/gfa_asm.py is
the readable oracle.  These tests assert file-level equality on randomized
graphs and on a real assembly, across every op kind (t/b/r/u) and schedule
composition.
"""

import random

import pytest

from rust_mdbg_tpu.tools.gfa_asm import engine_choice, run_ops_file

SCHEDULES = [
    [("u",)],
    [("t", 10, 50000), ("u",)],
    [("b", 100000,), ("u",)],
    [("t", 4, 10000), ("b", 50000,), ("u",), ("t", 10, 50000), ("u",)],
    [("r", 5,), ("u",)],
    # magic_simplify ROUND1 (utils/magic_simplify:29-38 shape)
    [("t", 10, 50000), ("b", 100000,), ("u",),
     ("t", 10, 50000), ("b", 100000,), ("u",)],
]


def _random_gfa(rng: random.Random, n_seg: int, n_link: int,
                with_seq: bool, with_alines: bool) -> str:
    lines = ["H\tVN:Z:1.0"]
    names = [f"s{i}" for i in range(n_seg)]
    for name in names:
        if with_seq and rng.random() < 0.8:
            ln = rng.randrange(1, 40)
            seq = "".join(rng.choice("ACGT") for _ in range(ln))
            tags = [f"KC:i:{rng.randrange(1, 60)}"] if rng.random() < 0.7 else []
            lines.append("\t".join(["S", name, seq] + tags))
        else:
            ln = rng.randrange(1, 5000)
            tags = [f"LN:i:{ln}"]
            if rng.random() < 0.7:
                tags.append(f"KC:i:{rng.randrange(1, 60)}")
            lines.append("\t".join(["S", name, "*"] + tags))
        if with_alines and rng.random() < 0.5:
            # pre-existing A-lines (as if from a prior unitig round)
            off = 0
            for j in range(rng.randrange(1, 4)):
                alen = rng.randrange(1, 200)
                lines.append(
                    f"A\t{name}\t{off}\t{rng.choice('+-')}\torig{name}_{j}"
                    f"\t0\t{alen}")
                off += alen
    for _ in range(n_link):
        a, b = rng.choice(names), rng.choice(names)
        ao, bo = rng.choice("+-"), rng.choice("+-")
        ov = rng.randrange(0, 12)
        lines.append(f"L\t{a}\t{ao}\t{b}\t{bo}\t{ov}M")
    if rng.random() < 0.3:
        # link to a never-defined segment: parse keeps it, write skips it
        lines.append(f"L\t{names[0]}\t+\tghost\t+\t3M")
    return "\n".join(lines) + "\n"


def _bubble_chain_gfa(rng: random.Random, n_bub: int) -> str:
    """Chains of anchors with 2-3 way bubbles and hanging tips: exercises
    t/b passes on graphs where they actually fire."""
    lines = ["H\tVN:Z:1.0"]
    segid = 0

    def seg(ln, kc):
        nonlocal segid
        name = f"g{segid}"
        segid += 1
        lines.append(f"S\t{name}\t*\tLN:i:{ln}\tKC:i:{kc}")
        return name

    prev = seg(1000, 50)
    for _ in range(n_bub):
        arms = [seg(rng.randrange(200, 900), rng.randrange(1, 80))
                for _ in range(rng.randrange(2, 4))]
        nxt = seg(1000, 50)
        for a in arms:
            lines.append(f"L\t{prev}\t+\t{a}\t+\t{rng.randrange(0, 9)}M")
            lines.append(f"L\t{a}\t+\t{nxt}\t+\t{rng.randrange(0, 9)}M")
        if rng.random() < 0.6:
            tip = seg(rng.randrange(50, 400), 2)
            lines.append(f"L\t{tip}\t+\t{nxt}\t+\t2M")
        prev = nxt
    return "\n".join(lines) + "\n"


def _run_both(tmp_path, text: str, ops, tag: str):
    src = tmp_path / f"{tag}.gfa"
    src.write_text(text)
    outs = {}
    stats = {}
    for eng in ("python", "native"):
        out = tmp_path / f"{tag}.{eng}.gfa"
        stats[eng] = run_ops_file(str(src), ops, str(out), engine=eng)
        outs[eng] = out.read_bytes()
    assert stats["python"] == stats["native"]
    assert outs["python"] == outs["native"]
    return outs["python"]


def test_native_engine_available():
    assert engine_choice() == "native"


@pytest.mark.parametrize("seed", range(6))
def test_random_graph_parity(tmp_path, seed):
    rng = random.Random(seed)
    text = _random_gfa(rng, n_seg=rng.randrange(5, 60),
                       n_link=rng.randrange(5, 120),
                       with_seq=seed % 2 == 0, with_alines=seed % 3 == 0)
    for i, ops in enumerate(SCHEDULES):
        _run_both(tmp_path, text, ops, f"r{seed}_{i}")


@pytest.mark.parametrize("seed", range(4))
def test_bubble_chain_parity(tmp_path, seed):
    rng = random.Random(1000 + seed)
    text = _bubble_chain_gfa(rng, n_bub=12)
    for i, ops in enumerate(SCHEDULES):
        out = _run_both(tmp_path, text, ops, f"b{seed}_{i}")
        assert out  # non-empty output


def test_repeated_unitig_rounds_compose_alines(tmp_path):
    # a-b-c chain with sequences; two unitig rounds must equal one
    text = ("H\tVN:Z:1.0\n"
            "S\ta\tACGTACGT\n"
            "S\tb\tGTACCCC\n"
            "S\tc\tCCCTTT\n"
            "L\ta\t+\tb\t+\t2M\n"
            "L\tb\t+\tc\t+\t3M\n")
    one = _run_both(tmp_path, text, [("u",)], "once")
    src = tmp_path / "once.native.gfa"
    twice = tmp_path / "twice.gfa"
    run_ops_file(str(src), [("u",)], str(twice), engine="native")
    assert twice.read_bytes() == one


def test_real_assembly_parity(tmp_path):
    """Full ROUND1 schedule over a real (reference example) assembly GFA."""
    from rust_mdbg_tpu.core.pipeline import assemble
    from rust_mdbg_tpu.params import Params
    from rust_mdbg_tpu.tools.magic_simplify import ROUND1

    prefix = str(tmp_path / "ex")
    p = Params(k=7, l=10, density=0.0008, min_kmer_abundance=2, engine="host")
    assemble("/root/reference/example/reads-0.00.fa.gz", p, prefix)
    _run_both(tmp_path, open(prefix + ".gfa").read(), ROUND1, "real")


def test_crlf_input_parity(tmp_path):
    """CRLF line endings: python text-mode strips \\r\\n; native must too."""
    text = ("H\tVN:Z:1.0\r\n"
            "S\ta\tACGT\r\n"
            "S\tb\tGTTT\r\n"
            "L\ta\t+\tb\t+\t2M\r\n")
    out = _run_both(tmp_path, text, [("u",)], "crlf")
    assert b"\r" not in out


def test_aline_extra_fields_roundtrip(tmp_path):
    """A-lines with extra (or many) fields round-trip verbatim in BOTH
    engines on schedules without a unitig op."""
    text = ("H\tVN:Z:1.0\n"
            "S\ta\t*\tLN:i:100\n"
            "A\ta\t0\t+\torig1\t0\t100\tXT:i:5\n")
    out = _run_both(tmp_path, text, [("t", 10, 50000)], "alx")
    assert b"XT:i:5" in out


def test_revcomp_parity_unusual_bases(tmp_path):
    """u/U/n through the unitig reverse-complement: both engines must use
    the utils/seq.revcomp table (u->a, U->A, everything else N)."""
    text = ("H\tVN:Z:1.0\n"
            "S\ta\tACGTACG\n"
            "S\tb\tTTnU\n"
            "L\ta\t+\tb\t-\t1M\n")
    out = _run_both(tmp_path, text, [("u",)], "ub")
    # revcomp(TTnU) = ANAA; overlap 1 trims the first char -> ...G + NAA
    assert b"ACGTACGNAA" in out


def test_star_overlap_cigar(tmp_path):
    """GFA1 '*' CIGAR parses as overlap 0 in both engines."""
    text = ("H\tVN:Z:1.0\n"
            "S\ta\tACGT\n"
            "S\tb\tGTTT\n"
            "L\ta\t+\tb\t+\t*\n")
    out = _run_both(tmp_path, text, [("u",)], "star")
    assert out.count(b"S\t") == 1  # merged at overlap 0


def test_circular_unitig_label(tmp_path):
    """A multi-segment cycle gets the 'c' suffix (gfatools -u convention)."""
    text = ("H\tVN:Z:1.0\n"
            "S\ta\t*\tLN:i:100\n"
            "S\tb\t*\tLN:i:100\n"
            "S\tc\t*\tLN:i:100\n"
            "L\ta\t+\tb\t+\t10M\n"
            "L\tb\t+\tc\t+\t10M\n"
            "L\tc\t+\ta\t+\t10M\n")
    out = _run_both(tmp_path, text, [("u",)], "circ")
    assert b"utg0000001c" in out
