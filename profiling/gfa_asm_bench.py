"""Time the native gfa_asm engine on a large synthetic assembly graph.

Synthesizes an mdBG-shaped graph (long chains + bubbles + tips, *-segments
with LN/KC tags, like a pre-simplify k-min-mer graph), runs the full
magic_simplify ROUND1 schedule through the requested engine, and reports wall
time.  VERDICT r3 target: >=5M segments, <=3 min, native byte-identical to
the Python oracle.

Usage: python profiling/gfa_asm_bench.py [n_chains] [--engine native|python]
       [--out FILE.json] [--keep-gfa PATH]
"""

import json
import os
import random
import sys
import time


def synth(path: str, n_chains: int, rng: random.Random) -> int:
    """Write a synthetic GFA; returns segment count.

    Each chain is ~40 segments of anchors with 2-arm bubbles and hanging
    tips — the simplification passes all fire, like a real noisy mdBG.
    """
    nseg = 0
    with open(path, "w", buffering=1 << 22) as f:
        f.write("H\tVN:Z:1.0\n")
        sid = 0

        def seg(ln, kc):
            nonlocal sid, nseg
            name = f"utg{sid}"
            sid += 1
            nseg += 1
            f.write(f"S\t{name}\t*\tLN:i:{ln}\tKC:i:{kc}\n")
            return name

        for _ in range(n_chains):
            prev = seg(rng.randrange(800, 2000), rng.randrange(20, 60))
            for _ in range(12):
                r = rng.random()
                if r < 0.45:  # bubble
                    a1 = seg(rng.randrange(300, 900), rng.randrange(20, 60))
                    a2 = seg(rng.randrange(300, 900), rng.randrange(1, 6))
                    nxt = seg(rng.randrange(800, 2000), rng.randrange(20, 60))
                    ov = rng.randrange(0, 9)
                    f.write(f"L\t{prev}\t+\t{a1}\t+\t{ov}M\n")
                    f.write(f"L\t{prev}\t+\t{a2}\t+\t{ov}M\n")
                    f.write(f"L\t{a1}\t+\t{nxt}\t+\t{ov}M\n")
                    f.write(f"L\t{a2}\t+\t{nxt}\t+\t{ov}M\n")
                    prev = nxt
                elif r < 0.65:  # tip hanging off the next anchor
                    tip = seg(rng.randrange(100, 500), 2)
                    nxt = seg(rng.randrange(800, 2000), rng.randrange(20, 60))
                    f.write(f"L\t{prev}\t+\t{nxt}\t+\t{rng.randrange(0, 9)}M\n")
                    f.write(f"L\t{tip}\t+\t{nxt}\t+\t2M\n")
                    prev = nxt
                else:  # plain chain extension (unitig fodder)
                    for _ in range(rng.randrange(2, 5)):
                        nxt = seg(rng.randrange(800, 2000),
                                  rng.randrange(20, 60))
                        f.write(
                            f"L\t{prev}\t+\t{nxt}\t+\t{rng.randrange(0, 9)}M\n")
                        prev = nxt
    return nseg


def main(argv):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from rust_mdbg_tpu.tools.gfa_asm import run_ops_file
    from rust_mdbg_tpu.tools.magic_simplify import ROUND1

    n_chains = 200_000
    engine = "native"
    out_json = None
    keep = None
    args = list(argv)
    while args:
        a = args.pop(0)
        if a == "--engine":
            engine = args.pop(0)
        elif a == "--out":
            out_json = args.pop(0)
        elif a == "--keep-gfa":
            keep = args.pop(0)
        else:
            n_chains = int(a)

    import tempfile
    d = tempfile.mkdtemp(prefix="gfaasm_")
    src = keep or os.path.join(d, "big.gfa")
    if not (keep and os.path.exists(keep)):
        t0 = time.time()
        nseg = synth(src, n_chains, random.Random(42))
        print(f"synth: {nseg} segments in {time.time()-t0:.1f}s "
              f"({os.path.getsize(src)/1e6:.0f} MB)", file=sys.stderr)
    else:
        nseg = sum(1 for ln in open(src) if ln[0] == "S")
        print(f"reusing {src}: {nseg} segments", file=sys.stderr)

    dst = os.path.join(d, f"out.{engine}.gfa")
    t0 = time.time()
    stats = run_ops_file(src, ROUND1, dst, engine=engine, verbose=True)
    wall = time.time() - t0
    rec = {
        "metric": "gfa_asm_round1_wall_s",
        "engine": engine,
        "segments": nseg,
        "value": round(wall, 2),
        "unit": "s",
        "stats": [list(s) for s in stats],
        "out_sha": _sha(dst),
    }
    print(json.dumps(rec))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(rec, f, indent=1)
    if not keep:
        os.remove(src)
    os.remove(dst)
    os.rmdir(d)
    return 0


def _sha(path):
    import hashlib
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(1 << 22)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
