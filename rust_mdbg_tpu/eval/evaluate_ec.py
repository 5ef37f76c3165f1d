"""Error-correction accuracy in minimizer space.

Capability parity with utils/evaluate_ec.py: align each read's minimizer
sequence to a reference genome's minimizer sequence (both from .ec_data
files), semiglobal NW with linear -1 gaps and +1/-1 match scoring, both
orientations, BLAST identity (matches / alignment columns); optionally
compare two versions of the same read set (e.g. raw vs corrected).

Run: python -m rust_mdbg_tpu.eval.evaluate_ec ref.ec_data reads.ec_data
         [corrected.ec_data] [--max-reads N]
"""

from __future__ import annotations

import sys

from ..io import ec_data
from ..models import pairwise


def blast_identity(reference, read) -> float:
    """Best of fwd/rev semiglobal identity of `read` against `reference`."""
    score = lambda a, b: 1 if a == b else -1  # noqa: E731
    # linear gap -1/char: gap_open=0, gap_extend=-1
    aligner = pairwise.Aligner(0, -1, score, match_scores=(1, -1))

    def ident(query):
        aln = aligner.semiglobal(list(query), list(reference))
        cols = len(aln.operations)
        if cols == 0:
            return 0.0, aln.score
        matches = sum(1 for o in aln.operations if o == "Match")
        return 100.0 * matches / cols, aln.score

    fwd = ident(read)
    rev = ident(read[::-1])
    return max(fwd, rev, key=lambda t: t[1])[0]


def evaluate(ref_path: str, reads_path: str, corrected_path: str | None = None,
             max_reads: int = 50):
    ref = ec_data.load(ref_path.replace(".ec_data", ""))
    if not ref:
        raise SystemExit(f"no records in {ref_path}")
    reference = ref[0].read_transformed
    reads = ec_data.load(reads_path.replace(".ec_data", ""))[:max_reads]
    results = {}
    for rec in reads:
        results[rec.seq_id] = blast_identity(reference, rec.read_transformed)
    out = {"mean_identity": sum(results.values()) / max(1, len(results)),
           "n_reads": len(results), "per_read": results}
    if corrected_path:
        cor = ec_data.load(corrected_path.replace(".ec_data", ""))
        cor_by_id = {r.seq_id: r for r in cor}
        cres = {}
        for rid in results:
            if rid in cor_by_id:
                cres[rid] = blast_identity(
                    reference, cor_by_id[rid].read_transformed
                )
        out["mean_identity_corrected"] = (
            sum(cres.values()) / max(1, len(cres))
        )
        out["per_read_corrected"] = cres
    return out


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    args = [a for a in argv if not a.startswith("--")]
    max_reads = 50
    for a in argv:
        if a.startswith("--max-reads"):
            max_reads = int(a.split("=")[1])
    res = evaluate(args[0], args[1], args[2] if len(args) > 2 else None,
                   max_reads)
    print(f"reads aligned: {res['n_reads']}")
    print(f"mean BLAST identity: {res['mean_identity']:.2f}%")
    if "mean_identity_corrected" in res:
        print(f"mean BLAST identity (corrected): "
              f"{res['mean_identity_corrected']:.2f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
