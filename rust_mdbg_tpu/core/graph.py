"""mdBG edge construction, presimp filtering and GFA emission.

Parity target: /root/reference/src/main.rs:1006-1121.

- S lines: `S\t<index>\t*\tLN:i:<seqlen>\tKC:i:<abundance>` (main.rs:1021)
- km_index: every node indexed under normalize(prefix) and normalize(suffix)
  (main.rs:1023-1032)
- edge enumeration per node, per key in [normalize(suffix), normalize(prefix)]:
  candidates = km_index[key], each tested with the four orientation cases
  (main.rs:1056-1075); this includes the reference's duplicate-emission
  behavior when a candidate satisfies a test in both key groups.
- presimp (main.rs:1086-1090): within a candidate group of >= 2 edges, drop the
  edge to n2 if n2.abundance < presimp * min(max group abundance, n1.abundance);
  deferred symmetric write drops an edge if its reverse was dropped
  (main.rs:1107-1117).
- overlap = min(n1.seqlen - shift, n2.seqlen - 1) with shift = shift0 for '+',
  shift1 for '-' (main.rs:1091-1092).
"""

from __future__ import annotations

import numpy as np


def _norm(vec: tuple) -> tuple:
    r = vec[::-1]
    return vec if vec < r else r


def build_gfa(
    path: str,
    nodes: dict,
    vectors: dict,
    presimp: float = 0.01,
) -> dict:
    """Write the mdBG GFA.  `nodes` is NodeTable.dump() output (post abundance
    filter); `vectors[index]` is the canonical minimizer vector per node.

    Returns stats: nb_nodes, nb_edges, presimp_removed.
    """
    index = nodes["index"]
    abundance = nodes["abundance"]
    seqlen = nodes["seqlen"]
    shift0 = nodes["shift0"]
    shift1 = nodes["shift1"]
    n = len(index)

    out = open(path, "w", buffering=1 << 20)
    out.write("H\tVN:Z:1.0\n")

    # S lines + km_index
    km_index: dict[tuple, list[int]] = {}
    vecs: list[tuple] = []
    for i in range(n):
        idx = int(index[i])
        out.write(f"S\t{idx}\t*\tLN:i:{int(seqlen[i])}\tKC:i:{int(abundance[i])}\n")
        vec = tuple(int(x) for x in vectors[idx])
        vecs.append(vec)
        km_index.setdefault(_norm(vec[:-1]), []).append(i)
        km_index.setdefault(_norm(vec[1:]), []).append(i)

    nb_edges = 0
    presimp_removed = 0
    removed_edges: set[tuple[int, int]] = set()
    vec_edges: list[tuple] = []

    for i in range(n):
        v1 = vecs[i]
        n1_ab = int(abundance[i])
        n1_idx = int(index[i])
        n1_seqlen = int(seqlen[i])
        suf1, pre1 = v1[1:], v1[:-1]
        rsuf1 = pre1[::-1]  # rev(n1).suffix() == reverse(n1.prefix())
        for key in (_norm(suf1), _norm(pre1)):
            cands = km_index.get(key)
            if not cands:
                continue
            potential: list[tuple[int, str, str]] = []  # (j, ori1, ori2)
            for j in cands:
                v2 = vecs[j]
                pre2, suf2 = v2[:-1], v2[1:]
                rpre2 = suf2[::-1]  # rev(n2).prefix() == reverse(n2.suffix())
                if suf1 == pre2:
                    potential.append((j, "+", "+"))
                if suf1 == rpre2:
                    potential.append((j, "+", "-"))
                if rsuf1 == pre2:
                    potential.append((j, "-", "+"))
                if rsuf1 == rpre2:
                    potential.append((j, "-", "-"))
            if not potential:
                continue
            ab_max = max(int(abundance[j]) for j, _, _ in potential)
            ab_ref = min(ab_max, n1_ab)
            for j, ori1, ori2 in potential:
                n2_ab = int(abundance[j])
                n2_idx = int(index[j])
                n2_seqlen = int(seqlen[j])
                if presimp > 0.0 and len(potential) >= 2 and n2_ab < presimp * ab_ref:
                    presimp_removed += 1
                    removed_edges.add((n1_idx, n2_idx))
                    continue
                shift = int(shift0[i]) if ori1 == "+" else int(shift1[i])
                overlap = min(n1_seqlen - shift, n2_seqlen - 1)
                if presimp == 0.0:
                    out.write(f"L\t{n1_idx}\t{ori1}\t{n2_idx}\t{ori2}\t{overlap}M\n")
                    nb_edges += 1
                else:
                    vec_edges.append((n1_idx, ori1, n2_idx, ori2, overlap))

    if presimp > 0.0:
        for n1_idx, ori1, n2_idx, ori2, overlap in vec_edges:
            if (n1_idx, n2_idx) in removed_edges or (n2_idx, n1_idx) in removed_edges:
                continue
            out.write(f"L\t{n1_idx}\t{ori1}\t{n2_idx}\t{ori2}\t{overlap}M\n")
            nb_edges += 1
    out.close()
    return dict(nb_nodes=n, nb_edges=nb_edges, presimp_removed=presimp_removed)
