"""TEST-ONLY transliteration oracle of the reference's hot path.

A deliberately literal, single-threaded Python re-expression of the
reference's per-read windowing loop and `add_kminmer` node-table semantics,
used as an independent ground truth to fuzz the pipeline against:

  - HPC run-length encoding with raw-position map
    (/root/reference/src/read.rs:157-174)
  - density minimizer selection `hash <= density * u64::MAX as f64`
    (/root/reference/src/read.rs:176-211)
  - k-window slide, KmerVec lexicographic normalize (palindromes count as
    reversed), shift pair and read_offsets computation
    (/root/reference/src/main.rs:756-781, kmer_vec.rs:34-39)
  - `add_kminmer`: abundance counting, crossing-occurrence seqlen/shift
    capture, .sequences record emission exactly once at the crossing, and
    the --bf first-sighting-marks-only pre-filter
    (/root/reference/src/main.rs:632-709)

The ntHash primitive itself is NOT re-derived here — it is taken from
ops/nthash, which is pinned by an external crate test vector
(tests/test_nthash.py); everything above it is written from the reference's
control flow so a structural bug in the pipeline cannot hide.

The Bloom filter is modelled bit-for-bit as THIS repo's race-free
single-hash filter (native/mdbg_core.cpp), not the reference's xx-bloomfilter
— false-positive patterns differ between the two by construction (PARITY.md);
the semantics under test (first sighting marks, second inserts with
abundance 2, crossing selector shifts by one) are identical.

Node INDICES are not compared: the reference assigns them at first insertion
in thread-arrival order (nondeterministic); this repo assigns them in
crossing order.  All comparisons key nodes by their minimizer vector.
"""

from __future__ import annotations

import numpy as np

from rust_mdbg_tpu.ops.kminmer import fingerprint128_np
from rust_mdbg_tpu.ops.nthash import nthash_canonical_np
from rust_mdbg_tpu.utils.seq import BASE_CODE, revcomp

_M64 = (1 << 64) - 1
_HPC_CHARS = set("ACTGactgNn")


def encode_rle(seq: str) -> tuple[str, list[int]]:
    """read.rs:157-174, literally (note: only ACTGactgNn repeats compress)."""
    prev_char = "#"
    hpc = []
    pos = []
    prev_i = 0
    for i, c in enumerate(seq):
        if c == prev_char and c in _HPC_CHARS:
            continue
        if prev_char != "#":
            hpc.append(prev_char)
            pos.append(prev_i)
            prev_i = i
        prev_char = c
    hpc.append(prev_char)
    pos.append(prev_i)
    return "".join(hpc), pos


def rust_hash_bound(density: float) -> int:
    """read.rs:183: `((density as f64) * (u64::MAX as f64)) as u64` — the f64
    of u64::MAX rounds up to 2^64; the cast truncates and saturates."""
    v = float(density) * 18446744073709551615.0
    return _M64 if v >= float(_M64) else int(v)


def extract_density(seq: str, l: int, density: float, already_hpc: bool):
    """read.rs:176-211 -> (minimizers_pos in RAW coordinates, transformed,
    extent ends).

    The third list is NOT in the reference: per selected l-mer, the raw end
    of its full HPC extent (raw start of the HPC base l after the l-mer's
    HPC start, or the raw read length) — the oracle's independent derivation
    of the exact-cut record spans (rust_mdbg_tpu/ops/hpc.extent_ends_np)."""
    if already_hpc:
        inp = seq
        pos_vec = None
    else:
        inp, pos_vec = encode_rle(seq)
    if len(inp) < l:
        return [], [], []
    codes = BASE_CODE[np.frombuffer(inp.encode(), dtype=np.uint8)]
    h = nthash_canonical_np(codes, l)
    bound = rust_hash_bound(density)
    sel = np.nonzero(h <= np.uint64(bound))[0]
    if already_hpc:
        mpos = [int(i) for i in sel]
        mend = [int(i) + l for i in sel]
    else:
        mpos = [pos_vec[int(i)] for i in sel]
        mend = [pos_vec[int(i) + l] if int(i) + l < len(pos_vec)
                else len(seq) for i in sel]
    return mpos, [int(x) for x in h[sel]], mend


def normalize(vec: tuple) -> tuple[tuple, bool]:
    """kmer_vec.rs:34-39: lexicographic vs reversal; NOT-less means reversed,
    so a palindrome reports reversed=True."""
    rev = vec[::-1]
    if vec < rev:
        return vec, False
    return rev, True


class OracleTable:
    """add_kminmer semantics (main.rs:632-709), sequential."""

    def __init__(self, min_abundance: int, use_bf: bool = False,
                 reference: bool = False, bloom_log2_bits: int = 24,
                 no_basespace: bool = False):
        self.minab = min_abundance
        self.use_bf = use_bf
        self.reference = reference
        self.no_basespace = no_basespace
        self.bloom_mask = (1 << bloom_log2_bits) - 1
        self.bloom: set[int] = set()
        # vec -> [index, abundance, seqlen, shift]
        self.entries: dict[tuple, list] = {}
        self.node_index = 0
        # vec -> (seq_text, shift) emitted at the crossing occurrence
        self.records: dict[tuple, tuple] = {}

    def _bloom_bit(self, node: tuple) -> int:
        fp = fingerprint128_np(np.asarray([node], dtype=np.uint64))
        lo, hi = int(fp[0, 0]), int(fp[0, 1])
        return (lo ^ ((hi * 0x9E3779B97F4A7C15) & _M64)) & self.bloom_mask

    def add(self, node: tuple, seq_reversed: bool, shift: tuple,
            read_seq: str, read_offsets: tuple, gfa_shift: tuple = None):
        """gfa_shift: the raw START-distance pair the reference stores in
        DbgEntry.shift (feeds L-line overlaps, main.rs:1091-1092) — differs
        from the .sequences `shift` only under exact_cuts."""
        if gfa_shift is None:
            gfa_shift = shift
        minab = self.minab
        if self.use_bf and not self.reference and minab > 1:
            bit = self._bloom_bit(node)
            if bit not in self.bloom:
                self.bloom.add(bit)
                return
            previous_abundance = 1
            contains_key = node in self.entries
        else:
            contains_key = node in self.entries
            if contains_key:
                previous_abundance = 1  # placeholder, refined below
            else:
                cur = self.node_index
                self.node_index += 1
                previous_abundance = 0
                seqlen = read_offsets[2]
                self.entries[node] = [cur, 0, seqlen, gfa_shift]
                contains_key = True
        if contains_key:
            e = self.entries[node]
            previous_abundance = e[1]
            if previous_abundance == minab - 1:
                e[2] = read_offsets[2]
                e[3] = gfa_shift
            e[1] += 1
        else:
            cur = self.node_index
            self.node_index += 1
            self.entries[node] = [cur, previous_abundance + 1,
                                  read_offsets[2], gfa_shift]
        if self.reference or previous_abundance >= 1 or minab == 1:
            if previous_abundance == minab - 1:
                s = read_seq[read_offsets[0] : read_offsets[1]]
                if seq_reversed:
                    s = revcomp(s)
                assert node not in self.records, "double crossing"
                if not self.no_basespace:
                    self.records[node] = (s, shift)


def oracle_assemble(reads: list[str], *, k: int, l: int, density: float,
                    min_abundance: int = 2, use_bf: bool = False,
                    reference: bool = False, already_hpc: bool = False,
                    bloom_log2_bits: int = 24,
                    exact_cuts: bool = False) -> OracleTable:
    """The reference's per-read worker loop (main.rs:756-781) over `reads`,
    in order, feeding the oracle table.

    exact_cuts=False is the literal reference: record span ends at
    mpos[i+k-1] + l and the recorded shift pair is the raw START-distance
    pair (main.rs:769-778).  exact_cuts=True models the framework's default
    .sequences semantics: the span runs to the last l-mer's full HPC extent
    and the right-cut distance uses extent ENDS — derived here independently
    from the oracle's own encode_rle position list, so a framework bug in
    the extent computation cannot hide.  Node-table shift/seqlen (GFA
    semantics) stay the reference's in both modes."""
    table = OracleTable(min_abundance, use_bf, reference, bloom_log2_bits)
    for seq in reads:
        mpos, transformed, mend = extract_density(seq, l, density,
                                                  already_hpc)
        if len(transformed) <= k:   # strictly-greater quirk, main.rs:757
            continue
        for i in range(len(transformed) - k + 1):
            node, rev = normalize(tuple(transformed[i : i + k]))
            d_first = mpos[i + 1] - mpos[i]
            d_last_s = mpos[i + k - 1] - mpos[i + k - 2]
            d_last = (mend[i + k - 1] - mend[i + k - 2] if exact_cuts
                      else d_last_s)
            shift = (d_last, d_first) if rev else (d_first, d_last)
            gfa_shift = (d_last_s, d_first) if rev else (d_first, d_last_s)
            end = mend[i + k - 1] if exact_cuts else mpos[i + k - 1] + l
            read_offsets = (mpos[i], end,
                            mpos[i + k - 1] + 1 - mpos[i] + 1)
            table.add(node, rev, shift, seq, read_offsets,
                      gfa_shift=gfa_shift)
    return table


def oracle_gfa(table: OracleTable, presimp: float = 0.01):
    """The reference's edge enumeration + presimp + deferred symmetric write
    (main.rs:1006-1117), literally, over the oracle table — FULL-VECTOR
    (k-1)-overlap comparisons, no fingerprints.

    Returns (nodes, edges): nodes = {vec: (seqlen, abundance)} after the
    abundance filter (main.rs:922-933); edges = sorted list of written
    L-records as (vec1, ori1, vec2, ori2, overlap) — a node-id-free multiset
    the pipeline's GFA is compared against (ids are arrival-order-dependent
    in the reference and crossing-ordered here, PARITY.md)."""
    kept = [(vec, e) for vec, e in table.entries.items()
            if table.reference or e[1] >= table.minab]
    kept.sort(key=lambda t: t[1][0])  # insertion order (the determinization)

    km_index: dict[tuple, list[tuple]] = {}
    for vec, _e in kept:
        # main.rs:1023-1032: each node indexed under normalize(prefix) and
        # normalize(suffix)
        for sub in (normalize(vec[:-1])[0], normalize(vec[1:])[0]):
            km_index.setdefault(sub, []).append(vec)

    removed: set[tuple] = set()
    vec_edges = []
    nb = {vec: i for i, (vec, _) in enumerate(kept)}
    for vec, e in kept:
        suf, pre = vec[1:], vec[:-1]
        suf_r = tuple(reversed(suf))
        pre_r = tuple(reversed(pre))
        for key in (normalize(suf)[0], normalize(pre)[0]):
            potential = []
            for cand in km_index.get(key, ()):
                c_pre, c_suf_r = cand[:-1], tuple(reversed(cand[1:]))
                if suf == c_pre:
                    potential.append((cand, "+", "+"))
                if suf == c_suf_r:
                    potential.append((cand, "+", "-"))
                if pre_r == c_pre:
                    potential.append((cand, "-", "+"))
                if pre_r == c_suf_r:
                    potential.append((cand, "-", "-"))
            if not potential:
                continue
            ab_max = max(table.entries[c][1] for c, _, _ in potential)
            ab_ref = min(ab_max, e[1])
            for cand, o1, o2 in potential:
                e2 = table.entries[cand]
                if presimp > 0.0 and len(potential) >= 2 \
                        and e2[1] < presimp * ab_ref:
                    removed.add((nb[vec], nb[cand]))
                    continue
                shift = e[3][0] if o1 == "+" else e[3][1]
                overlap = min(e[2] - shift, e2[2] - 1)
                vec_edges.append((vec, o1, cand, o2, overlap))

    edges = []
    for v1, o1, v2, o2, ov in vec_edges:
        if (nb[v1], nb[v2]) in removed or (nb[v2], nb[v1]) in removed:
            continue
        edges.append((v1, o1, v2, o2, ov))
    nodes = {vec: (e[2], e[1]) for vec, e in kept}
    return nodes, sorted(edges)
