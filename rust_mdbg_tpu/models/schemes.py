"""Minimizer scheme registry and auxiliary selection filters.

UHS / LCP filters (reference: minimizers.rs:115-161, read.rs:93-156):

The reference preloads a Bloom filter from the universal-kmer / core-substring
file, then during extraction keeps a minimizer iff `check_and_add(hash)`
returns true (= already present).  Two faithful quirks:

- `uhs_preparation` inserts ntc64 hashes of each file line, so UHS membership
  is hash equality against the line's first l characters;
- `lcp_preparation` inserts the core STRINGS but extraction queries with the
  minimizer HASH (read.rs:118 vs minimizers.rs:153), so preloaded entries can
  never match a query — the effective behavior is keep-from-second-occurrence.

We use an exact hash set instead of a Bloom filter (no false positives; the
reference's 500M-slot Bloom at these densities had a negligible FP rate, and
exactness is strictly more reproducible).
"""

from __future__ import annotations

from ..ops.nthash import ntc64


class CheckAndAddFilter:
    """xx_bloomfilter's check_and_add contract: True iff already present,
    else insert and return False."""

    def __init__(self):
        self._set: set = set()

    def add(self, item):
        self._set.add(item)

    def check_and_add(self, item) -> bool:
        if item in self._set:
            return True
        self._set.add(item)
        return False


def uhs_preparation(params, uhs_path: str) -> CheckAndAddFilter:
    """Load universal k-mers, keyed by ntc64 of the first l chars
    (minimizers.rs:115-136)."""
    f = CheckAndAddFilter()
    with open(uhs_path) as fh:
        for line in fh:
            if len(line.rstrip("\n")) >= params.l:
                f.add(ntc64(line.rstrip("\n")[: params.l], params.l))
    return f


def lcp_preparation(params, lcp_path: str) -> CheckAndAddFilter:
    """Load core substrings AS STRINGS (minimizers.rs:138-161) — queries are
    hashes, so these entries act as inert preload (see module docstring)."""
    f = CheckAndAddFilter()
    with open(lcp_path) as fh:
        for line in fh:
            core = line.rstrip("\n")
            if len(core) == params.l:
                f.add(core)
    return f
