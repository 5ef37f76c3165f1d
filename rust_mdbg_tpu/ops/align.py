"""Batched minimizer-space alignment scoring on device (SURVEY P6).

The EC driver's hot alignment loop scores every recruited candidate twice
(forward and reversed) against the template before the better direction is
woven into the POA graph (read.rs:485-519).  Those scoring passes don't need
tracebacks — just the semiglobal DP score — so they vectorize cleanly:

`semiglobal_scores_batch(template, queries)` runs one jitted lax.scan over
template positions with the whole padded query batch in lanes, computing the
POA-style semiglobal score (free start anywhere in the template, query fully
consumed, gap = -1/char like poa_correct's scoring) for every query at once.
The within-row insertion recurrence is closed into a prefix-max
(I[j] = ge*j + max_k(C[k] - ge*k)) so each template step is pure VPU work.

Scores correspond to the LINEAR template (the POA graph before weaving); the
EC driver can use them to triage directions / prune candidates cheaply and
run the exact graph alignment only for survivors.
"""

from __future__ import annotations

import functools
import os

import numpy as np

NEG = -(2**20)


def _make_scores_fn():
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("gap", "match", "mismatch"))
    def scores(template, tvalid, queries, qlens, gap=-1, match=1,
               mismatch=-1):
        B, Q = queries.shape
        jq = jnp.arange(Q, dtype=jnp.int32)
        valid = jq[None, :] < qlens[:, None]
        cols = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), (jq + 1).astype(jnp.int32)]
        )  # column index 0..Q

        def step(prev, t_row):                   # prev: [B, Q+1]
            t_sym, t_ok = t_row
            sub = jnp.where(queries == t_sym, match, mismatch)
            sub = jnp.where(valid, sub, NEG)
            diag = prev[:, :-1] + sub            # match into column j+1
            up = prev[:, 1:] + gap               # template deletion
            cand = jnp.maximum(diag, up)
            base = jnp.concatenate(
                [jnp.zeros((B, 1), dtype=cand.dtype), cand], axis=1
            )
            # insertions (consume query) within the row: prefix-max closure
            keyed = base - cols[None, :] * gap
            run = jax.lax.associative_scan(jnp.maximum, keyed, axis=1)
            row = jnp.maximum(base, run + cols[None, :] * gap)
            row = row.at[:, 0].set(0)            # start anywhere in template
            row = jnp.where(t_ok, row, prev)     # padded template rows: no-op
            return row, None

        row0 = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32),
             jnp.broadcast_to((jq[None, :] + 1) * gap, (B, Q))], axis=1
        )
        last_row, _ = jax.lax.scan(step, row0, (template, tvalid))
        # the POA semiglobal ends at the terminal node (linear template: its
        # last position) with the query fully consumed (poa.rs:459-467)
        return jnp.take_along_axis(last_row, qlens[:, None], axis=1)[:, 0]

    return scores


_scores_fn = None

# below this DP volume (B*T*Q cells) the jitted path is pure dispatch/sync
# overhead (~30 ms/call for ~10^5-cell problems); the identical numpy
# row-sweep runs in ~0.2 ms.  EC bucket triage (<=80 candidates x ~50-mer
# templates) always lands here; the device path remains for mega-batches.
_NP_CUTOFF = 1 << 24


def _scores_np(template, queries, qlens, gap, match, mismatch):
    """Numpy twin of the jitted scan in _make_scores_fn (same recurrence)."""
    B, Q = queries.shape
    jq = np.arange(Q)
    valid = jq[None, :] < qlens[:, None]
    cols = np.arange(Q + 1, dtype=np.int64)
    row = np.concatenate(
        [np.zeros((B, 1), np.int64),
         np.broadcast_to((jq + 1) * gap, (B, Q))], axis=1).copy()
    for t_sym in template:
        sub = np.where(queries == t_sym, match, mismatch)
        sub = np.where(valid, sub, NEG)
        diag = row[:, :-1] + sub
        up = row[:, 1:] + gap
        cand = np.maximum(diag, up)
        base = np.concatenate([np.zeros((B, 1), cand.dtype), cand], axis=1)
        keyed = base - cols[None, :] * gap
        run = np.maximum.accumulate(keyed, axis=1)
        row = np.maximum(base, run + cols[None, :] * gap)
        row[:, 0] = 0
    return row[np.arange(B), qlens].astype(np.int32)


def semiglobal_scores_batch(template, queries_list, gap=-1, match=1,
                            mismatch=-1):
    """Scores of each query (list of int sequences) vs the linear template."""
    global _scores_fn

    if not queries_list:
        return np.zeros(0, dtype=np.int32)
    B = len(queries_list)
    Qmax = max(len(q) for q in queries_list)
    # forked EC workers (models/correct.run_error_correction_procs) must not
    # touch JAX — the parent's device client does not survive fork
    force_np = bool(os.environ.get("MDBG_ALIGN_FORCE_NP"))
    if force_np or B * len(template) * max(1, Qmax) < _NP_CUTOFF:
        qs = np.zeros((B, Qmax), dtype=np.uint64)
        qlens = np.zeros(B, dtype=np.int64)
        for i, q in enumerate(queries_list):
            qs[i, : len(q)] = np.asarray(q, dtype=np.uint64)
            qlens[i] = len(q)
        return _scores_np(np.asarray(template, dtype=np.uint64), qs, qlens,
                          gap, match, mismatch)
    import jax.numpy as jnp

    if _scores_fn is None:
        _scores_fn = _make_scores_fn()
    # coarse shape buckets (powers of two) so varying per-read candidate
    # counts and lengths hit a handful of compiled programs, not one each
    B = len(queries_list)
    Bp = max(8, 1 << (B - 1).bit_length())
    Q = max(16, 1 << (max(len(q) for q in queries_list) - 1).bit_length())
    T = max(16, 1 << (len(template) - 1).bit_length())
    qs = np.zeros((Bp, Q), dtype=np.uint64)
    qlens = np.zeros(Bp, dtype=np.int32)
    for i, q in enumerate(queries_list):
        qs[i, : len(q)] = np.asarray(q, dtype=np.uint64)
        qlens[i] = len(q)
    # padded template rows are masked no-ops inside the kernel (tvalid)
    t = np.full(T, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    t[: len(template)] = np.asarray(template, dtype=np.uint64)
    tvalid = np.zeros(T, dtype=np.bool_)
    tvalid[: len(template)] = True
    out = _scores_fn(jnp.asarray(t), jnp.asarray(tvalid), jnp.asarray(qs),
                     jnp.asarray(qlens), gap=gap, match=match,
                     mismatch=mismatch)
    return np.asarray(out)[:B]
