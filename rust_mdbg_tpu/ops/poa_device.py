"""Batched device POA semiglobal DP + traceback (SURVEY P6, deep).

The reference's hottest error-correction code is the per-candidate POA graph
alignment (/root/reference/src/poa.rs:781-874): a topological-order DP of
(graph nodes) x (query minimizers) run twice (fwd+rev) for up to 80
candidates per template.  models/poa.PoaGraph runs it as a host numpy
row-sweep; this module runs MANY (graph, query) pairs as one vmapped device
dispatch — lax.scan over topo positions, log-step max-scan for the
insertion closure, and a masked bounded-fori traceback that returns compact
op codes (the [N, M] kind/pred matrices never leave the device).

Exactness: bit-equal Alignments to PoaGraph._semiglobal_vec — same candidate
order [M(p0), D(p0), M(p1), D(p1), ...] with first-strict-max tie-breaking,
same strictly-greater insertion rule, same last-max terminal selection
(tests/test_poa_device.py fuzzes this).  Only gap_open == gap_extend scoring
is supported (the default; the reference's published runs never override it).

Graphs grow between candidates of one template (add_alignment), so batching
is ACROSS templates: models/correct.run_error_correction processes templates
in lockstep chunks — the device analog of the reference's crossbeam
thread-chunks (main.rs:855-883), which also align one candidate per
template concurrently.
"""

from __future__ import annotations

import functools

import numpy as np

MIN_SCORE = -858_993_459


def export_graph(graph, N: int, P: int):
    """PoaGraph -> padded arrays for the device DP.

    Returns (wts u64 [N], pred i32 [N, P], topo i32 [N], n, term u8 [N]).
    pred codes: >= 0 real predecessor node, -1 virtual source row
    (match-from-nowhere, poa.rs:829-834), -2 padding (MIN row).
    Raises ValueError when the graph exceeds N or P (caller rebuckets).
    """
    n = len(graph.weights)
    if n > N:
        raise ValueError("graph larger than bucket N")
    wts = np.zeros(N, dtype=np.uint64)
    wts[:n] = np.asarray(graph.weights, dtype=np.uint64)
    pred = np.full((N, P), -2, dtype=np.int32)
    for v in range(n):
        pv = graph.pred[v]
        if not pv:
            pred[v, 0] = -1
        else:
            if len(pv) > P:
                raise ValueError("in-degree exceeds bucket P")
            pred[v, : len(pv)] = pv
    topo = np.zeros(N, dtype=np.int32)
    order = graph.topo_order()
    topo[: len(order)] = order
    term = np.zeros(N, dtype=np.uint8)
    for v in range(n):
        if not graph.succ[v]:
            term[v] = 1
    return wts, pred, topo, n, term


def _cummax_i32(x):
    """Inclusive max-scan along the last axis (log-step doubling)."""
    import jax.numpy as jnp

    n = x.shape[-1]
    s = 1
    while s < n:
        pad = jnp.full(x.shape[:-1] + (s,), MIN_SCORE, dtype=x.dtype)
        x = jnp.maximum(x, jnp.concatenate([pad, x[..., :-s]], axis=-1))
        s <<= 1
    return x


def _dp_single(wts, pred, topo, n, term, q, qlen, *, N, P, M,
               ge, match, mismatch):
    """One (graph, query) pair; vmapped by poa_semiglobal_device.

    Score layout: row 0 = virtual source, rows 1..N = nodes, row N+1 = MIN
    sentinel (gathers for -2 pads), row N+2 = scratch (writes of invalid
    topo slots).  Columns 0..M.
    """
    import jax
    import jax.numpy as jnp

    R = N + 3
    cols = jnp.arange(M + 1, dtype=jnp.int32)
    score = jnp.zeros((R, M + 1), dtype=jnp.int32)
    score = score.at[0].set(cols * ge)           # query prefix gaps
    score = score.at[N + 1].set(MIN_SCORE)
    # kind: 0=M, 1=D, 2=I; predm: -1 None else node id
    kind = jnp.full((R, M + 1), jnp.int8(1), dtype=jnp.int8)   # col 0: D None
    kind = kind.at[0].set(jnp.int8(2))
    kind = kind.at[0, 0].set(jnp.int8(0))
    predm = jnp.full((R, M + 1), -1, dtype=jnp.int32)

    jcols = jnp.arange(M, dtype=jnp.int32)
    # query padded with all-ones sentinel (no ntHash minimizer equals it):
    # columns past qlen never reach the traceback, which starts at qlen
    qpad = jnp.where(jcols < qlen, q, ~jnp.uint64(0))

    def body(t, carry):
        score, kind, predm = carry
        node = topo[t]
        valid = t < n
        r = wts[node]
        sub = jnp.where(qpad == r, jnp.int32(match), jnp.int32(mismatch))
        pv = pred[node]                                  # [P]
        rowix = jnp.where(pv == -1, 0,
                          jnp.where(pv == -2, N + 1, pv + 1))
        prows = score[rowix]                             # [P, M+1]
        m_cand = prows[:, :M] + sub[None, :]             # [P, M]
        d_cand = prows[:, 1:] + jnp.int32(ge)
        # virtual source contributes M only; padding contributes nothing
        m_cand = jnp.where((pv == -2)[:, None], MIN_SCORE, m_cand)
        d_cand = jnp.where((pv < 0)[:, None], MIN_SCORE, d_cand)
        # interleave [M(p0), D(p0), M(p1), ...] and take the FIRST max
        stack = jnp.stack([m_cand, d_cand], axis=1).reshape(2 * P, M)
        arg = jnp.argmax(stack, axis=0)
        cand = jnp.take_along_axis(stack, arg[None, :], axis=0)[0]
        k_md = (arg & 1).astype(jnp.int8)
        psel = pv[arg >> 1]
        p_md = jnp.where(psel < 0, -1, psel)
        # insertion closure: row[j] = max over j' <= j of cand[j'] + (j-j')ge
        base = jnp.concatenate([jnp.zeros(1, jnp.int32), cand])
        keyed = _cummax_i32(base - cols * ge)
        row = keyed + cols * ge
        is_ins = row[1:] > cand                          # strictly greater
        krow = jnp.concatenate(
            [jnp.full(1, 1, jnp.int8),                   # col 0: ("D", None)
             jnp.where(is_ins, jnp.int8(2), k_md)])
        prow_ = jnp.concatenate(
            [jnp.full(1, -1, jnp.int32),
             jnp.where(is_ins, node, p_md)])
        wrow = jnp.where(valid, node + 1, N + 2)
        score = score.at[wrow].set(row)
        kind = kind.at[wrow].set(krow)
        predm = predm.at[wrow].set(prow_)
        return score, kind, predm

    score, kind, predm = jax.lax.fori_loop(
        0, N, body, (score, kind, predm))

    # terminal selection: last max among out-degree-0 real nodes at col qlen
    vals = score[1 : N + 1, :][:, qlen]
    niot = jnp.arange(N, dtype=jnp.int32)
    ok = (term == 1) & (niot < n)
    vals = jnp.where(ok, vals, MIN_SCORE)
    best = N - 1 - jnp.argmax(vals[::-1])                # last max wins
    best_s = vals[best]

    # traceback -> op codes (k, p, node) per step; -1 encodes None
    OPS = N + M
    ops_k = jnp.full(OPS, -1, dtype=jnp.int32)
    ops_p = jnp.full(OPS, -1, dtype=jnp.int32)
    ops_n = jnp.full(OPS, -1, dtype=jnp.int32)

    # BOUNDED traceback: a masked fori_loop over the OPS ceiling instead of
    # lax.while_loop — semantically identical under vmap (a vmapped while
    # runs until ALL lanes finish anyway), and while_loop is the primitive
    # that faults this environment's remote TPU worker (the syncmer Pallas
    # port hit the same; ROADMAP round-4 note).  Inactive lanes freeze
    # their (i, j) state, so their slots keep the -1 sentinel.
    def step(t, st):
        i, j, nops_, ok_, op_, on_ = st
        active = (i > 0) & (j > 0)
        k = kind[i, j].astype(jnp.int32)
        p = predm[i, j]
        ok_ = ok_.at[t].set(jnp.where(active, k, -1))
        op_ = op_.at[t].set(jnp.where(active, p, -1))
        on_ = on_.at[t].set(
            jnp.where(active, jnp.where(k == 2, p, i - 1), -1))
        has_p = p >= 0
        # M with pred: i=p+1, j-=1 | D with pred: i=p+1 | I with node: i=p+1,
        # j-=1 | M None: j-=1, STOP | D None: STOP | I None: i-=1, j-=1
        ni = jnp.where(has_p, p + 1, jnp.where(k == 2, i - 1, 0))
        nj = jnp.where(k == 1, j, j - 1)
        nj = jnp.where((k == 0) & ~has_p, j - 1, nj)
        ni = jnp.where((k <= 1) & ~has_p, 0, ni)         # stop flags
        return (jnp.where(active, ni, i), jnp.where(active, nj, j),
                nops_ + active.astype(jnp.int32), ok_, op_, on_)

    i0 = (best + 1).astype(jnp.int32)
    _, ystart, nops, ops_k, ops_p, ops_n = jax.lax.fori_loop(
        0, OPS, step, (i0, qlen.astype(jnp.int32), jnp.int32(0),
                       ops_k, ops_p, ops_n))
    return best_s, best, ystart, nops, ops_k, ops_p, ops_n


@functools.lru_cache(maxsize=None)
def _dp_batched(N, P, M, ge, match, mismatch):
    import jax

    f = functools.partial(_dp_single, N=N, P=P, M=M, ge=ge, match=match,
                          mismatch=mismatch)
    return jax.jit(jax.vmap(f))


def poa_semiglobal_device(graphs, queries, *, ge=-1, match=1, mismatch=-1):
    """Align queries[i] against graphs[i] (all pairs independent) on device;
    returns a list of models.poa.Alignment equal to graph.semiglobal(query).

    Pairs are bucketed to power-of-2 (N, P, M) shapes; oversized graphs
    (huge in-degree) raise ValueError — callers fall back to the host DP.
    """
    import jax.numpy as jnp

    from ..models.poa import Alignment

    G = len(graphs)
    assert G == len(queries)
    if G == 0:
        return []
    Nmax = Pmax = Mmax = 1
    for g in graphs:
        Nmax = max(Nmax, len(g.weights))
        Pmax = max(Pmax, max((len(p) for p in g.pred), default=1))
    for q in queries:
        Mmax = max(Mmax, len(q))

    def pow2(x, lo):
        c = lo
        while c < x:
            c <<= 1
        return c

    N, P, M = pow2(Nmax, 32), pow2(Pmax, 2), pow2(Mmax, 32)
    wts = np.zeros((G, N), dtype=np.uint64)
    pred = np.full((G, N, P), -2, dtype=np.int32)
    topo = np.zeros((G, N), dtype=np.int32)
    term = np.zeros((G, N), dtype=np.uint8)
    nn = np.zeros(G, dtype=np.int32)
    qarr = np.zeros((G, M), dtype=np.uint64)
    qlen = np.zeros(G, dtype=np.int32)
    for gi, (g, q) in enumerate(zip(graphs, queries)):
        wts[gi], pred[gi], topo[gi], nn[gi], term[gi] = export_graph(g, N, P)
        qlen[gi] = len(q)
        qarr[gi, : len(q)] = np.asarray(q, dtype=np.uint64)

    fn = _dp_batched(N, P, M, ge, match, mismatch)
    out = fn(jnp.asarray(wts), jnp.asarray(pred), jnp.asarray(topo),
             jnp.asarray(nn), jnp.asarray(term), jnp.asarray(qarr),
             jnp.asarray(qlen))
    best_s, _best, ystart, nops, ops_k, ops_p, ops_n = \
        (np.asarray(x) for x in out)

    res = []
    for gi in range(G):
        ops = []
        for t in range(int(nops[gi]) - 1, -1, -1):
            k = int(ops_k[gi, t])
            p = int(ops_p[gi, t])
            nd = int(ops_n[gi, t])
            if k == 0:
                ops.append(("M", None, None) if p < 0 else ("M", p, nd))
            elif k == 1:
                ops.append(("D", None, None) if p < 0 else ("D", p, nd))
            else:
                ops.append(("I", None) if p < 0 else ("I", p))
        res.append(Alignment(score=int(best_s[gi]), ystart=int(ystart[gi]),
                             operations=ops))
    return res
