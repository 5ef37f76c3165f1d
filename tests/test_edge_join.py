"""Device edge join (ops/edge_join) == host km_index join, byte-identical.

The host join is native/gfawriter.cpp finish_impl (itself pinned against
core/graph.build_gfa and the reference semantics main.rs:1014-1106 by
test_graph_gfa).  These tests pin the device sort-join + POT-list finish
(gfa_finish_pot) against it on synthetic node sets that exercise chains,
repeats (multi-candidate groups), palindromic overlaps, presimp drops and
the symmetric-drop rule, plus the padding mask and the G-overflow report.
"""

import numpy as np

from rust_mdbg_tpu.core.graph import IncrementalGFA, _overlap_keys


def _canon_rows(varr):
    """Host KmerVec::normalize over rows."""
    out = np.empty_like(varr)
    for t, v in enumerate(varr):
        r = v[::-1]
        out[t] = r if tuple(v) >= tuple(r) else v
    return out


def _synth_nodes(rng, n, k, repeat_every=0):
    """Chain walk with optional repeated segments (shared overlap keys)."""
    walk = rng.integers(1, 1 << 62, n + k - 1, dtype=np.uint64)
    if repeat_every:
        # splice earlier windows back in to create multi-candidate keys
        for t in range(repeat_every, n, repeat_every):
            src = rng.integers(0, max(1, t - 1))
            walk[t : t + k] = walk[src : src + k]
    varr = np.stack([walk[t : t + k] for t in range(n)])
    return _canon_rows(varr)


def _gfa_host(tmp_path, name, varr, ab, seqlen, s0, s1, presimp):
    g = IncrementalGFA(cap_hint=len(varr), defer_abundance=True)
    idx = np.arange(len(varr), dtype=np.uint32)
    g.add_chunk(idx, np.zeros_like(idx), seqlen, s0, s1,
                _overlap_keys(varr))
    g.set_abundance(ab)
    path = str(tmp_path / f"{name}.gfa")
    stats = g.finish(path, presimp=presimp)
    return open(path, "rb").read(), stats


def _gfa_device(tmp_path, name, varr, ab, seqlen, s0, s1, presimp, pad_to=0):
    import jax
    import jax.numpy as jnp

    from rust_mdbg_tpu.ops.edge_join import edge_join_device
    from rust_mdbg_tpu.ops.sort_count import _overlap_keys_device

    n = len(varr)
    v = jnp.asarray(varr)
    if pad_to > n:  # garbage padding rows must be masked out by n_pass
        pad = jnp.asarray(
            np.arange(1, (pad_to - n) * varr.shape[1] + 1, dtype=np.uint64)
            .reshape(pad_to - n, varr.shape[1]))
        v = jnp.concatenate([v, pad])
    gk, gflag = jax.jit(_overlap_keys_device)(v)
    cap = 64
    while True:
        out = edge_join_device(gk, gflag, jnp.int32(n), edge_cap=cap)
        n_pot, g_over = (int(x) for x in np.asarray(out["stats2"]))
        if n_pot <= cap:
            break
        cap *= 2
    assert g_over == 0
    pot_i = np.asarray(out["pot_i"])[:n_pot]
    pot_j = np.asarray(out["pot_j"])[:n_pot]
    pot_c = np.asarray(out["pot_c"])[:n_pot]
    g = IncrementalGFA(cap_hint=n, defer_abundance=True)
    idx = np.arange(n, dtype=np.uint32)
    g.add_chunk(idx, np.zeros_like(idx), seqlen, s0, s1, None)
    g.set_abundance(ab)
    path = str(tmp_path / f"{name}.gfa")
    stats = g.finish_pot(path, presimp=presimp, pot_i=pot_i, pot_j=pot_j,
                         pot_c=pot_c)
    return open(path, "rb").read(), stats


def _roundtrip(tmp_path, rng, n, k, repeat_every, presimp, pad_to=0,
               ab_lo=1, ab_hi=60):
    varr = _synth_nodes(rng, n, k, repeat_every)
    ab = rng.integers(ab_lo, ab_hi, n).astype(np.uint32)
    seqlen = rng.integers(k + 2, 4000, n).astype(np.uint32)
    s0 = rng.integers(0, 300, n).astype(np.uint16)
    s1 = rng.integers(0, 300, n).astype(np.uint16)
    a, sa = _gfa_host(tmp_path, f"h{n}{repeat_every}", varr, ab, seqlen,
                      s0, s1, presimp)
    b, sb = _gfa_device(tmp_path, f"d{n}{repeat_every}", varr, ab, seqlen,
                        s0, s1, presimp, pad_to=pad_to)
    assert sa["nb_edges"] == sb["nb_edges"]
    assert sa["presimp_removed"] == sb["presimp_removed"]
    assert a == b
    return sa


def test_chain_no_repeats(tmp_path):
    rng = np.random.default_rng(1)
    s = _roundtrip(tmp_path, rng, n=500, k=7, repeat_every=0, presimp=0.01)
    assert s["nb_edges"] > 400  # the chain joins


def test_repeats_multi_candidate_groups(tmp_path):
    rng = np.random.default_rng(2)
    s = _roundtrip(tmp_path, rng, n=400, k=5, repeat_every=13, presimp=0.01,
                   pad_to=512)
    assert s["nb_edges"] > 0


def test_presimp_drops_and_symmetric_rule(tmp_path):
    # abundance 1 next to abundance >100/presimp forces presimp removals
    rng = np.random.default_rng(3)
    s = _roundtrip(tmp_path, rng, n=300, k=5, repeat_every=7, presimp=0.2,
                   ab_lo=1, ab_hi=2000)
    assert s["presimp_removed"] > 0


def test_palindromic_overlap(tmp_path):
    rng = np.random.default_rng(4)
    k = 5
    base = rng.integers(1, 1 << 62, 4, dtype=np.uint64)
    pal = np.concatenate([base[:2], base[:2][::-1]])  # suffix == its reverse
    walk = np.concatenate([rng.integers(1, 1 << 62, 3, dtype=np.uint64),
                           pal, rng.integers(1, 1 << 62, 8, dtype=np.uint64)])
    n = len(walk) - k + 1
    varr = _canon_rows(np.stack([walk[t : t + k] for t in range(n)]))
    ab = np.full(n, 5, dtype=np.uint32)
    seqlen = np.full(n, 100, dtype=np.uint32)
    s0 = np.full(n, 3, dtype=np.uint16)
    s1 = np.full(n, 4, dtype=np.uint16)
    a, sa = _gfa_host(tmp_path, "hp", varr, ab, seqlen, s0, s1, 0.01)
    b, sb = _gfa_device(tmp_path, "dp", varr, ab, seqlen, s0, s1, 0.01)
    assert a == b and sa == sb


def test_g_overflow_reported(tmp_path):
    import jax
    import jax.numpy as jnp

    from rust_mdbg_tpu.ops.edge_join import G_SLOTS, edge_join_device
    from rust_mdbg_tpu.ops.sort_count import _overlap_keys_device

    rng = np.random.default_rng(5)
    k = 5
    # one window repeated far beyond G_SLOTS: its key group overflows
    seg = rng.integers(1, 1 << 62, k, dtype=np.uint64)
    walk = np.concatenate([np.tile(seg, G_SLOTS + 4),
                           rng.integers(1, 1 << 62, 8, dtype=np.uint64)])
    n = len(walk) - k + 1
    varr = _canon_rows(np.stack([walk[t : t + k] for t in range(n)]))
    gk, gflag = jax.jit(_overlap_keys_device)(jnp.asarray(varr))
    out = edge_join_device(gk, gflag, jnp.int32(n), edge_cap=1 << 14)
    _, g_over = (int(x) for x in np.asarray(out["stats2"]))
    assert g_over > 0
