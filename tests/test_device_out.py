"""Recompute-path output emission: the native writer's rolling-ntHash
minimizer re-derivation and the device-computed GFA overlap fingerprints
must reproduce the vector-transfer path byte-for-byte (same .sequences
records, same GFA), since they replace the [n, k] u64 device->host vec
transfer on the density+already-HPC hot path (core/device_out.py)."""

import numpy as np
import pytest

from rust_mdbg_tpu.core.device_out import (emit_device_outputs,
                                           minimizer_recompute_ok)
from rust_mdbg_tpu.io.sequences import iter_sequences
from rust_mdbg_tpu.params import Params


def _small_run(tmp_path, tag, emit_keys):
    import jax.numpy as jnp

    from rust_mdbg_tpu.ops.extract import DeviceExtractor
    from rust_mdbg_tpu.ops.sort_count import (DeviceNodeCounter, counter_flags,
                                              make_fused_construct)
    from rust_mdbg_tpu.utils.seq import CODE_BASE

    p = Params(k=5, l=8, density=0.05, min_kmer_abundance=2, engine="device",
               batch_reads=8, reads_already_hpc=True)
    assert minimizer_recompute_ok(p)
    rng = np.random.default_rng(3)
    G = 40000
    genome = rng.integers(0, 4, G).astype(np.uint8)
    L = 2048
    B = 8
    n_reads = 32
    starts = rng.integers(0, G - L, n_reads)
    codes = np.stack([genome[s : s + L] for s in starts]).astype(np.uint8)
    lengths = np.full(n_reads, L, dtype=np.int32)

    dev = DeviceExtractor(p)
    M = dev.capacity(L)
    counter = DeviceNodeCounter(k=p.k, M=M, read_cap=n_reads,
                                node_cap=1 << 12, minab=2,
                                emit_overlap_keys=emit_keys, **counter_flags(p))
    construct = make_fused_construct(p, B, L, M, n_reads // B)
    bufs, _n, n_over = construct(jnp.asarray(codes), jnp.asarray(lengths),
                                 counter.buffers)
    counter.buffers = bufs
    assert int(np.asarray(n_over)) == 0
    nodes = counter.finalize(lazy=True)
    assert nodes.has("gk") == emit_keys
    prefix = str(tmp_path / tag)
    g = emit_device_outputs(prefix, p, nodes, CODE_BASE[genome],
                            starts.astype(np.int64))
    return prefix, g, nodes.n_pass


def test_recompute_path_matches_vector_path(tmp_path):
    pv, gv, nv = _small_run(tmp_path, "vecpath", emit_keys=False)
    pr, gr, nr = _small_run(tmp_path, "recpath", emit_keys=True)
    assert nr == nv and nr > 20
    assert gr == gv  # nb_nodes / nb_edges / presimp_removed

    rv = sorted(iter_sequences(pv), key=lambda r: r["index"])
    rr = sorted(iter_sequences(pr), key=lambda r: r["index"])
    assert len(rv) == len(rr) == nv
    assert rv == rr

    with open(pv + ".gfa", "rb") as f:
        gfa_v = f.read()
    with open(pr + ".gfa", "rb") as f:
        gfa_r = f.read()
    assert gfa_v == gfa_r


def test_recompute_gate():
    ok = Params(reads_already_hpc=True)
    assert minimizer_recompute_ok(ok)
    assert not minimizer_recompute_ok(Params(reads_already_hpc=False))
    assert not minimizer_recompute_ok(
        Params(reads_already_hpc=True, use_syncmers=True))
    assert not minimizer_recompute_ok(Params(reads_already_hpc=True, uhs=True))
    assert not minimizer_recompute_ok(
        Params(reads_already_hpc=True, has_lmer_counts=True))


def test_writer_recompute_direct(tmp_path):
    """Direct writer check on a hand-built record, forward and reverse: the
    recomputed minimizer text equals the host ntHash selection."""
    from rust_mdbg_tpu.io.sequences import write_records_native
    from rust_mdbg_tpu.ops.nthash import nthash_canonical_np
    from rust_mdbg_tpu.utils.seq import BASE_CODE, CODE_BASE, revcomp

    rng = np.random.default_rng(11)
    l, dens = 8, 0.08
    bound = min(int(float(dens) * float(2**64)), 2**64 - 1)
    # synthesize a read, take a window spanning k consecutive minimizers
    codes = rng.integers(0, 4, 4000).astype(np.uint8)
    canon = nthash_canonical_np(codes, l)
    sel = np.nonzero(canon <= np.uint64(bound))[0]
    k = 5
    assert len(sel) >= k + 2
    i0 = 1
    span = (int(sel[i0]), int(sel[i0 + k - 1]) + l)  # [start, last+l)
    vec = canon[sel[i0 : i0 + k]].astype(np.uint64)
    blob = CODE_BASE[codes]

    rel = (sel[i0 : i0 + k] - sel[i0]).astype(np.uint32)
    m = span[1] - span[0]
    for rev_flag, tag in ((0, "fwd"), (1, "rev")):
        v = vec[::-1] if rev_flag else vec
        mpos = ((m - l) - rel[::-1]).astype(np.uint32) if rev_flag else rel
        path = str(tmp_path / f"direct_{tag}.0.sequences")
        ref = str(tmp_path / f"ref_{tag}.0.sequences")
        pos = str(tmp_path / f"pos_{tag}.0.sequences")
        args = ([0], None, blob, [span[0]], [span[1]], [rev_flag], [3], [4])
        write_records_native(path, k, l, *args, hash_bound=bound, accel=3)
        argv = ([0], v[None, :], blob, [span[0]], [span[1]], [rev_flag],
                [3], [4])
        write_records_native(ref, k, l, *argv)
        # positions mode: same record from device-supplied record-space
        # positions (stored orientation), no rolling scan
        write_records_native(pos, k, l, *args, hash_bound=bound,
                             mpos=mpos[None, :])
        ra = list(iter_sequences(str(tmp_path / f"direct_{tag}")))
        rb = list(iter_sequences(str(tmp_path / f"ref_{tag}")))
        rc = list(iter_sequences(str(tmp_path / f"pos_{tag}")))
        assert ra == rb == rc and len(ra) == 1
        assert ra[0]["minimizers"] == tuple(int(x) for x in v)
        # positions-mode gate: a non-increasing position must fail loudly
        badp = mpos.copy()
        badp[1] = badp[0]
        with pytest.raises(RuntimeError, match="recompute"):
            write_records_native(str(tmp_path / "badp.0.sequences"), k, l,
                                 *args, hash_bound=bound, mpos=badp[None, :])


def test_writer_recompute_gate_violation(tmp_path):
    """A sequence that does not reproduce exactly k anchored minimizers must
    fail loudly (and remove the partial file), not write garbage."""
    from rust_mdbg_tpu.io.sequences import write_records_native

    blob = np.frombuffer(b"ACGTACGTACGTACGTACGTACGT", dtype=np.uint8)
    with pytest.raises(RuntimeError, match="recompute"):
        write_records_native(str(tmp_path / "bad.0.sequences"), 5, 8,
                             [0], None, blob, [0], [20], [0], [1], [1],
                             hash_bound=1, accel=1)
    import os

    assert not os.path.exists(str(tmp_path / "bad.0.sequences"))


def test_lz4_accel_roundtrip():
    from rust_mdbg_tpu.io.lz4f import compress, decompress

    rng = np.random.default_rng(7)
    data = bytes(rng.integers(65, 69, 3_000_000, dtype=np.uint8))
    for accel in (1, 4, 16):
        c = compress(data, accel=accel)
        assert decompress(c) == data


def test_phased_matches_single_shot(tmp_path):
    """Two-phase emission (prefix finalize + tail) must produce byte-identical
    .sequences records and GFA to the one-shot path: crossing-order ids make
    each phase an exact row range of the full finalize (ops/sort_count)."""
    import glob

    import jax.numpy as jnp

    from rust_mdbg_tpu.core.device_out import PhasedEmitter
    from rust_mdbg_tpu.ops.extract import DeviceExtractor
    from rust_mdbg_tpu.ops.sort_count import (DeviceNodeCounter, counter_flags,
                                              make_fused_construct)
    from rust_mdbg_tpu.utils.seq import CODE_BASE

    p = Params(k=5, l=8, density=0.05, min_kmer_abundance=2, engine="device",
               batch_reads=8, reads_already_hpc=True)
    rng = np.random.default_rng(7)
    G = 60000
    genome = rng.integers(0, 4, G).astype(np.uint8)
    L, B, n_reads = 2048, 8, 48
    n_batches = n_reads // B
    starts = rng.integers(0, G - L, n_reads)
    codes = np.stack([genome[s : s + L] for s in starts]).astype(np.uint8)
    lengths = np.full(n_reads, L, dtype=np.int32)
    dev = DeviceExtractor(p)
    M = dev.capacity(L)

    def build(tag, phased):
        counter = DeviceNodeCounter(k=p.k, M=M, read_cap=n_reads,
                                    node_cap=1 << 12, minab=2,
                                    emit_overlap_keys=True, **counter_flags(p))
        construct = make_fused_construct(p, B, L, M, n_batches)
        prefix = str(tmp_path / tag)
        if not phased:
            bufs, _n, over = construct(jnp.asarray(codes),
                                       jnp.asarray(lengths), counter.buffers)
            counter.buffers = bufs
            assert int(np.asarray(over)) == 0
            nodes = counter.finalize(lazy=True)
            g = emit_device_outputs(prefix, p, nodes, CODE_BASE[genome],
                                    starts.astype(np.int64))
            return prefix, g
        n1 = 2  # phase boundary: batches [0, 2) then [2, n_batches)
        bufs, _n, ov1 = construct(jnp.asarray(codes), jnp.asarray(lengths),
                                  counter.buffers, 0, 0, n1)
        counter.buffers = bufs
        prefix1 = n1 * B * counter.W_slot
        out1 = counter.finalize_dispatch(prefix_rows=prefix1)
        bufs, _n, ov2 = construct(jnp.asarray(codes), jnp.asarray(lengths),
                                  counter.buffers, 0, n1, n_batches)
        counter.buffers = bufs
        dj = str(phased).startswith("device_join")
        ph1 = counter.finalize_resolve(out1, lazy=True, prefix_rows=prefix1,
                                       gk_mode="none" if dj else "host")
        em = PhasedEmitter(prefix, p, CODE_BASE[genome],
                           starts.astype(np.int64), device_join=dj)
        em.emit_phase(ph1)
        assert int(np.asarray(ov1)) + int(np.asarray(ov2)) == 0
        nodes = counter.finalize(lazy=True, row_lo=ph1.n_pass,
                                 gk_mode="device" if dj else "host")
        assert nodes.n_pass >= ph1.n_pass > 0
        pot = counter.edge_join(nodes) if dj else None
        if dj:
            assert pot is not None  # no G-overflow on this corpus
        if phased == "device_join_fallback":
            pot = None  # simulate G-overflow: host km_index join fallback
        em.emit_phase(nodes)
        g = em.finish(nodes.fetch_full("count"), pot=pot)
        return prefix, g

    ps, gs = build("single", phased=False)
    pp, gp = build("phased", phased=True)
    pd, gd = build("devjoin", phased="device_join")
    pf, gf = build("devfall", phased="device_join_fallback")
    assert gs == gp == gd == gf
    assert (open(ps + ".gfa").read() == open(pp + ".gfa").read()
            == open(pd + ".gfa").read())
    rs = sorted(iter_sequences(ps), key=lambda r: r["index"])
    rp = sorted(iter_sequences(pp), key=lambda r: r["index"])
    rd = sorted(iter_sequences(pd), key=lambda r: r["index"])
    assert rs == rp == rd and len(rs) > 20
    # shard files stay glob-compatible
    assert glob.glob(pp + ".*.sequences")
