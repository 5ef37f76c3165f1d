"""Sharded-pipeline stress: window-cap growth, route overflow detection,
uneven shard loads (VERDICT r1 'multi-device testing is thin')."""

import numpy as np
import pytest

import jax

from rust_mdbg_tpu.core.pipeline import assemble
from rust_mdbg_tpu.io.sequences import iter_sequences
from rust_mdbg_tpu.params import Params
from rust_mdbg_tpu.parallel.mesh import make_mesh
from rust_mdbg_tpu.parallel.pipeline import make_sharded_pipeline


def _node_map(prefix):
    """minimizer tuple -> (abundance-class, LN, shift) for shard-order-
    independent node-level equality."""
    meta = {}
    for line in open(prefix + ".gfa"):
        if line.startswith("S"):
            v = line.rstrip().split("\t")
            meta[int(v[1])] = (int(v[4][5:]), int(v[3][5:]))
    return {r["minimizers"]: meta[r["index"]] + (r["shift"],)
            for r in iter_sequences(prefix)}


def _synth(tmp_path, n_reads=48, rl=800, seed=2, skew=False):
    """Random overlapping reads; skew=True makes read lengths wildly uneven
    so per-shard window counts differ round to round."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACTG", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, 12_000)]
    path = tmp_path / "reads.fa"
    with open(path, "wb") as f:
        for i in range(n_reads):
            n = rl if not skew else int(rng.integers(60, rl))
            s = int(rng.integers(0, len(genome) - n))
            f.write(b">r%d\n" % i)
            f.write(genome[s : s + n].tobytes())
            f.write(b"\n")
    return str(path)


def test_window_cap_growth_matches_host(tmp_path, monkeypatch):
    """Force the initial per-shard window_cap far below the need: the run
    must grow buffers (multiple rounds) and still match the host engine."""
    from rust_mdbg_tpu.parallel import pipeline as pp

    reads = _synth(tmp_path)
    p = Params(k=5, l=8, density=0.05, min_kmer_abundance=2,
               engine="device", batch_reads=8)
    host = assemble(reads, p.replace(engine="host"), str(tmp_path / "h"))

    orig = pp.make_sharded_pipeline

    def tiny_cap(mesh, params, B, L, M, window_cap, node_cap, route_cap=None):
        n = mesh.devices.size
        W = M - params.k + 1
        rc = max(64, (3 * (B // n) * W) // n)
        return orig(mesh, params, B, L, M, window_cap=2 * n * rc,
                    node_cap=node_cap, route_cap=rc)

    monkeypatch.setattr(pp, "make_sharded_pipeline", tiny_cap)
    stats = pp.assemble_sharded(reads, p, str(tmp_path / "s"), n_devices=4)
    assert stats["nb_nodes"] == host["nb_nodes"] > 0
    assert stats["nb_edges"] == host["nb_edges"]
    assert _node_map(str(tmp_path / "s")) == _node_map(str(tmp_path / "h"))


def test_route_overflow_detected(tmp_path):
    """A route_cap far below the per-owner volume must be REPORTED (dropped
    count), never silently truncated."""
    p = Params(k=4, l=8, density=0.5, min_kmer_abundance=1,
               engine="device", batch_reads=8)
    mesh = make_mesh(2)
    B, L, M = 8, 512, 320
    step, fin, make_buffers, shardings, recv = make_sharded_pipeline(
        mesh, p, B, L, M, window_cap=4096, node_cap=1 << 12, route_cap=64)
    buffers = make_buffers()
    rng = np.random.default_rng(0)
    codes = jax.device_put(rng.integers(0, 4, (B, L)).astype(np.uint8),
                           shardings[0])
    lengths = jax.device_put(np.full((B,), L, dtype=np.int32), shardings[1])
    blo, bhi, bm, bv, dropped, n_over = step(codes, lengths, *buffers,
                                             np.int32(0), np.uint32(0))
    assert int(np.asarray(dropped).reshape(-1)[0]) > 0


def test_uneven_shards_match_host(tmp_path):
    """Wildly uneven read lengths and a non-divisible final batch across a
    4-way mesh: node/edge/window counts equal the host engine."""
    from rust_mdbg_tpu.parallel.pipeline import assemble_sharded

    reads = _synth(tmp_path, n_reads=37, rl=1500, skew=True, seed=7)
    p = Params(k=5, l=8, density=0.05, min_kmer_abundance=2,
               engine="device", batch_reads=8)
    host = assemble(reads, p.replace(engine="host"), str(tmp_path / "h"))
    stats = assemble_sharded(reads, p, str(tmp_path / "s"), n_devices=4)
    assert stats["nb_nodes"] == host["nb_nodes"] > 0
    assert stats["nb_edges"] == host["nb_edges"]
    assert _node_map(str(tmp_path / "s")) == _node_map(str(tmp_path / "h"))


def _synth_err(tmp_path, n_reads, rl, seed, err=0.01, genome_bp=9000):
    """Errored overlapping reads, both strands: singleton-heavy node tables
    with multi-candidate key groups (presimp exercise)."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACTG", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, genome_bp)]
    comp = {65: 84, 67: 71, 71: 67, 84: 65}
    path = tmp_path / "err.fa"
    with open(path, "wb") as f:
        for i in range(n_reads):
            s = int(rng.integers(0, genome_bp - rl))
            r = genome[s : s + rl].copy()
            e = rng.random(rl) < err
            r[e] = bases[rng.integers(0, 4, int(e.sum()))]
            if rng.random() < 0.5:
                r = np.array([comp[c] for c in r[::-1]], dtype=np.uint8)
            f.write(b">e%d\n" % i)
            f.write(r.tobytes())
            f.write(b"\n")
    return str(path)


@pytest.mark.parametrize("n_devices,presimp", [(4, 0.01), (8, 0.6)])
def test_distributed_edges_byte_identical(tmp_path, monkeypatch, n_devices,
                                          presimp):
    """The distributed edge join (parallel/edges.py: key-owner all_to_all
    join + probe-owner all_to_all emission + removed-pair exchange) must
    write a BYTE-identical GFA to the gathered single-host km_index join on
    the same mesh run — including presimp removals and the deferred
    symmetric drop (presimp=0.6 forces removals on an errored corpus)."""
    from rust_mdbg_tpu.parallel.pipeline import assemble_sharded

    reads = _synth_err(tmp_path, n_reads=220, rl=700, seed=3)
    p = Params(k=5, l=8, density=0.05, min_kmer_abundance=2,
               engine="device", batch_reads=8, presimp=presimp)
    s_dist = assemble_sharded(reads, p, str(tmp_path / "d"),
                              n_devices=n_devices)
    assert s_dist.get("distributed_edges"), "distributed join did not run"
    monkeypatch.setenv("MDBG_SHARDED_EDGES", "0")
    s_host = assemble_sharded(reads, p, str(tmp_path / "g"),
                              n_devices=n_devices)
    assert open(tmp_path / "d.gfa").read() == open(tmp_path / "g.gfa").read()
    assert s_dist["nb_edges"] == s_host["nb_edges"]
    if presimp >= 0.5:
        assert s_dist["presimp_removed"] > 0, "presimp rule never fired"
    # and node-level equality with the host engine (id-relabel invariant)
    host = assemble(reads, p.replace(engine="host"), str(tmp_path / "h"))
    assert s_dist["nb_nodes"] == host["nb_nodes"] > 0
    assert s_dist["nb_edges"] == host["nb_edges"]
    assert _node_map(str(tmp_path / "d")) == _node_map(str(tmp_path / "h"))
