"""Chunked >HBM counting path == whole-run paths, node for node.

The chunked driver (core/chunked.py) must produce the same node multiset
(key -> abundance, seqlen, shifts, sequence payload) and the same graph as
the host oracle and the whole-run device path, with chunk sizes forcing
multiple chunks and mid-chunk key straddling.
"""

import numpy as np
import pytest

from rust_mdbg_tpu.core.chunked import assemble_device_chunked
from rust_mdbg_tpu.core.pipeline import assemble
from rust_mdbg_tpu.io.sequences import iter_sequences
from rust_mdbg_tpu.params import Params

EXAMPLE = "/root/reference/example/reads-0.00.fa.gz"


def _node_content(prefix):
    """Node content keyed by minimizer vector (ids are path-dependent:
    the reference's are thread-arrival nondeterministic, main.rs:696-707)."""
    recs = {}
    for r in iter_sequences(prefix):
        recs[tuple(r["minimizers"])] = (r["seq"], r["shift"])
    return recs


def _gfa_node_set(prefix):
    """(LN, KC) multiset + edge count — id-invariant graph signature."""
    nodes = []
    edges = 0
    for line in open(prefix + ".gfa"):
        if line.startswith("S"):
            f = line.split("\t")
            nodes.append((f[3], f[4].strip()))
        elif line.startswith("L"):
            edges += 1
    return sorted(nodes), edges


def _gfa_bytes(prefix):
    return open(prefix + ".gfa", "rb").read()


@pytest.mark.parametrize("chunk_reads", [64, 256])
def test_chunked_matches_host(tmp_path, chunk_reads):
    ph = Params(k=7, l=10, density=0.0008, min_kmer_abundance=2,
                engine="host")
    pc = ph.replace(engine="device")
    pa = str(tmp_path / "host")
    pb = str(tmp_path / "chunk")
    assemble(EXAMPLE, ph, pa)
    assemble_device_chunked(EXAMPLE, pc, pb, chunk_reads=chunk_reads)
    # ids are crossing-occurrence-ordered on BOTH paths -> byte-identical
    assert _gfa_bytes(pa) == _gfa_bytes(pb)
    assert _node_content(pa) == _node_content(pb)


def test_chunked_bloom_matches_streaming_bloom(tmp_path):
    """--bf semantics through the chunk merge == the streaming add path."""
    ph = Params(k=7, l=10, density=0.0008, min_kmer_abundance=2,
                engine="host", use_bf=True, bloom_log2_bits=24)
    pc = ph.replace(engine="device")
    pa = str(tmp_path / "host")
    pb = str(tmp_path / "chunk")
    assemble(EXAMPLE, ph, pa)
    assemble_device_chunked(EXAMPLE, pc, pb, chunk_reads=128)
    assert _gfa_node_set(pa) == _gfa_node_set(pb)
    assert _node_content(pa) == _node_content(pb)


def test_chunked_matches_device_whole_run(tmp_path):
    from rust_mdbg_tpu.core.pipeline import assemble_device_table
    from rust_mdbg_tpu.utils.timing import PhaseTimer

    pd = Params(k=7, l=10, density=0.0008, min_kmer_abundance=2,
                engine="device")
    pa = str(tmp_path / "whole")
    pb = str(tmp_path / "chunk")
    assemble_device_table(EXAMPLE, pd, pa, PhaseTimer(), {})
    s = assemble_device_chunked(EXAMPLE, pd, pb, chunk_reads=192)
    assert s["nb_chunks"] >= 3
    assert _gfa_node_set(pa) == _gfa_node_set(pb)
    assert _node_content(pa) == _node_content(pb)


def test_chunked_recompute_mode_matches_host(tmp_path):
    """already-HPC density inputs take the slim fetch path (device GFA
    fingerprints + writer minimizer recompute, 65 B/node instead of 8k) —
    outputs must stay identical to the host oracle."""
    from rust_mdbg_tpu.core.device_out import minimizer_recompute_ok

    ph = Params(k=7, l=10, density=0.0008, min_kmer_abundance=2,
                engine="host", reads_already_hpc=True)
    pc = ph.replace(engine="device")
    assert minimizer_recompute_ok(pc)
    pa = str(tmp_path / "host")
    pb = str(tmp_path / "chunk")
    assemble(EXAMPLE, ph, pa)
    s = assemble_device_chunked(EXAMPLE, pc, pb, chunk_reads=192)
    assert s["nb_chunks"] >= 3
    assert _gfa_node_set(pa) == _gfa_node_set(pb)
    assert _node_content(pa) == _node_content(pb)


@pytest.mark.parametrize("minab,use_bf", [(3, False), (3, True), (5, False)])
def test_chunked_high_minabund_matches_host(tmp_path, minab, use_bf):
    """minabund >= 3: the chunk emission carries minab occurrence slots, so
    the crossing capture (and therefore .sequences payloads, seqlen/shift,
    and the GFA) stays exact — the round-2 gap (chunked was minabund <= 2
    only).  Small chunks force crossings to straddle chunk boundaries."""
    ph = Params(k=7, l=10, density=0.0008, min_kmer_abundance=minab,
                engine="host", use_bf=use_bf,
                bloom_log2_bits=24 if use_bf else 32)
    pc = ph.replace(engine="device")
    pa = str(tmp_path / "host")
    pb = str(tmp_path / "chunk")
    assemble(EXAMPLE, ph, pa)
    s = assemble_device_chunked(EXAMPLE, pc, pb, chunk_reads=128)
    assert s["nb_chunks"] >= 5
    assert s["nb_nodes"] > 0
    assert _gfa_node_set(pa) == _gfa_node_set(pb)
    assert _node_content(pa) == _node_content(pb)


def test_chunked_minabund_gate():
    from rust_mdbg_tpu.core.chunked import MAX_CHUNK_SLOTS

    p = Params(k=7, l=10, density=0.0008,
               min_kmer_abundance=MAX_CHUNK_SLOTS + 1, engine="device")
    with pytest.raises(RuntimeError, match="occurrence slots"):
        assemble_device_chunked(EXAMPLE, p, "/tmp/never", chunk_reads=128)


def test_chunked_device_join_byte_parity(tmp_path, monkeypatch):
    """Device catalog + POT join == host km_index join, byte for byte
    (ops/edge_join.DeviceKeyCatalog; reference semantics main.rs:1014-1106)."""
    p = Params(k=7, l=10, density=0.0008, min_kmer_abundance=2,
               engine="device", reads_already_hpc=True)
    pa = str(tmp_path / "hostjoin")
    pb = str(tmp_path / "devjoin")
    monkeypatch.setenv("MDBG_CHUNK_DEVICE_JOIN", "0")
    assemble_device_chunked(EXAMPLE, p, pa, chunk_reads=192)
    monkeypatch.setenv("MDBG_CHUNK_DEVICE_JOIN", "1")
    assemble_device_chunked(EXAMPLE, p, pb, chunk_reads=192)
    assert _gfa_bytes(pa) == _gfa_bytes(pb)
    assert _node_content(pa) == _node_content(pb)


def test_chunked_device_join_spill(tmp_path, monkeypatch):
    """A tiny catalog cap forces the mid-run spill to the host join; output
    must be unchanged."""
    p = Params(k=7, l=10, density=0.0008, min_kmer_abundance=2,
               engine="device", reads_already_hpc=True)
    pa = str(tmp_path / "full")
    pb = str(tmp_path / "spill")
    assemble_device_chunked(EXAMPLE, p, pa, chunk_reads=192)
    monkeypatch.setenv("MDBG_CHUNK_CAT_CAP", "40")  # < nodes of chunk 1
    assemble_device_chunked(EXAMPLE, p, pb, chunk_reads=192)
    assert _gfa_bytes(pa) == _gfa_bytes(pb)
    assert _node_content(pa) == _node_content(pb)
