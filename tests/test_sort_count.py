"""Device-resident sort/segment counter == native host node table."""

import os

import numpy as np
import pytest

import jax

from rust_mdbg_tpu.core.extract import extract_windows_host
from rust_mdbg_tpu.core.nodetable import NodeTable
from rust_mdbg_tpu.ops.extract import DeviceExtractor
from rust_mdbg_tpu.ops.sort_count import (
    DeviceNodeCounter, counter_flags, make_fused_construct)
from rust_mdbg_tpu.params import Params


@pytest.mark.parametrize("minab", [1, 2, 3])
def test_counter_matches_host_table(minab):
    rng = np.random.default_rng(9)
    B, L = 8, 2048
    n_batches = 3
    p = Params(k=5, l=8, density=0.02, min_kmer_abundance=minab,
               engine="device", batch_reads=B)
    n_reads = B * n_batches
    codes = rng.integers(0, 4, (n_reads, L)).astype(np.uint8)
    codes[n_reads // 2 :] = codes[: n_reads - n_reads // 2]  # repeats
    lengths = np.full((n_reads,), L, dtype=np.int32)

    dev = DeviceExtractor(p)
    M = dev.capacity(L)
    W = M - p.k + 1
    counter = DeviceNodeCounter(k=p.k, M=M, read_cap=n_reads,
                                node_cap=1 << 14, minab=minab, **counter_flags(p))
    construct = make_fused_construct(p, B, L, M, n_batches)
    bufs, _n, n_over = construct(codes, lengths, counter.buffers)
    counter.buffers = bufs
    assert int(np.asarray(n_over)) == 0
    res = counter.finalize()

    # host oracle: windows through the native table in the same order
    table = NodeTable(min_abundance=minab)
    vecs_store = {}
    for bi in range(n_batches):
        class _B:
            pass

        b = _B()
        b.codes = codes[bi * B : (bi + 1) * B]
        b.lengths = lengths[:B]
        b.ids = [""] * B
        b.raw = []
        b.start_index = 0
        wb = extract_windows_host(b, p)
        flags, idx = table.add_batch(wb.key_lo, wb.key_hi, wb.seqlen,
                                     wb.shift0, wb.shift1)
        for j in np.nonzero(flags)[0]:
            vecs_store[int(idx[j])] = (
                wb.vecs[j], int(wb.seqlen[j]), int(wb.shift0[j]),
                int(wb.shift1[j]),
            )
    table.retain(minab)
    dump = table.dump()

    assert len(res["index"]) == len(dump["index"])
    # same key multiset with same counts
    host_counts = {
        (int(lo), int(hi)): int(c)
        for lo, hi, c in zip(dump["key_lo"], dump["key_hi"], dump["abundance"])
    }
    dev_counts = {
        (int(lo), int(hi)): int(c)
        for lo, hi, c in zip(res["key_lo"], res["key_hi"], res["count"])
    }
    assert dev_counts == host_counts
    # crossing-occurrence seqlen/shift match node for node
    host_meta = {
        (int(lo), int(hi)): (int(s), int(s0), int(s1))
        for lo, hi, s, s0, s1 in zip(
            dump["key_lo"], dump["key_hi"], dump["seqlen"],
            dump["shift0"], dump["shift1"],
        )
    }
    for i in range(len(res["index"])):
        key = (int(res["key_lo"][i]), int(res["key_hi"][i]))
        m = res["meta"][i]
        got = (int(m[0]), int(m[1] & 0x7FFFFFFF), int(m[2] & 0x7FFFFFFF))
        assert got == host_meta[key], key
    # vectors of crossing occurrences match
    host_vecs = {
        (int(lo), int(hi)): v[0]
        for (lo, hi), v in zip(
            ((dump["key_lo"][i], dump["key_hi"][i])
             for i in range(len(dump["index"]))),
            (vecs_store[int(i)] for i in dump["index"]),
        )
    }
    for i in range(len(res["index"])):
        key = (int(res["key_lo"][i]), int(res["key_hi"][i]))
        assert np.array_equal(res["vec"][i], host_vecs[key])


def test_finalize_adaptive_node_cap():
    """node_cap smaller than the unique-key count: finalize grows and
    retries instead of raising (VERDICT r1 robustness item)."""
    rng = np.random.default_rng(3)
    B, L = 8, 2048
    p = Params(k=5, l=8, density=0.05, min_kmer_abundance=1,
               engine="device", batch_reads=B)
    codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
    lengths = np.full((B,), L, dtype=np.int32)
    dev = DeviceExtractor(p)
    M = dev.capacity(L)

    def run(node_cap, pass_cap=None):
        counter = DeviceNodeCounter(k=p.k, M=M, read_cap=B,
                                    node_cap=node_cap, minab=1,
                                    pass_cap=pass_cap, **counter_flags(p))
        construct = make_fused_construct(p, B, L, M, 1)
        bufs, _n, n_over = construct(codes, lengths, counter.buffers)
        counter.buffers = bufs
        assert int(np.asarray(n_over)) == 0
        return counter.finalize(), counter

    big, _ = run(1 << 14)
    n_nodes = len(big["index"])
    assert n_nodes > 64
    small, c = run(16)           # forces repeated adaptive growth
    assert c.pass_cap >= n_nodes  # pass-centric finalize grows pass_cap
    assert np.array_equal(small["key_lo"], big["key_lo"])
    assert np.array_equal(small["count"], big["count"])
    tiny_pass, _ = run(1 << 14, pass_cap=8)  # pass_cap-only overflow
    assert np.array_equal(tiny_pass["key_lo"], big["key_lo"])


def test_batch_slot_compaction_matches_padded():
    """w_slot < W (batch-slot window compaction) produces identical finalize
    results to the full padded layout, and undersized slots are flagged."""
    from rust_mdbg_tpu.ops.sort_count import window_slot_capacity

    rng = np.random.default_rng(11)
    B, L = 8, 2048
    n_batches = 2
    p = Params(k=5, l=8, density=0.02, min_kmer_abundance=2,
               engine="device", batch_reads=B)
    n_reads = B * n_batches
    codes = rng.integers(0, 4, (n_reads, L)).astype(np.uint8)
    codes[n_reads // 2 :] = codes[: n_reads - n_reads // 2]
    lengths = np.full((n_reads,), L, dtype=np.int32)
    dev = DeviceExtractor(p)
    M = dev.capacity(L)
    W = M - p.k + 1

    def run(w_slot):
        counter = DeviceNodeCounter(k=p.k, M=M, read_cap=n_reads,
                                    node_cap=1 << 14, minab=2, w_slot=w_slot, **counter_flags(p))
        construct = make_fused_construct(p, B, L, M, n_batches, w_slot=w_slot)
        bufs, n_win, n_over = construct(codes, lengths, counter.buffers)
        counter.buffers = bufs
        return counter, int(np.asarray(n_win)), int(np.asarray(n_over))

    w_slot = window_slot_capacity(p, B, L, M)
    assert w_slot < W
    full_c, full_win, full_over = run(None)
    slot_c, slot_win, slot_over = run(w_slot)
    assert full_over == 0 and slot_over == 0
    assert full_win == slot_win > 0
    full = full_c.finalize()
    slot = slot_c.finalize()
    for name in ("key_lo", "key_hi", "count", "vec", "meta"):
        assert np.array_equal(full[name], slot[name]), name

    # chunk-mode reduction agrees too (occ coordinates identical)
    fch = full_c.finalize_chunk()
    sch = slot_c.finalize_chunk()
    for name in ("key_lo", "key_hi", "count"):
        assert np.array_equal(fch[name], sch[name]), name
    rows = np.arange(fch["n_unique"])
    for s in (1, 2):
        selv = np.minimum(fch["count"], s)  # slot s valid only if count >= s
        assert np.array_equal(full_c.occ_at_chunk(rows, selv),
                              slot_c.occ_at_chunk(rows, selv)), f"occ{s}"

    # a slot too small for the windows of one batch is counted as overflow
    _, _, n_over = run(8)
    assert n_over > 0


def test_device_bf_matches_oracle(tmp_path):
    """Device --bf (Bloom screen inside the fused construct,
    ops/sort_count._bloom_pass) must equal the host table's --bf EXACTLY —
    same single-hash bit formula (native/mdbg_core.cpp nt_add) => identical
    false-positive pattern, sequential in-batch visibility => identical
    crossing capture."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_oracle import oracle_assemble
    from test_ref_oracle import synth_reads, write_fasta, node_content, \
        oracle_content
    from rust_mdbg_tpu.core.pipeline import assemble_device_table
    from rust_mdbg_tpu.utils.timing import PhaseTimer

    rng = np.random.default_rng(42)
    reads = synth_reads(rng, 2500, genome_bp=12000, read_len=(8, 300))
    path = str(tmp_path / "r.fa")
    write_fasta(path, reads)
    k, l, d = 4, 10, 0.02
    table = oracle_assemble(reads, k=k, l=l, density=d, min_abundance=2,
                            use_bf=True, bloom_log2_bits=24,
                            exact_cuts=True)
    p = Params(k=k, l=l, density=d, engine="device", min_kmer_abundance=2,
               use_bf=True, bloom_log2_bits=24, batch_reads=256)
    prefix = str(tmp_path / "out")
    assemble_device_table(path, p, prefix, PhaseTimer(), {})
    assert node_content(prefix, p) == oracle_content(table)
