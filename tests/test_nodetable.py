"""Native node table: add_kminmer crossing/abundance semantics (main.rs:632-709)."""

import numpy as np

from rust_mdbg_tpu.core.nodetable import NodeTable


def add_one(t, lo, hi, seqlen=100, s0=5, s1=7):
    f, i = t.add_batch(
        np.array([lo], dtype=np.uint64), np.array([hi], dtype=np.uint64),
        np.array([seqlen], dtype=np.uint32),
        np.array([s0], dtype=np.uint16), np.array([s1], dtype=np.uint16),
    )
    return int(f[0]), int(i[0])


def test_minabund2_crossing_on_second_sighting():
    t = NodeTable(min_abundance=2)
    f, i = add_one(t, 1, 2, seqlen=50)
    assert f == 0 and i == 0x80000000  # provisional: not yet crossed
    f, i = add_one(t, 1, 2, seqlen=60, s0=9, s1=11)
    assert f == 1 and i == 0  # crossing occurrence flagged, id assigned
    f, i = add_one(t, 1, 2, seqlen=70)
    assert f == 0
    d = t.dump()
    assert d["abundance"][0] == 3
    # seqlen/shift from the crossing (second) occurrence
    assert d["seqlen"][0] == 60 and d["shift0"][0] == 9 and d["shift1"][0] == 11


def test_minabund1_crossing_on_first():
    t = NodeTable(min_abundance=1)
    f, i = add_one(t, 5, 6, seqlen=33)
    assert f == 1 and i == 0
    f, _ = add_one(t, 5, 6, seqlen=44)
    assert f == 0
    assert t.dump()["seqlen"][0] == 33


def test_index_insertion_order():
    # never-crossed entries: dump renumbers provisional ids to a compact
    # range in insertion order
    t = NodeTable(min_abundance=2)
    for j in range(10):
        add_one(t, j + 100, j)
    d = t.dump()
    assert list(d["index"]) == list(range(10))


def test_index_crossing_order():
    # ids follow the min_abundance CROSSING order (the order the reference
    # writes .sequences records, main.rs:693-707), not first-occurrence
    t = NodeTable(min_abundance=2)
    add_one(t, 100, 0)           # A first occurrence
    add_one(t, 200, 0)           # B first occurrence
    f, i = add_one(t, 200, 0)    # B crosses first
    assert f == 1 and i == 0
    f, i = add_one(t, 100, 0)    # A crosses second
    assert f == 1 and i == 1
    d = t.dump()
    assert list(d["index"]) == [0, 1]
    assert list(d["key_lo"]) == [200, 100]


def test_bloom_screens_singletons():
    t = NodeTable(min_abundance=2, use_bf=True, bloom_log2_bits=20)
    f, i = add_one(t, 1, 2)
    assert i == 0xFFFFFFFF  # swallowed by bloom
    assert len(t) == 0
    f, i = add_one(t, 1, 2, seqlen=77)
    assert f == 1 and len(t) == 1  # second sighting inserts with abundance 2
    d = t.dump()
    assert d["abundance"][0] == 2 and d["seqlen"][0] == 77


def test_retain_filters():
    t = NodeTable(min_abundance=2)
    add_one(t, 1, 1)
    add_one(t, 2, 2)
    add_one(t, 2, 2)
    assert len(t) == 2
    t.retain(2)
    assert len(t) == 1
    d = t.dump()
    assert d["key_lo"][0] == 2
    # filtered nodes report 0 abundance (read_stats contract)
    ab = t.lookup_batch(np.array([1, 2], dtype=np.uint64),
                        np.array([1, 2], dtype=np.uint64))
    assert list(ab) == [0, 2]


def test_growth_many_keys():
    t = NodeTable(min_abundance=2, capacity_hint=16)
    rng = np.random.default_rng(0)
    lo = rng.integers(0, 2**63, 50000).astype(np.uint64)
    hi = rng.integers(0, 2**63, 50000).astype(np.uint64)
    ones16 = np.ones(50000, dtype=np.uint16)
    t.add_batch(lo, hi, np.ones(50000, dtype=np.uint32), ones16, ones16)
    t.add_batch(lo, hi, np.ones(50000, dtype=np.uint32), ones16, ones16)
    n_unique = len({(a, b) for a, b in zip(lo.tolist(), hi.tolist())})
    assert len(t) == n_unique
    d = t.dump()
    assert (d["abundance"] == 2).sum() == n_unique
