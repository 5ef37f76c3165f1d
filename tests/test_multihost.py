"""Real multi-process jax.distributed run == single-host pipeline.

Spawns N separate CLI processes (1 CPU device each) joined through a
localhost coordinator with Gloo collectives — the CPU stand-in for a
multi-host TPU pod over DCN.  Each process reads its byte-range share of a
plain FASTA, the all_to_all-sharded pipeline runs over the global mesh, each
host writes its own .sequences shard, and rank 0 writes the GFA.  Output
must be node-level identical (keyed by minimizer tuple) to the single-host
engine.
"""

import gzip
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from rust_mdbg_tpu.core.pipeline import assemble
from rust_mdbg_tpu.io.sequences import iter_sequences
from rust_mdbg_tpu.params import Params
from rust_mdbg_tpu.parallel.multihost import fasta_range_records

EXAMPLE = "/root/reference/example/reads-0.00.fa.gz"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _node_map(prefix):
    meta = {}
    for line in open(prefix + ".gfa"):
        if line.startswith("S"):
            v = line.rstrip().split("\t")
            meta[int(v[1])] = (int(v[4][5:]), int(v[3][5:]))
    out = {}
    for r in iter_sequences(prefix):
        out[r["minimizers"]] = meta[r["index"]] + (r["shift"],)
    return out


def test_fasta_range_records_partition(tmp_path):
    """Byte-range splits cover every record exactly once, any cut points."""
    rng = np.random.default_rng(3)
    path = str(tmp_path / "r.fa")
    recs = []
    with open(path, "w") as f:
        for i in range(83):
            seq = "".join("ACGT"[c] for c in rng.integers(0, 4,
                                                          rng.integers(5, 300)))
            recs.append((f"x{i}", seq.encode()))
            f.write(f">x{i} descr\n")
            for j in range(0, len(seq), 50):
                f.write(seq[j : j + 50] + "\n")
    size = os.path.getsize(path)
    from rust_mdbg_tpu.parallel.multihost import count_range_records

    for nproc in (1, 2, 3, 7):
        got = []
        for pid in range(nproc):
            step = (size + nproc - 1) // nproc
            lo, hi = pid * step, min(size, (pid + 1) * step)
            part = list(fasta_range_records(path, lo, hi))
            assert len(part) == count_range_records(path, lo, hi)
            got.extend(part)
        assert got == recs, nproc

    # cuts landing exactly ON a record's '>' byte (and one byte either
    # side): the boundary record must be owned by exactly one side
    starts = [0]
    data = open(path, "rb").read()
    i = data.find(b"\n>")
    while i >= 0:
        starts.append(i + 1)
        i = data.find(b"\n>", i + 1)
    for cut0 in (starts[3], starts[3] - 1, starts[3] + 1,
                 starts[40], starts[-1]):
        a = list(fasta_range_records(path, 0, cut0))
        b = list(fasta_range_records(path, cut0, size))
        assert a + b == recs, cut0
        assert len(a) == count_range_records(path, 0, cut0)
        assert len(b) == count_range_records(path, cut0, size)


@pytest.mark.slow
def test_multihost_two_processes(tmp_path):
    reads = str(tmp_path / "reads.fa")
    with open(reads, "wb") as out, gzip.open(EXAMPLE, "rb") as f:
        out.write(f.read())

    port = _free_port()
    prefix = str(tmp_path / "mh")
    procs = []
    # strip the axon trigger too: the sitecustomize it activates overrides
    # JAX_PLATFORMS=cpu and would put both subprocesses on the shared
    # remote TPU (slow, contended, and down whenever a kernel faulted it)
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS")}
    for pid in range(2):
        env = dict(env_base, JAX_PLATFORMS="cpu",
                   MDBG_COORD=f"127.0.0.1:{port}", MDBG_NPROCS="2",
                   MDBG_PROC_ID=str(pid),
                   PYTHONPATH=REPO + os.pathsep
                   + env_base.get("PYTHONPATH", ""))
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "rust_mdbg_tpu", reads, "-k", "7",
             "--density", "0.0008", "-l", "10", "--minabund", "2",
             "--multihost", "--engine", "device", "--batch-reads", "32",
             "--prefix", prefix],
            env=env, cwd=str(tmp_path), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    # The multihost GLOBAL row order interleaves the two hosts' byte-range
    # shares in B_host blocks per round, so for multi-locus (repeat)
    # k-min-mers the abundance-crossing occurrence — and with it the
    # recorded seqlen/shift/seq — can differ from a single-stream run.
    # That choice is nondeterministic in the reference itself (thread
    # arrival order, main.rs:696-699; SURVEY §7 hard-part e), so the exact
    # comparison target is a host run over the SAME interleaved order.
    size = os.path.getsize(reads)
    step = (size + 1) // 2
    shares = [list(fasta_range_records(reads, p_ * step,
                                       min(size, (p_ + 1) * step)))
              for p_ in range(2)]
    B_host = 16  # batch_reads 32 over 2 hosts
    inter = []
    r = 0
    while any(r * B_host < len(s) for s in shares):
        for s in shares:
            inter.extend(s[r * B_host : (r + 1) * B_host])
        r += 1
    reordered = str(tmp_path / "inter.fa")
    with open(reordered, "wb") as f:
        for name, seq in inter:
            f.write(b">" + name.encode() + b"\n" + seq + b"\n")

    ph = str(tmp_path / "host")
    p = Params(k=7, l=10, density=0.0008, min_kmer_abundance=2,
               engine="host")
    host_stats = assemble(reordered, p, ph)
    assert host_stats["nb_nodes"] == 104
    assert _node_map(prefix) == _node_map(ph)
    # and vs the ORIGINAL order: same node set and abundances — only the
    # per-node recorded occurrence may differ (repeat loci)
    ph2 = str(tmp_path / "host2")
    host2 = assemble(EXAMPLE, p, ph2)
    assert host2["nb_nodes"] == 104
    m_a, m_b = _node_map(prefix), _node_map(ph2)
    assert set(m_a) == set(m_b)
    assert {v: m_a[v][0] for v in m_a} == {v: m_b[v][0] for v in m_b}
