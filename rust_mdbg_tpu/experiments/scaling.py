"""Multi-device scaling measurement -> SCALING.md (VERDICT r1 item 4).

Runs the full sharded assembly (extraction -> all_to_all key routing ->
per-shard device accumulation -> sharded finalize -> GFA) over virtual CPU
meshes of 1/2/4/8 devices on a fixed synthetic read set, plus the 2-process
`jax.distributed` multi-host flow, and writes a scaling table.

Virtual CPU devices share this host's physical cores, so the point of the
table is NOT absolute speed (that is bench.py on the real TPU chip): it
demonstrates that per-shard work and the single all_to_all partition
cleanly — node counts identical across mesh sizes, per-shard window volume
~1/n — and records the measured wall times for the record.

Run: python -m rust_mdbg_tpu.experiments.scaling [--out SCALING.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

GENOME_BP = 400_000
COVERAGE = 12
READ_LEN = 4_000


def synth(path: str, seed: int = 5) -> int:
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACTG", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, GENOME_BP)]
    n_reads = GENOME_BP * COVERAGE // READ_LEN
    with open(path, "wb") as f:
        for i in range(n_reads):
            s = int(rng.integers(0, GENOME_BP - READ_LEN))
            f.write(b">r%d\n" % i)
            f.write(genome[s : s + READ_LEN].tobytes())
            f.write(b"\n")
    return n_reads * READ_LEN


def run_mesh(reads: str, n: int) -> dict:
    """One assemble_sharded run in a fresh process (clean device config)."""
    code = f"""
import json, time, sys, os
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", {n})
cache = os.path.expanduser("~/.cache/rust_mdbg_tpu/jax")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from rust_mdbg_tpu.params import Params
from rust_mdbg_tpu.parallel.pipeline import assemble_sharded
p = Params(k=12, l=12, density=0.003, min_kmer_abundance=2,
           engine="device", batch_reads=8 * {n})
t0 = time.perf_counter()                       # includes compile
stats = assemble_sharded({reads!r}, p, {reads!r} + ".mesh{n}", n_devices={n})
t1 = time.perf_counter()
stats2 = assemble_sharded({reads!r}, p, {reads!r} + ".mesh{n}", n_devices={n})
t2 = time.perf_counter()
print(json.dumps(dict(n={n}, wall_s=round(t2 - t1, 2),
                      wall_cold_s=round(t1 - t0, 2),
                      nodes=stats["nb_nodes"], edges=stats["nb_edges"])))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_multihost(reads: str) -> dict | None:
    """2-process jax.distributed flow (one CPU device per process).  Two
    back-to-back assemblies in the SAME processes: the second is the warm
    wall (comparable to the mesh rows' warm wall — the first pays each
    process's independent XLA compiles)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = []
    t0 = time.perf_counter()
    for pid in range(2):
        code = f"""
import sys, os, time
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r})
import jax
cache = os.path.expanduser("~/.cache/rust_mdbg_tpu/jax")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from rust_mdbg_tpu.params import Params
from rust_mdbg_tpu.parallel.multihost import assemble_multihost, init_distributed
init_distributed("localhost:9777", 2, {pid})
p = Params(k=12, l=12, density=0.003, min_kmer_abundance=2,
           engine="device", batch_reads=16)
t0 = time.perf_counter()
stats = assemble_multihost({reads!r}, p, {reads!r} + ".mh")
t1 = time.perf_counter()
stats = assemble_multihost({reads!r}, p, {reads!r} + ".mh")
t2 = time.perf_counter()
print("WALLS", round(t1 - t0, 2), round(t2 - t1, 2))
print("NODES", stats.get("nb_nodes"), "EDGES", stats.get("nb_edges"))
"""
        procs.append(subprocess.Popen([sys.executable, "-c", code], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=3000)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            print("multihost failed:", out[-1500:], file=sys.stderr)
            return None
    nodes = edges = -1
    cold = warm = None
    for out in outs:
        for line in out.splitlines():
            if line.startswith("NODES") and "None" not in line:
                nodes, edges = int(line.split()[1]), int(line.split()[3])
            if line.startswith("WALLS"):
                cold, warm = float(line.split()[1]), float(line.split()[2])
    return dict(n="2 hosts", wall_s=warm, wall_cold_s=cold,
                nodes=nodes, edges=edges)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "SCALING.md"))
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        reads = os.path.join(td, "reads.fa")
        total = synth(reads)
        rows = []
        for n in (1, 2, 4, 8):
            r = run_mesh(reads, n)
            print(r, flush=True)
            rows.append(r)
        mh = run_multihost(reads)
        if mh:
            print(mh, flush=True)
            rows.append(mh)

    base = rows[0]["wall_s"]
    lines = [
        "# Multi-device scaling (virtual CPU mesh)",
        "",
        f"Full sharded assembly (`assemble_sharded` / `--mesh N`) of a fixed "
        f"{total/1e6:.0f} Mbp synthetic read set (k=12, l=12, d=0.003), "
        "virtual CPU devices, this 4-core host.  Warm wall excludes "
        "compile.  Node/edge counts must be identical across mesh sizes "
        "(exactness under sharding); speedup on shared cores is NOT the "
        "chip-scaling story — single-chip TPU throughput is bench.py / "
        "BENCH_r*.json, and per-shard device work scales 1/n by "
        "construction (one all_to_all per batch, see parallel/pipeline.py).",
        "",
        "| mesh | warm wall (s) | cold wall (s) | speedup | nodes | edges |",
        "|------|---------------|---------------|---------|-------|-------|",
    ]
    for r in rows:
        sp = f"{base / r['wall_s']:.2f}x" if r["wall_s"] else "-"
        lines.append(
            f"| {r['n']} | {r['wall_s']} | {r['wall_cold_s'] or '-'} | {sp} "
            f"| {r['nodes']} | {r['edges']} |")
    lines += [
        "",
        "Multi-host row: two OS processes, `jax.distributed` "
        "initialization, per-host byte-range sharded FASTA reading "
        "(`--multihost`; parallel/multihost.py), one device each.",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
