#!/usr/bin/env python
"""Native .sequences writer CPU: vecs vs recompute, accel sweep (host only)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    from rust_mdbg_tpu.io.sequences import write_records_native
    from rust_mdbg_tpu.ops.nthash import nthash_canonical_np
    from rust_mdbg_tpu.utils.seq import CODE_BASE

    rng = np.random.default_rng(0)
    l, k, dens = 14, 21, 0.003
    bound = min(int(float(dens) * float(2**64)), 2**64 - 1)
    G = 20_000_000
    genome = rng.integers(0, 4, G).astype(np.uint8)
    blob = CODE_BASE[genome]
    canon = nthash_canonical_np(genome, l)
    sel = np.nonzero(canon <= np.uint64(bound))[0]
    n_nodes = 121_000
    # windows of k consecutive minimizers, sampled across the genome
    max_i = len(sel) - k - 1
    idx0 = np.sort(rng.integers(0, max_i, n_nodes))
    starts = sel[idx0]
    ends = sel[idx0 + k - 1] + l
    vecs = np.stack([canon[sel[i : i + k]] for i in idx0]).astype(np.uint64)
    rev = (rng.random(n_nodes) < 0.5).astype(np.uint8)
    # canonical-orientation storage: reverse vec where rev (seq revcomp'd by writer)
    vecs[rev == 1] = vecs[rev == 1][:, ::-1]
    index = np.arange(n_nodes, dtype=np.uint32)
    s0 = np.ones(n_nodes, dtype=np.uint16)
    s1 = np.ones(n_nodes, dtype=np.uint16)
    seq_mb = float((ends - starts).sum()) / 1e6
    print(f"nodes={n_nodes} seq={seq_mb:.0f} MB")

    def t(tag, vv, accel):
        path = f"/tmp/mdbg_bench/w_{tag}.0.sequences"
        os.makedirs("/tmp/mdbg_bench", exist_ok=True)
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            write_records_native(path, k, l, index, vv, blob,
                                 starts.astype(np.int64),
                                 ends.astype(np.int64), rev, s0, s1,
                                 hash_bound=bound, accel=accel)
            best = min(best, time.perf_counter() - t0)
        sz = os.path.getsize(path) / 1e6
        print(f"{tag:22s} accel={accel:2d}: {best:.2f} s "
              f"({seq_mb/best:.0f} MB/s in) out={sz:.0f} MB")

    for accel in (1, 4, 12):
        t("vecs", vecs, accel)
    for accel in (1, 4, 12):
        t("recompute", None, accel)


if __name__ == "__main__":
    main()
