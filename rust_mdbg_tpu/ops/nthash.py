"""ntHash v1 canonical rolling hash, reformulated for data-parallel hardware.

Parity target: the `nthash` crate used by the reference
(/root/reference/src/read.rs:2,196; /root/reference/Cargo.toml:26), i.e. ntHash v1:

    fh(i) = XOR_{j=0..l-1} rotl(H[s[i+j]], l-1-j)
    rh(i) = XOR_{j=0..l-1} rotl(RC[s[i+j]], j)
    canonical(i) = min(fh(i), rh(i))

with the published per-base seeds.  The reference consumes it as a sequential
rolling iterator; on TPU that recurrence is hostile (loop-carried scalar), so we
use the closed form above directly: for fixed l it is an XOR of l *constant*
rotations of the per-base seed array, each shifted by j — pure elementwise VPU
work with no loop-carried dependency and no variable-distance rotates, which XLA
fuses into a single pass (and which the Pallas kernel computes in VMEM registers).

`ntc64(seq)` (used by minimizers_preparation, /root/reference/src/minimizers.rs:90)
is the canonical hash of the whole string taken as one window.
"""

from __future__ import annotations

import numpy as np

# ntHash v1 per-base seeds (the published constants from the ntHash paper /
# C++ release, as used by the nthash crate the reference links against).
# Pinned by an external oracle vector in tests/test_nthash.py:
# ntf64(b"TGCAG", 0, 5) == 0x0bafa6728fc6dabf — a 5-mer covering all four
# bases, so a wrong seed or rotation schedule cannot reproduce it.
SEED_A = 0x3C8BFBB395C60474
SEED_C = 0x3193C18562A02B4C
SEED_G = 0x20323ED082572324
SEED_T = 0x295549F54BE24456
SEED_N = 0

# Indexed by base code (A=0 C=1 G=2 T=3 N=4 other=5). `other` hashes like N;
# the reference's nthash crate panics on non-ACGTN input instead, so this only
# diverges on inputs the reference cannot process at all.
H_BY_CODE = np.array([SEED_A, SEED_C, SEED_G, SEED_T, SEED_N, SEED_N], dtype=np.uint64)
# Complement seeds: RC[x] = H[complement(x)].
RC_BY_CODE = np.array([SEED_T, SEED_G, SEED_C, SEED_A, SEED_N, SEED_N], dtype=np.uint64)

_U64 = np.uint64


def _rotl_np(x: np.ndarray, r: int) -> np.ndarray:
    r &= 63
    if r == 0:
        return x
    return (x << _U64(r)) | (x >> _U64(64 - r))


def nthash_windows_np(codes: np.ndarray, l: int) -> tuple[np.ndarray, np.ndarray]:
    """(fh, rh) for every l-window of a 1-D base-code array.

    Returns arrays of length n-l+1 (empty if n < l).
    """
    codes = np.asarray(codes, dtype=np.uint8)
    n = codes.shape[0]
    if n < l:
        e = np.zeros(0, dtype=_U64)
        return e, e
    h = H_BY_CODE[codes]
    rc = RC_BY_CODE[codes]
    m = n - l + 1
    fh = np.zeros(m, dtype=_U64)
    rh = np.zeros(m, dtype=_U64)
    for j in range(l):
        fh ^= _rotl_np(h[j : j + m], l - 1 - j)
        rh ^= _rotl_np(rc[j : j + m], j)
    return fh, rh


def nthash_canonical_np(codes: np.ndarray, l: int) -> np.ndarray:
    fh, rh = nthash_windows_np(codes, l)
    return np.minimum(fh, rh)


def ntc64(seq: str | bytes, l: int | None = None) -> int:
    """Canonical ntHash of a whole string (nthash crate's `ntc64(s, 0, l)`)."""
    from ..utils.seq import encode_bases

    codes = encode_bases(seq)
    if l is None:
        l = len(codes)
    fh, rh = nthash_windows_np(codes[:l], l)
    return int(min(fh[0], rh[0]))


# --- JAX/XLA formulation ---------------------------------------------------

def nthash_windows_jax(codes, l: int):
    """Batched (fh, rh) over padded code tensors.

    codes: uint8 [..., L]. Returns (fh, rh) uint64 [..., L]; entry i is the hash
    of window [i, i+l) — positions with i+l > L wrap garbage and must be masked
    by the caller against the true sequence length (static shapes everywhere).
    """
    import jax.numpy as jnp

    h = jnp.asarray(H_BY_CODE)[codes]
    rc = jnp.asarray(RC_BY_CODE)[codes]
    L = codes.shape[-1]

    def rotl(x, r):
        r &= 63
        if r == 0:
            return x
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    def shifted(x, j):
        # x[..., i+j] with zero pad past the end
        if j == 0:
            return x
        pad = [(0, 0)] * (x.ndim - 1) + [(0, j)]
        return jnp.pad(x[..., j:], pad)

    fh = jnp.zeros_like(h)
    rh = jnp.zeros_like(h)
    for j in range(l):
        fh = fh ^ shifted(rotl(h, l - 1 - j), j)
        rh = rh ^ shifted(rotl(rc, j), j)
    return fh, rh
