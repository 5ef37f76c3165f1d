"""Native C++ FASTX parser vs the pure-Python oracle (io/fastx.py).

The native parser (native/fastx.cpp) must deliver byte-identical sequences,
ids, lengths and codes for every input shape the Python reader handles:
plain/.gz, FASTA with multi-line records and CRLF, FASTQ, and over-long
reads returned as singleton chunks (same contract as fastx.batches).
"""

import gzip
import random

import numpy as np
import pytest

from rust_mdbg_tpu.io import fastx
from rust_mdbg_tpu.io.fastx_native import NativeReader, chunks_prefetched
from rust_mdbg_tpu.utils.seq import BASE_CODE


def _random_fasta(path, n=57, minlen=20, maxlen=900, line_wrap=None,
                  crlf=False, gz=False, seed=0):
    rng = random.Random(seed)
    recs = []
    eol = b"\r\n" if crlf else b"\n"
    out = bytearray()
    for i in range(n):
        ln = rng.randint(minlen, maxlen)
        seq = bytes(rng.choice(b"ACGTNacgtn") for _ in range(ln))
        recs.append((f"read_{i}", seq))
        out += b">read_%d some description here" % i + eol
        if line_wrap:
            for j in range(0, ln, line_wrap):
                out += seq[j : j + line_wrap] + eol
        else:
            out += seq + eol
    data = bytes(out)
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)
    return recs


def _random_fastq(path, n=33, minlen=10, maxlen=400, gz=False, seed=1):
    rng = random.Random(seed)
    recs = []
    out = bytearray()
    for i in range(n):
        ln = rng.randint(minlen, maxlen)
        seq = bytes(rng.choice(b"ACGT") for _ in range(ln))
        recs.append((f"q{i}", seq))
        out += b"@q%d extra" % i + b"\n" + seq + b"\n+\n" + b"I" * ln + b"\n"
    data = bytes(out)
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)
    return recs


def _drain(path, chunk_reads, max_len):
    got = []
    rdr = NativeReader(path, chunk_reads, max_len)
    for c in rdr:
        for i in range(c.n):
            s = bytes(c.raw[c.raw_off[i] : c.raw_off[i + 1]])
            ln = int(c.lengths[i])
            assert ln == len(s)
            np.testing.assert_array_equal(
                c.codes[i, :ln],
                BASE_CODE[np.frombuffer(s, dtype=np.uint8)])
            got.append((c.id_str(i), s))
    rdr.close()
    return got


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("wrap,crlf", [(None, False), (60, False), (73, True)])
def test_fasta_parity(tmp_path, gz, wrap, crlf):
    p = str(tmp_path / ("r.fa" + (".gz" if gz else "")))
    recs = _random_fasta(p, line_wrap=wrap, crlf=crlf, gz=gz)
    assert _drain(p, chunk_reads=16, max_len=1024) == recs
    assert list(fastx.read_records(p)) == recs


@pytest.mark.parametrize("gz", [False, True])
def test_fastq_parity(tmp_path, gz):
    p = str(tmp_path / ("r.fq" + (".gz" if gz else "")))
    recs = _random_fastq(p, gz=gz)
    assert _drain(p, chunk_reads=7, max_len=512) == recs
    assert list(fastx.read_records(p)) == recs


@pytest.mark.parametrize("gz", [False, True])
def test_long_read_singleton(tmp_path, gz):
    """Reads past max_len come back as singleton chunks with widened codes."""
    p = str(tmp_path / ("r.fa" + (".gz" if gz else "")))
    recs = _random_fasta(p, n=9, minlen=30, maxlen=80, gz=gz, seed=3)
    # splice an over-long read into the middle of the file
    long_seq = bytes(random.Random(9).choice(b"ACGT") for _ in range(777))
    data = (gzip.open(p, "rb") if gz else open(p, "rb")).read()
    lines = data.split(b"\n")
    ins = b">big one\n" + long_seq + b"\n"
    data = b"\n".join(lines[:8]) + b"\n" + ins + b"\n".join(lines[8:])
    if gz:
        with gzip.open(p, "wb") as f:
            f.write(data)
    else:
        with open(p, "wb") as f:
            f.write(data)
    max_len = 256
    chunks = list(chunks_prefetched(p, 4, max_len))
    flat = []
    widths = []
    for c in chunks:
        widths.append(c.codes.shape[1])
        for i in range(c.n):
            flat.append((c.id_str(i),
                         bytes(c.raw[c.raw_off[i] : c.raw_off[i + 1]])))
    assert flat == list(fastx.read_records(p))
    big = [w for w in widths if w > max_len]
    assert big == [1024]  # 777 rounded up to a multiple of 256


def test_gz_window_growth(tmp_path):
    """A gz record larger than the initial window must still parse (window
    doubling in gz_refill)."""
    p = str(tmp_path / "r.fa.gz")
    seq = bytes(random.Random(4).choice(b"ACGT") for _ in range(100_000))
    with gzip.open(p, "wb") as f:
        f.write(b">huge\n")
        for j in range(0, len(seq), 80):
            f.write(seq[j : j + 80] + b"\n")
        f.write(b">tail\nACGTACGT\n")
    got = _drain(p, chunk_reads=4, max_len=200_000)
    assert got == [("huge", seq), ("tail", b"ACGTACGT")]


def test_raw_cap_short_chunks(tmp_path):
    """When the raw blob cap overflows, the parser returns short chunks and
    resumes cleanly."""
    p = str(tmp_path / "r.fa")
    recs = _random_fasta(p, n=40, minlen=500, maxlen=800, seed=5)
    rdr = NativeReader(p, chunk_reads=40, max_len=1024, mean_len_hint=0)
    rdr._raw_cap = 4096  # force overflow: ~6 reads per chunk
    got = []
    sizes = []
    for c in rdr:
        sizes.append(c.n)
        for i in range(c.n):
            got.append((c.id_str(i),
                        bytes(c.raw[c.raw_off[i] : c.raw_off[i + 1]])))
    rdr.close()
    assert got == recs
    assert len(sizes) > 1


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        NativeReader("/nonexistent/file.fa", 4, 128)


def test_pack_roundtrip():
    """2-bit pack/unpack roundtrip incl. N and pad codes (ops/pack)."""
    import numpy as np

    from rust_mdbg_tpu.ops.pack import pack_codes_np, unpack_codes_jax

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 6, (7, 64)).astype(np.uint8)  # 0..3, N=4, pad=5
    packed, mask = pack_codes_np(codes)
    assert packed.shape == (7, 16) and mask.shape == (7, 8)
    out = np.asarray(unpack_codes_jax(packed, mask))
    # N (4) and pad (5) round-trip DISTINCTLY: N is a real base to the HPC
    # rule (read.rs:163 compresses N runs), so collapsing it into pad would
    # shift minimizer positions on reads with NN runs
    assert np.array_equal(out, codes)
