"""Small tools + filtered-scheme extraction semantics."""

import numpy as np

from rust_mdbg_tpu.models.schemes import CheckAndAddFilter, uhs_preparation
from rust_mdbg_tpu.ops.minimizers import extract_filtered_np
from rust_mdbg_tpu.ops.nthash import ntc64
from rust_mdbg_tpu.tools.hpc_compress import gfa_strip, hpc_compress
from rust_mdbg_tpu.utils.seq import encode_bases


def test_hpc_compress(tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_text(">a\nAAACCCGGGTTTN\n>b\nACGT\n")
    out = tmp_path / "out.fa"
    hpc_compress(str(fa), str(out))
    txt = out.read_text()
    assert ">a\nACGTN\n" in txt
    assert ">b\nACGT\n" in txt


def test_gfa_strip(tmp_path):
    g = tmp_path / "g.gfa"
    g.write_text("H\tVN:Z:1.0\nS\tx\tACGTACGT\tKC:i:5\nL\tx\t+\tx\t-\t2M\n")
    out = tmp_path / "s.gfa"
    gfa_strip(str(g), str(out))
    lines = out.read_text().splitlines()
    assert lines[1] == "S\tx\t*\tLN:i:8\tKC:i:5"
    assert lines[2].startswith("L\t")


def test_check_and_add_filter():
    f = CheckAndAddFilter()
    assert f.check_and_add(7) is False
    assert f.check_and_add(7) is True
    f.add(9)
    assert f.check_and_add(9) is True


def test_uhs_preparation_and_extraction(tmp_path):
    from rust_mdbg_tpu.params import Params

    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    p = Params(l=8, density=0.2)
    codes = encode_bases(seq)

    # filter preloaded with every l-mer of the read: every selected minimizer
    # passes on FIRST sight (hash already present)
    f = CheckAndAddFilter()
    for i in range(len(seq) - 8 + 1):
        f.add(ntc64(seq[i : i + 8], 8))
    pos, h = extract_filtered_np(codes, 8, p.hash_bound, f)
    from rust_mdbg_tpu.ops.minimizers import extract_density_np

    pos_d, h_d = extract_density_np(codes, 8, p.hash_bound)
    # filtered selection is a subset of density selection with HPC-space
    # positions (read.rs:151-152 pushes i, not the raw map)
    assert set(int(x) for x in h) <= set(int(x) for x in h_d)
    assert len(h) > 0

    # empty filter: keep-from-second-occurrence semantics
    f2 = CheckAndAddFilter()
    pos2, h2 = extract_filtered_np(codes, 8, p.hash_bound, f2)
    seen = set()
    expect = []
    for x in h_d:  # density selections in HPC order == same canon hashes
        if int(x) in seen:
            expect.append(int(x))
        seen.add(int(x))
    assert [int(x) for x in h2] == expect


def test_uhs_file_loader(tmp_path):
    f = tmp_path / "u.txt"
    f.write_text("ACGTACGTAC\nTTTTTTTTTT\nshort\n")

    class P:
        l = 10

    filt = uhs_preparation(P, str(f))
    assert filt.check_and_add(ntc64("ACGTACGTAC", 10)) is True
    assert filt.check_and_add(12345) is False


def test_cli_missing_input_friendly_error(capsys):
    from rust_mdbg_tpu.cli import main

    rc = main(["/nonexistent/reads.fa", "-k", "7", "-l", "10",
               "--density", "0.01"])
    assert rc == 2
    assert "not found" in capsys.readouterr().err
