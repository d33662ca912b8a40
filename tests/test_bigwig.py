import numpy as np
import pytest

from wgbs_tools_tpu.formats.bigwig import read_bigwig, write_bigwig


def test_roundtrip_small(tmp_path):
    path = str(tmp_path / "x.bw")
    chrom_sizes = [("chr1", 100000), ("chr2", 50000)]
    rng = np.random.default_rng(0)
    data = {}
    for c, size in chrom_sizes:
        starts = np.sort(rng.choice(size - 2, size=500, replace=False))
        ends = starts + 2
        vals = rng.random(500).astype(np.float32)
        data[c] = (starts, ends, vals)
    write_bigwig(path, chrom_sizes, data)
    got, summary = read_bigwig(path)
    for c in data:
        assert (got[c][0] == data[c][0]).all()
        assert (got[c][1] == data[c][1]).all()
        assert np.allclose(got[c][2], data[c][2])
    assert summary["valid"] == 2 * 1000
    assert 0 <= summary["min"] <= summary["max"] <= 1


def test_roundtrip_many_sections(tmp_path):
    # force a two-level R-tree (> BLOCK_SIZE sections)
    path = str(tmp_path / "big.bw")
    n = 1024 * 300  # 300 sections
    starts = np.arange(n, dtype=np.int64) * 3
    ends = starts + 2
    vals = np.linspace(0, 1, n).astype(np.float32)
    chrom_sizes = [("chr1", int(ends[-1]) + 10)]
    write_bigwig(path, chrom_sizes, {"chr1": (starts, ends, vals)})
    got, _ = read_bigwig(path)
    assert (got["chr1"][0] == starts).all()
    assert np.allclose(got["chr1"][2], vals)


def test_beta2bw_cli(tmp_path, mini_genome):
    from tests.synth import random_beta
    from wgbs_tools_tpu.cli.main import main as cli_main
    from wgbs_tools_tpu.formats.beta import save_beta

    rng = np.random.default_rng(5)
    data = random_beta(rng, mini_genome.get_nr_sites(), max_cov=30)
    beta = str(tmp_path / "s.beta")
    save_beta(beta, data)
    assert cli_main(["beta2bw", beta, "-o", str(tmp_path), "--cov"]) == 0
    got, summary = read_bigwig(str(tmp_path / "s.bigwig"))
    assert "chr1" in got
    idx = mini_genome.index
    # spot-check one site value
    starts, ends, vals = got["chr1"]
    site = int(np.searchsorted(idx.chrom_loci("chr1"), starts[0] + 1))
    row = data[site]
    assert abs(vals[0] - row[0] / row[1]) < 1e-6
