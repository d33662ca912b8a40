"""CSI index structure + query round trips."""

import numpy as np
import pytest

from tests.synth import random_frags
from wgbs_tools_tpu.formats.csi import csi_query, read_csi, reg2bin, reg2bins
from wgbs_tools_tpu.formats.pat import frags_to_bytes, write_pat


def test_reg2bin_level0():
    # whole-range interval maps to bin 0
    assert reg2bin([0], [1 << 30]).tolist() == [0]


def test_reg2bin_leaf_bins():
    # single positions land in leaf bins (offset 4681 for depth 5)
    t = ((1 << 15) - 1) // 7
    assert reg2bin([0], [1]).tolist() == [t]
    assert reg2bin([1 << 14], [(1 << 14) + 1]).tolist() == [t + 1]


def test_reg2bins_contains_record_bin(rng):
    for _ in range(50):
        v = int(rng.integers(0, 1 << 28))
        b = int(reg2bin([v], [v + 1])[0])
        lo = max(v - int(rng.integers(0, 1000)), 0)
        hi = v + 1 + int(rng.integers(0, 1000))
        assert b in reg2bins(lo, hi)


def test_csi_written_and_parsable(tmp_path, rng):
    frags = random_frags(rng, 3000, 80000, max_len=12)
    path = str(tmp_path / "x.pat.gz")
    write_pat(frags, path)
    csi = read_csi(path + ".csi")
    assert csi["min_shift"] == 14 and csi["depth"] == 5
    assert csi["names"] == frags.chrom_names
    assert csi["cols"] == (1, 2, 2)
    n_chunks = sum(len(c) for bins in csi["refs"]
                   for _, c in bins.values())
    assert n_chunks >= 1


def test_csi_query_matches_slice(tmp_path, rng):
    frags = random_frags(rng, 4000, 100000, max_len=10)
    path = str(tmp_path / "q.pat.gz")
    write_pat(frags, path)
    csi = read_csi(path + ".csi")
    for lo, hi in ((5000, 6000), (1, 50), (99000, 100001)):
        lines = csi_query(path, csi, "chr1", lo - 1, hi - 1)
        starts = sorted(int(l.split(b"\t")[1]) for l in lines)
        expect = sorted(
            int(s) for s in frags.start if lo <= s < hi
        )
        assert starts == expect, (lo, hi)
