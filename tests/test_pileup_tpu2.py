"""Sub-block grouped pileup kernel (v2) correctness (interpret mode)."""

import numpy as np
import pytest

from tests.synth import random_frags
from wgbs_tools_tpu.ops.pileup import pileup_xla
from wgbs_tools_tpu.ops.pileup_tpu2 import pileup_pallas_v2, stage_v2


def _compare(frags, ws, wl):
    got = pileup_pallas_v2(frags.start, frags.length, frags.count,
                           frags.codes, ws, wl, interpret=True)
    expect = pileup_xla(frags.start, frags.length, frags.count, frags.codes,
                        ws, wl)
    assert (got == expect).all()


def test_v2_small(rng):
    _compare(random_frags(rng, 400, 2000, max_len=12, h_rate=0.05), 1, 2000)


def test_v2_multi_tile(rng):
    _compare(random_frags(rng, 3000, 5000, max_len=20, dot_rate=0.1), 1, 5000)


def test_v2_offset_window(rng):
    _compare(random_frags(rng, 2000, 6000, max_len=16), 2500, 2048)


def test_v2_long_fragments_split(rng):
    # nanopore-length fragments exercise the host-side splitting path
    _compare(random_frags(rng, 300, 9000, max_len=400), 1, 9000)


def test_v2_tile_boundaries():
    from wgbs_tools_tpu.formats.pat import PatFrags, CODE_C

    starts = np.array([1020, 1023, 1024, 1151, 2047, 2048], dtype=np.int32)
    frags = PatFrags(starts, np.full(6, 10, np.int32),
                     np.arange(1, 7, dtype=np.int32),
                     np.full((6, 10), CODE_C, np.uint8),
                     np.zeros(6, np.int16), ["chr1"], None)
    _compare(frags, 1, 3000)


def test_v2_empty(rng):
    frags = random_frags(rng, 1, 100, max_len=3).take(np.zeros(0, np.int64))
    got = pileup_pallas_v2(frags.start, frags.length, frags.count,
                           frags.codes, 1, 1500, interpret=True)
    assert got.shape == (1500, 2)
    assert (got == 0).all()


def test_v2_staging_invariants(rng):
    frags = random_frags(rng, 5000, 20000, max_len=24)
    c0, c1, meta, words, mc = stage_v2(frags.start, frags.length, frags.count,
                                       frags.codes, 1, 20000)
    fc = meta.shape[2]
    from wgbs_tools_tpu.ops.pileup_tpu2 import G_MAX

    # padding row is reserved in every chunk (len 0, group G_MAX)
    assert (meta[:, 1, fc - 1] == G_MAX << 16).all()
    # dg within bounds; padded rows marked with G_MAX
    assert (meta[:, 1, :] >> 16).max() <= G_MAX
    assert (meta[:, 1, :] & 0xFFFF).max() <= 128
    # chunk ranges partition tiles monotonically
    assert (c1 >= c0).all()
