"""Pallas pileup kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

from tests.synth import random_frags
from wgbs_tools_tpu.ops.pileup import pileup_xla
from wgbs_tools_tpu.ops.pileup_tpu import pileup_pallas


def _compare(frags, window_start, window_len, **kw):
    expect = pileup_xla(
        frags.start, frags.length, frags.count, frags.codes,
        window_start, window_len,
    )
    got = pileup_pallas(
        frags.start, frags.length, frags.count, frags.packed(),
        window_start, window_len, interpret=True, **kw
    )
    assert got.shape == expect.shape
    assert (got == expect).all()


def test_pallas_small_window(rng):
    frags = random_frags(rng, 400, 2000, max_len=12, h_rate=0.05)
    _compare(frags, 1, 2000)


def test_pallas_multi_tile(rng):
    frags = random_frags(rng, 3000, 5000, max_len=20, dot_rate=0.1)
    _compare(frags, 1, 5000)


def test_pallas_offset_window(rng):
    frags = random_frags(rng, 2000, 6000, max_len=16)
    _compare(frags, 2500, 2048)


def test_pallas_tile_boundary_reads(rng):
    # fragments placed to straddle tile boundaries exactly
    from wgbs_tools_tpu.formats.pat import PatFrags, CODE_C

    starts = np.array([1020, 1023, 1024, 1025, 2047, 2048], dtype=np.int32)
    lengths = np.full(6, 10, dtype=np.int32)
    counts = np.ones(6, dtype=np.int32)
    codes = np.full((6, 10), CODE_C, dtype=np.uint8)
    frags = PatFrags(starts, lengths, counts, codes,
                     np.zeros(6, dtype=np.int16), ["chr1"], None)
    _compare(frags, 1, 3000)


def test_pallas_empty(rng):
    from tests.synth import random_frags

    frags = random_frags(rng, 1, 100, max_len=3)
    frags = frags.take(np.zeros(0, dtype=np.int64))
    got = pileup_pallas(
        frags.start, frags.length, frags.count, frags.packed(), 1, 1500,
        interpret=True,
    )
    assert got.shape == (1500, 2)
    assert (got == 0).all()
