import numpy as np
import pytest

from tests.oracle import run_oracle
from tests.synth import random_frags
from wgbs_tools_tpu.formats.pat import frags_to_bytes
from wgbs_tools_tpu.ops.pileup import pileup_frags, pileup_xla


def ref_pileup(frags, start, end):
    """Run the reference stdin2beta oracle on the same fragments."""
    out = run_oracle("stdin2beta", [start, end], frags_to_bytes(frags))
    return np.array(out.split(), dtype=np.int64).reshape(-1, 2)


def numpy_pileup(frags, start, end):
    """Direct numpy emulation of stdin2beta.cpp:59-93."""
    n = end - start
    meth = np.zeros(n, dtype=np.int64)
    cov = np.zeros(n, dtype=np.int64)
    for i in range(frags.nr_frags):
        s, l, c = int(frags.start[i]), int(frags.length[i]), int(frags.count[i])
        for j in range(l):
            idx = s - start + j
            if not 0 <= idx < n:
                continue
            code = frags.codes[i, j]
            if code == 3:
                continue
            cov[idx] += c
            if code in (1, 2):
                meth[idx] += c
    return np.stack([meth, cov], axis=1)


def test_pileup_xla_matches_numpy(rng):
    frags = random_frags(rng, 800, 5000, max_len=14, h_rate=0.1)
    got = pileup_xla(frags.start, frags.length, frags.count, frags.codes, 1, 5000)
    expect = numpy_pileup(frags, 1, 5001)
    assert (got == expect).all()


def test_pileup_window_edges(rng):
    frags = random_frags(rng, 500, 3000, max_len=10)
    # window strictly inside: reads crossing both edges must clip correctly
    got = pileup_xla(frags.start, frags.length, frags.count, frags.codes, 1000, 500)
    expect = numpy_pileup(frags, 1000, 1500)
    assert (got == expect).all()


def test_pileup_matches_reference_oracle(rng):
    frags = random_frags(rng, 1500, 8000, max_len=16, h_rate=0.05)
    start, end = 1, 8001
    expect = ref_pileup(frags, start, end)
    got = pileup_xla(
        frags.start, frags.length, frags.count, frags.codes, start, end - start
    )
    assert got.shape == expect.shape
    assert (got == expect).all()


def test_pileup_oracle_subwindow(rng):
    frags = random_frags(rng, 1000, 6000, max_len=12)
    start, end = 2000, 4000
    expect = ref_pileup(frags, start, end)
    got = np.asarray(
        pileup_frags(frags, (start, end), backend="xla")
    )
    assert (got == expect).all()


def test_pileup_batched_accumulation(rng):
    frags = random_frags(rng, 2000, 4000, max_len=8)
    full = pileup_xla(frags.start, frags.length, frags.count, frags.codes, 1, 4000)
    batched = pileup_xla(
        frags.start, frags.length, frags.count, frags.codes, 1, 4000, batch=333
    )
    assert (full == batched).all()
