import numpy as np
import pytest

from tests.oracle import run_oracle
from tests.synth import random_frags
from wgbs_tools_tpu.formats.pat import (
    CODE_DOT,
    frags_to_bytes,
    parse_pat_bytes,
)
from wgbs_tools_tpu.ops.frag_ops import (
    filter_by_blocks,
    homog_counts,
    mask_sites,
    sample_frags,
    strip_frags,
)


def make_blocks(rng, n_blocks, nr_sites, min_len=2, max_len=30):
    starts = np.sort(rng.choice(np.arange(1, nr_sites), size=n_blocks, replace=False))
    lens = rng.integers(min_len, max_len, size=n_blocks)
    ends = starts + lens
    # enforce non-overlapping sorted blocks
    for i in range(1, n_blocks):
        starts[i] = max(starts[i], ends[i - 1])
        ends[i] = max(ends[i], starts[i] + 1)
    return starts.astype(np.int64), ends.astype(np.int64)


def write_blocks_bed(tmp_path, starts, ends, name="blocks.bed"):
    p = tmp_path / name
    with open(p, "w") as f:
        for s, e in zip(starts.tolist(), ends.tolist()):
            f.write(f"chr1\t{s * 10}\t{e * 10}\t{s}\t{e}\n")
    return str(p)


def norm(text):
    return sorted(l for l in text.split(b"\n") if l)


# ----------------------------------------------------------------- strip


def test_strip():
    f = parse_pat_bytes(b"chr1\t10\t..CT.C..\t2\nchr1\t20\t....\t1\nchr1\t5\tCT\t3\n")
    out = strip_frags(f)
    assert frags_to_bytes(out) == b"chr1\t12\tCT.C\t2\nchr1\t5\tCT\t3\n"


# ----------------------------------------------------------------- cview


@pytest.mark.parametrize("strict,strip,min_cpgs", [
    (False, False, 1),
    (True, False, 1),
    (True, True, 1),
    (True, False, 3),
    (False, False, 2),
])
def test_filter_by_blocks_vs_cview(tmp_path, rng, strict, strip, min_cpgs):
    frags = random_frags(rng, 800, 4000, max_len=12, dot_rate=0.15)
    bs, be = make_blocks(rng, 25, 4000)
    bed = write_blocks_bed(tmp_path, bs, be)

    args = ["--blocks_path", bed, "--min_cpgs", str(min_cpgs)]
    if strict:
        args.append("--strict")
    if strip:
        args.append("--strip")
    expect = run_oracle("cview", args, frags_to_bytes(frags))

    got = filter_by_blocks(frags, bs, be, strict=strict, strip=strip,
                           min_cpgs=min_cpgs)
    # cview emits in stream order; strict mode can emit pieces in a different
    # interleaving than our pair expansion — compare as multisets
    assert norm(frags_to_bytes(got)) == norm(expect)


def test_filter_no_gaps(rng):
    frags = random_frags(rng, 300, 2000, max_len=8, dot_rate=0.3)
    got = filter_by_blocks(frags, [1], [3000], no_gaps=True)
    from wgbs_tools_tpu.ops.frag_ops import has_gaps

    assert not has_gaps(got).any()


# ----------------------------------------------------------------- homog


@pytest.mark.parametrize("ranges,min_len,inclusive", [
    ("0,0.34,0.66,1", 5, False),
    ("0,0.34,0.66,1", 1, False),
    ("0,0.2,0.8,1", 3, False),
    ("0,0.5,1", 4, False),
    ("0,0.34,0.66,1", 5, True),
])
def test_homog_vs_oracle(tmp_path, rng, ranges, min_len, inclusive):
    frags = random_frags(rng, 1200, 5000, max_len=14, dot_rate=0.1,
                         meth_rate=0.5, h_rate=0.05)
    bs, be = make_blocks(rng, 30, 5000, min_len=3, max_len=40)
    bed = write_blocks_bed(tmp_path, bs, be)

    args = ["-r", ranges, "-b", bed, "-l", str(min_len)]
    if inclusive:
        args.append("--inclusive")
    out = run_oracle("homog", args, frags_to_bytes(frags))
    expect = np.array([r.split(b"\t") for r in out.strip().split(b"\n")],
                      dtype=np.int64)

    rvec = [float(x) for x in ranges.split(",")]
    got = homog_counts(frags, bs, be, rvec, min_cpgs=min_len,
                       inclusive=inclusive)
    assert got.shape == expect.shape
    assert (got == expect).all()


# ----------------------------------------------------------------- sampler


def test_sample_frags_distribution(rng):
    frags = random_frags(rng, 50, 500, max_len=5, max_count=1)
    frags.count[:] = 1000
    out = sample_frags(frags, 0.25, seed=7)
    assert out.nr_frags == frags.nr_frags
    frac = out.count.sum() / frags.count.sum()
    assert 0.22 < frac < 0.28
    # reps multiply the trial count (ref: cview.py:55-67 uses reps for rate>0.25)
    out2 = sample_frags(frags, 0.5, reps=2, seed=7)
    assert 0.95 < out2.count.sum() / frags.count.sum() < 1.05


def test_sample_drops_zero_counts(rng):
    frags = random_frags(rng, 200, 1000, max_len=5, max_count=1)
    out = sample_frags(frags, 0.01, seed=3)
    assert (out.count > 0).all()
    assert out.nr_frags < frags.nr_frags


# ----------------------------------------------------------------- mask


def test_mask_sites_vs_oracle(tmp_path, rng):
    frags = random_frags(rng, 600, 3000, max_len=10, dot_rate=0.1)
    bs, be = make_blocks(rng, 15, 3000)
    bed = write_blocks_bed(tmp_path, bs, be)
    expect = run_oracle("mask_pat", [bed], frags_to_bytes(frags))
    got = mask_sites(frags, bs, be)
    assert norm(frags_to_bytes(got)) == norm(expect)


@pytest.mark.parametrize("inclusive", [False, True])
def test_homog_jax_backend_matches_numpy(tmp_path, rng, inclusive):
    frags = random_frags(rng, 900, 4000, max_len=12, dot_rate=0.1,
                         meth_rate=0.5, h_rate=0.05)
    bs, be = make_blocks(rng, 25, 4000, min_len=3, max_len=30)
    rvec = [0.0, 0.34, 0.66, 1.0]
    a = homog_counts(frags, bs, be, rvec, min_cpgs=4, inclusive=inclusive)
    b = homog_counts(frags, bs, be, rvec, min_cpgs=4, inclusive=inclusive,
                     backend="jax")
    assert (a == b).all()
