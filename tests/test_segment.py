import os.path as op

import numpy as np
import pytest

from tests.oracle import oracle, run_oracle
from tests.synth import random_beta
from wgbs_tools_tpu.formats.beta import save_beta
from wgbs_tools_tpu.models.segment import (
    SegmentConfig,
    segment_borders,
    segment_ranges,
    segment_sites_window,
)


def make_blocky_beta(rng, n, n_blocks=40, max_cov=30):
    """Beta data with genuine methylation change-points."""
    borders = np.sort(rng.choice(np.arange(1, n), size=n_blocks, replace=False))
    levels = rng.random(n_blocks + 1)
    per_site_p = np.repeat(levels, np.diff(np.concatenate([[0], borders, [n]])))
    cov = rng.integers(1, max_cov, size=n).astype(np.int64)
    meth = rng.binomial(cov, per_site_p).astype(np.int64)
    return np.stack([meth, cov], axis=1)


def ref_segment(beta_paths, loci, start0, n, max_cpg, max_bp, ps):
    """Run the reference segmentor oracle. start0 is the 0-based start site."""
    stdin = ("\n".join(str(x) for x in loci) + "\n").encode()
    args = list(beta_paths) + [
        "-s", start0, "-n", n, "-max_cpg", max_cpg, "-max_bp", max_bp, "-ps", ps,
    ]
    out = run_oracle("segmentor", args, stdin)
    return np.array(out.split(), dtype=np.int64)


@pytest.fixture(scope="module")
def beta_fixture(tmp_path_factory):
    rng = np.random.default_rng(42)
    n = 3000
    root = tmp_path_factory.mktemp("betas")
    paths = []
    datas = []
    for i in range(3):
        data = make_blocky_beta(rng, n)
        p = str(root / f"s{i}.beta")
        save_beta(p, data)
        paths.append(p)
        datas.append(data)
    # synthetic loci: strictly increasing, CpG-ish spacing
    loci = np.cumsum(rng.integers(2, 120, size=n)) + 100
    return paths, np.stack(datas), loci


# note: max_bp=0 is excluded — the reference's load_dists skips reading when
# max_bp==0 and the DP then compares uninitialized memory
# (segmentor.cpp:36-48,114); the CLI always passes max_bp (segment.py:51).
@pytest.mark.parametrize("K,max_cpg,max_bp,ps", [
    (1, 1000, 10**9, 15.0),
    (3, 1000, 10**9, 15.0),
    (3, 50, 10**9, 1.0),
    (3, 1000, 2000, 15.0),
    (2, 200, 500, 0.01),
])
def test_exact_matches_reference(beta_fixture, K, max_cpg, max_bp, ps):
    paths, datas, loci = beta_fixture
    n = datas.shape[1]
    expect = ref_segment(paths[:K], loci, 0, n, max_cpg, max_bp, ps)
    got = segment_borders(
        datas[:K], loci, max_cpg=max_cpg, max_bp=max_bp, pseudo_count=ps,
        mode="exact",
    )
    assert got.tolist() == expect.tolist()


def test_exact_matches_reference_offset_window(beta_fixture):
    paths, datas, loci = beta_fixture
    s0, n = 500, 1200
    expect = ref_segment(paths, loci[s0 : s0 + n], s0, n, 300, 1500, 15.0)
    got = segment_borders(
        datas[:, s0 : s0 + n], loci[s0 : s0 + n], max_cpg=300, max_bp=1500,
        pseudo_count=15.0, mode="exact",
    )
    assert got.tolist() == expect.tolist()


def test_fast_mode_close_to_exact(beta_fixture):
    _, datas, loci = beta_fixture
    exact = segment_borders(datas, loci, 300, 2000, 15.0, mode="exact")
    fast = segment_borders(datas, loci, 300, 2000, 15.0, mode="fast")
    # float32 cost may flip marginal decisions; demand near-identical borders
    inter = np.intersect1d(exact, fast)
    assert len(inter) >= 0.95 * len(exact)


def test_single_site_window():
    got = segment_borders(np.zeros((1, 1, 2), dtype=int), np.array([10]), 10, 0, 1.0)
    assert got.tolist() == [0, 1]


def test_segment_ranges_with_stitching(beta_fixture, mini_genome):
    """Chunked+stitched result equals one-shot segmentation (small chunk size
    forces the stitching path)."""
    paths, datas, loci = beta_fixture
    n = datas.shape[1]

    class FakeIndex:
        pass

    fake = FakeIndex()
    # loci for 1-based sites 1..n
    fake.loci = loci.astype(np.int32)
    cfg = SegmentConfig(max_cpg=200, max_bp=2000, pseudo_count=15.0,
                        chunk_size=700, mode="exact")
    starts, ends = segment_ranges(paths, [(1, n + 1)], fake, cfg)
    assert starts[0] == 1 and ends[-1] == n + 1
    assert (starts[1:] == ends[:-1]).all()

    whole = segment_sites_window(paths, (1, n + 1), fake, cfg.max_cpg,
                                 cfg.max_bp, cfg.pseudo_count, mode="exact")
    # stitching is a heuristic: demand strong agreement with the one-shot DP
    inter = np.intersect1d(np.concatenate([starts, ends]), whole)
    assert len(inter) >= 0.9 * len(whole)


def test_segment_windows_fast_matches_per_chunk(beta_fixture):
    from wgbs_tools_tpu.models.segment import segment_windows_fast

    paths, datas, loci = beta_fixture
    n = 1000
    windows = [(0, n), (n, 2 * n), (2 * n, 3 * n)]
    batched = segment_windows_fast(
        np.stack([datas[:, s:e] for s, e in windows]),
        np.stack([loci[s:e] for s, e in windows]),
        max_cpg=200, max_bp=2000, pseudo_count=15.0,
    )
    for (s, e), rel in zip(windows, batched):
        single = segment_borders(datas[:, s:e], loci[s:e], 200, 2000, 15.0,
                                 mode="fast")
        assert rel.tolist() == single.tolist()


def test_segment_ranges_fast_batched(beta_fixture):
    paths, datas, loci = beta_fixture
    n = datas.shape[1]

    class FakeIndex:
        pass

    fake = FakeIndex()
    fake.loci = loci.astype(np.int32)
    cfg_fast = SegmentConfig(max_cpg=200, max_bp=2000, pseudo_count=15.0,
                             chunk_size=700, mode="fast")
    starts, ends = segment_ranges(paths, [(1, n + 1)], fake, cfg_fast)
    assert starts[0] == 1 and ends[-1] == n + 1
    assert (starts[1:] == ends[:-1]).all()


@pytest.mark.parametrize("n,W", [(37, 3), (200, 64), (513, 129), (1000, 300)])
def test_blocked_dp_matches_scan_dp(n, W):
    """The blocked max-plus DP must equal the sequential scan DP for any
    window size, including W smaller than the block size B=128 (the
    staircase-skew edge-matrix construction)."""
    import jax.numpy as jnp

    from wgbs_tools_tpu.models.segment import _dp_fast_blocked, _dp_fast_jax

    rng = np.random.default_rng(n * 1000 + W)
    C = rng.normal(size=(n, W)).astype(np.float32)
    valid = (np.arange(n)[:, None] - (W - 1) + np.arange(W)[None, :]) >= 0
    C = np.where(valid, C, -np.inf).astype(np.float32)
    a = np.asarray(_dp_fast_blocked(jnp.asarray(C), W))
    b = np.asarray(_dp_fast_jax(jnp.asarray(C), W))
    assert a.tolist() == b.tolist()


def test_native_matches_numpy_exact(beta_fixture):
    """C++ kernel traceback == numpy rounding-chain emulation (T[0] unused)."""
    from wgbs_tools_tpu.models.segment import (
        _cost_block_exact, _dp_exact, _prefix_sums)
    from wgbs_tools_tpu.native import segment_exact_native

    _, datas, loci = beta_fixture
    n = datas.shape[1]
    for K, W, max_bp, ps in [(3, 200, 1500, 15.0), (1, 100, 0, 1.0),
                             (2, 300, 10**9, 0.01)]:
        T = segment_exact_native(datas[:K], loci, W, max_bp, ps)
        assert T is not None, "native library must be available in CI"
        pm, pt = _prefix_sums(datas[:K])
        C = np.empty((n, W), dtype=np.float64)
        C[:] = _cost_block_exact(pm, pt, loci.astype(np.int64), 0, n, W,
                                 max_bp, ps)
        T2 = _dp_exact(C)
        assert np.array_equal(T[1:], T2[1:])


def test_native_nonmonotone_loci_matches_oracle(beta_fixture, tmp_path):
    """Non-monotone loci hit the reference's literal skip semantics; the
    native kernel's fallback loop must reproduce them (the numpy emulation
    does not model skipped-site absorption, so compare against the binary)."""
    from wgbs_tools_tpu.models.segment import _traceback
    from wgbs_tools_tpu.native import segment_exact_native

    paths, datas, loci = beta_fixture
    n = 800
    loci = loci[:n].copy()
    loci[300:340] = loci[300] - np.arange(40)  # descending dip
    expect = ref_segment(paths[:2], loci, 0, n, 200, 1500, 15.0)
    T = segment_exact_native(datas[:2, :n], loci, 200, 1500, 15.0)
    assert T is not None
    got = _traceback(T, n)
    assert got.tolist() == expect.tolist()


def test_segment_ranges_threads_equal(beta_fixture, tmp_path):
    paths, datas, loci = beta_fixture

    class FakeIndex:
        def __init__(self, loci):
            self.loci = loci

    idx = FakeIndex(loci.astype(np.int64))
    ranges = [(1, datas.shape[1] + 1)]
    cfg1 = SegmentConfig(max_cpg=300, chunk_size=700, threads=1)
    cfg4 = SegmentConfig(max_cpg=300, chunk_size=700, threads=4)
    s1, e1 = segment_ranges(paths, ranges, idx, cfg1)
    s4, e4 = segment_ranges(paths, ranges, idx, cfg4)
    assert s1.tolist() == s4.tolist() and e1.tolist() == e4.tolist()


def test_borders_mask_matches_host_traceback(rng):
    """Device pointer-doubling chain marking == the sequential host
    traceback, on adversarial T arrays (long chains, -1 sentinels, chains
    that jump straight to 0)."""
    import jax.numpy as jnp

    from wgbs_tools_tpu.models.segment import _borders_mask, _traceback

    for n in (1, 2, 5, 64, 1000):
        for trial in range(4):
            T = np.empty(n + 1, np.int32)
            T[0] = 0
            for i in range(1, n + 1):
                if trial == 0:
                    T[i] = i - 1          # worst case: chain of length n
                elif trial == 1:
                    T[i] = 0              # single block
                elif trial == 2:
                    T[i] = rng.integers(-1, i)  # random incl. -1 sentinel
                else:
                    T[i] = max(0, i - int(rng.integers(1, 8)))
            want = _traceback(T, n)
            mask = np.asarray(_borders_mask(jnp.asarray(T)))
            got = np.flatnonzero(mask).astype(np.int64)
            assert np.array_equal(got, want), (n, trial, got[:10], want[:10])


def test_pack_mask_bits_roundtrip():
    """Device bit-packing of border masks == numpy packbits (MSB-first),
    including non-multiple-of-8 widths and all-ones / all-zeros rows."""
    import jax.numpy as jnp

    from wgbs_tools_tpu.models.segment import pack_mask_bits, unpack_mask_bits

    rng = np.random.default_rng(41)
    for m in (1, 7, 8, 9, 60001, 256):
        masks = (rng.random((3, m)) < 0.3).astype(np.uint8)
        masks[0] = 1
        masks[1] = 0
        packed = np.asarray(pack_mask_bits(jnp.asarray(masks)))
        want = np.packbits(masks, axis=1)
        assert np.array_equal(packed, want), m
        assert np.array_equal(unpack_mask_bits(packed, m), masks)


def test_exact_native_malformed_meth_gt_cov():
    """Malformed input with meth > cov must not corrupt memory: the ll memo
    is indexed by (nmeth, ntotal) triangularly, so nm > nt would write past
    the row (found in round-3 review). The scan now disables the memo for
    such input; the DP still returns borders (garbage-likelihood-tolerant,
    like the reference) without crashing."""
    from wgbs_tools_tpu.models.segment import segment_borders

    rng = np.random.default_rng(5)
    n, K = 800, 3
    data = rng.integers(0, 6, size=(K, n, 2)).astype(np.int64)
    data[:, :, 1] = data[:, :, 0] + rng.integers(0, 5, size=(K, n))
    data[1, 37, 0] = data[1, 37, 1] + 7  # meth > cov at one site
    loci = np.cumsum(rng.integers(2, 50, size=n)).astype(np.int64)
    res = segment_borders(data, loci, max_cpg=100, max_bp=2000,
                          pseudo_count=15.0, mode="exact")
    assert res[0] == 0 and res[-1] == n
    assert np.all(np.diff(res) > 0)


def test_fast_stitch_batched_matches_serial(beta_fixture):
    """The batched patch stitcher (one device launch per round) produces
    exactly the serial _stitch_2 result."""
    from wgbs_tools_tpu.models.segment import (_seg_fn, break_to_chunks,
                                               finalize_segmentation,
                                               segment_chunks,
                                               segment_ranges)

    paths, datas, loci = beta_fixture
    n = datas.shape[1]

    class FakeIndex:
        pass

    fake = FakeIndex()
    fake.loci = loci.astype(np.int64)
    cfg = SegmentConfig(max_cpg=150, max_bp=3000, pseudo_count=15.0,
                        chunk_size=700, mode="fast")
    st, en = segment_ranges(paths, [(1, n + 1)], fake, cfg)  # batched

    tags, chunks = break_to_chunks([(1, n + 1)], cfg.chunk_size)
    results = segment_chunks(paths, chunks, fake, cfg)
    st2, en2 = finalize_segmentation(tags, chunks, results,
                                     _seg_fn(paths, fake, cfg), cfg)
    assert st.tolist() == st2.tolist()
    assert en.tolist() == en2.tolist()


def test_numpy_fallback_nonmonotone_matches_native_and_oracle(beta_fixture):
    """Chromosome-spanning (non-monotone-loci) windows: the numpy exact
    fallback must reproduce the reference's literal skip semantics
    (skipped sites NOT absorbed — segmentor.cpp:112-117) bit-for-bit.
    Regression: the prefix-sum emulation absorbed every site and even
    allowed cross-boundary blocks, so a worker that transiently lost the
    native .so produced different borders than its peers (flaky
    multi-process segment mismatch, round 5)."""
    import wgbs_tools_tpu.native as nat
    from wgbs_tools_tpu.models.segment import _traceback
    from wgbs_tools_tpu.native import segment_exact_native

    paths, datas, loci = beta_fixture
    n = 800
    loci = loci[:n].copy()
    # chromosome-boundary shape: coordinates restart low mid-window
    loci[500:] = loci[500:] - loci[500] + 150
    expect = ref_segment(paths[:2], loci, 0, n, 200, 1500, 15.0)
    T = segment_exact_native(datas[:2, :n], loci, 200, 1500, 15.0)
    assert T is not None and _traceback(T, n).tolist() == expect.tolist()

    class FakeIndex:
        pass

    fake = FakeIndex()
    fake.loci = loci.astype(np.int64)
    res_native = segment_sites_window(paths[:2], (1, n + 1), fake, 200,
                                      1500, 15.0, "exact")
    orig = nat.segment_exact_native
    nat.segment_exact_native = lambda *a, **k: None
    try:
        res_numpy = segment_sites_window(paths[:2], (1, n + 1), fake, 200,
                                         1500, 15.0, "exact")
    finally:
        nat.segment_exact_native = orig
    assert res_numpy.tolist() == res_native.tolist()


def test_native_nonmonotone_zero_coverage_ring_reuse(beta_fixture, tmp_path):
    """Non-monotone window with an all-zero-coverage stretch placed past
    the DP ring wrap: zero ll_sum cells must read as 0.0 (the reference
    prefills each row — segmentor.cpp:105), not the stale value of the
    ring slot's previous occupant. Regression for the native kernel's
    literal branch, which skipped the write on ll_sum == 0."""
    from wgbs_tools_tpu.models.segment import _traceback
    from wgbs_tools_tpu.native import segment_exact_native

    paths, datas, loci = beta_fixture
    n = 800
    W = 200  # ring size 256: rows >= 256 reuse slots
    data = datas[:2, :n].copy()
    data[:, 500:560, :] = 0  # zero coverage -> ll_sum == 0 prefixes
    loci = loci[:n].copy()
    loci[700:] = loci[700:] - loci[700] + 150  # non-monotone: literal branch
    zpaths = []
    for i in range(2):
        p = str(tmp_path / f"z{i}.beta")
        save_beta(p, data[i])
        zpaths.append(p)
    expect = ref_segment(zpaths, loci, 0, n, W, 1500, 15.0)
    T = segment_exact_native(data, loci, W, 1500, 15.0)
    assert T is not None
    assert _traceback(T, n).tolist() == expect.tolist()
