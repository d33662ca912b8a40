"""Row-packed pileup kernel (v3) correctness (interpret mode) + the native
interval packer's invariants."""

import numpy as np
import pytest

from tests.synth import random_frags
from wgbs_tools_tpu.native import get_lib, pack_rows_native
from wgbs_tools_tpu.ops.pileup import pileup_xla
from wgbs_tools_tpu.ops.pileup_tpu3 import SB, pileup_pallas_v3, stage_v3

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native packer unavailable")


def _compare(frags, ws, wl):
    got = pileup_pallas_v3(frags.start, frags.length, frags.count,
                           frags.codes, ws, wl, interpret=True)
    expect = pileup_xla(frags.start, frags.length, frags.count, frags.codes,
                        ws, wl)
    assert (got == expect).all()


def test_v3_small(rng):
    _compare(random_frags(rng, 400, 2000, max_len=12, h_rate=0.05), 1, 2000)


def test_v3_multi_tile(rng):
    _compare(random_frags(rng, 3000, 5000, max_len=20, dot_rate=0.1), 1, 5000)


def test_v3_offset_window(rng):
    _compare(random_frags(rng, 2000, 6000, max_len=16), 2500, 2048)


def test_v3_long_fragments_split(rng):
    _compare(random_frags(rng, 300, 9000, max_len=400), 1, 9000)


def test_v3_counts_and_boundaries(rng):
    from wgbs_tools_tpu.formats.pat import CODE_C, PatFrags

    # sub-block/tile boundary crossers with heterogeneous counts: count
    # classes must not mix within packed rows
    starts = np.array([120, 125, 126, 127, 128, 1020, 1023, 1024, 2047,
                       2048], dtype=np.int32)
    n = starts.shape[0]
    frags = PatFrags(starts, np.full(n, 10, np.int32),
                     np.array([1, 7, 1, 250000, 1, 2, 2, 1, 3, 1],
                              np.int32),
                     np.full((n, 10), CODE_C, np.uint8),
                     np.zeros(n, np.int16), ["chr1"], None)
    _compare(frags, 1, 3072)


def test_v3_dense_overlap(rng):
    """Deep coverage of a narrow window forces many rows per sub-block."""
    from wgbs_tools_tpu.formats.pat import PatFrags

    F = 3000
    starts = rng.integers(1, 200, size=F).astype(np.int32)
    lengths = rng.integers(1, 30, size=F).astype(np.int32)
    codes = rng.integers(0, 4, size=(F, 30)).astype(np.uint8)
    codes[np.arange(30)[None] >= lengths[:, None]] = 3
    frags = PatFrags(np.sort(starts), lengths,
                     rng.integers(1, 4, size=F).astype(np.int32), codes,
                     np.zeros(F, np.int16), ["chr1"], None)
    _compare(frags, 1, 1024)


def test_pack_rows_disjoint_invariant(rng):
    """Rows returned by the native packer never contain overlapping pieces
    and always share (g, count)."""
    n = 5000
    g = np.sort(rng.integers(0, 40, size=n)).astype(np.int32)
    rr = rng.integers(0, 120, size=n).astype(np.int32)
    ln = np.minimum(rng.integers(1, 40, size=n), 128 - rr).astype(np.int32)
    cnt = rng.integers(1, 4, size=n).astype(np.int32)
    piece_row, row_g, row_count = pack_rows_native(g, cnt, rr, ln)
    occupancy = {}
    for i in range(n):
        r = int(piece_row[i])
        assert row_g[r] == g[i]
        assert row_count[r] == cnt[i]
        mask = occupancy.setdefault(r, np.zeros(128, bool))
        seg = mask[rr[i] : rr[i] + ln[i]]
        assert not seg.any(), "overlapping pieces share a row"
        seg[:] = True
    # packing actually compresses (deep overlap data would be ~n rows
    # unpacked; disjoint packing should do far better)
    assert row_g.shape[0] < n / 2


def test_v3_empty_and_tiny():
    from wgbs_tools_tpu.formats.pat import empty_frags

    f = empty_frags()
    got = pileup_pallas_v3(f.start, f.length, f.count, f.codes, 1, 1500,
                           interpret=True)
    assert got.shape == (1500, 2) and not got.any()


def test_v3_flat_vs_tiled_grids(rng):
    """Both kernel grids (flat chunk-indexed and tiled num_tiles x
    max_chunks) produce identical counts, incl. sparse coverage (most tiles
    chunk-less -> exercised `covered` masking) and empty input."""
    from wgbs_tools_tpu.ops.pileup_tpu3 import call_staged

    cases = [
        random_frags(rng, 2500, 5000, max_len=18, dot_rate=0.05),
        random_frags(rng, 60, 50000, max_len=10),   # sparse: most tiles empty
        random_frags(rng, 1, 1500, max_len=5),
    ]
    for frags in cases:
        wl = int(frags.start.max()) + 64
        # classic staging: the tiled grid has no lane-count kernel
        staged = stage_v3(frags.start, frags.length, frags.count,
                          frags.codes, 1, wl, lane_counts=False,
                          classes=None)
        flat = call_staged(staged, wl, interpret=True, grid="flat")
        tiled = call_staged(staged, wl, interpret=True, grid="tiled")
        assert (np.asarray(flat[0]) == np.asarray(tiled[0])).all()
        assert (np.asarray(flat[1]) == np.asarray(tiled[1])).all()
        expect = pileup_xla(frags.start, frags.length, frags.count,
                            frags.codes, 1, wl)
        assert (np.stack([np.asarray(flat[0]), np.asarray(flat[1])],
                         axis=1) == expect).all()


def test_v3_rc_classes_bit_identical(monkeypatch):
    """Row-count-class dispatch (short chunks on a small-rc grid) produces
    exactly the single-class result — disjoint chunk partition, int adds."""
    from wgbs_tools_tpu.ops.pileup_tpu3 import call_staged, stage_v3

    rng = np.random.default_rng(91)
    # mixed density: a dense cluster (full chunks) + a sparse tail (short)
    n_sites = 1 << 15
    s1 = np.sort(rng.integers(1, 2000, size=4000))
    s2 = np.sort(rng.integers(2000, n_sites - 40, size=800))
    start = np.concatenate([s1, s2]).astype(np.int64)
    length = rng.integers(1, 20, size=start.shape[0]).astype(np.int64)
    count = rng.integers(1, 4, size=start.shape[0]).astype(np.int64)
    codes = rng.integers(0, 2, size=(start.shape[0], 20)).astype(np.uint8)
    codes[np.arange(20)[None, :] >= length[:, None]] = 3

    single = stage_v3(start, length, count, codes, 1, n_sites)
    want_m, want_c = call_staged(single, n_sites, interpret=True)
    multi = stage_v3(start, length, count, codes, 1, n_sites,
                     classes=(16, 64, 256))
    assert isinstance(multi, list) and len(multi) == 3
    got_m = got_c = 0
    for st in multi:
        m, c = call_staged(st, n_sites, interpret=True)
        got_m = got_m + m
        got_c = got_c + c
    assert np.array_equal(np.asarray(got_m), np.asarray(want_m))
    assert np.array_equal(np.asarray(got_c), np.asarray(want_c))

    # end-to-end env knob
    from wgbs_tools_tpu.ops.pileup_tpu3 import pileup_pallas_v3

    base = pileup_pallas_v3(start, length, count, codes, 1, n_sites)
    monkeypatch.setenv("WGBS_TPU_V3_CLASSES", "64,256")
    via_env = pileup_pallas_v3(start, length, count, codes, 1, n_sites)
    assert np.array_equal(base, via_env)


def test_native_place_pack_matches_numpy(monkeypatch):
    """The fused native place+pack pass produces bit-identical staged words
    to the numpy rowmat + planar_pack_cols fallback."""
    import wgbs_tools_tpu.ops.pileup_tpu3 as p3t

    rng = np.random.default_rng(92)
    n_sites = 1 << 14
    start = np.sort(rng.integers(1, n_sites - 40, size=3000)).astype(np.int64)
    length = rng.integers(1, 30, size=3000).astype(np.int64)
    count = rng.integers(1, 5, size=3000).astype(np.int64)
    codes = rng.integers(0, 3, size=(3000, 30)).astype(np.uint8)
    codes[np.arange(30)[None, :] >= length[:, None]] = 3

    native = stage_v3(start, length, count, codes, 1, n_sites,
                      vals=False, lane_counts=False, classes=None)
    import wgbs_tools_tpu.native as nat

    monkeypatch.setattr(nat, "place_pack_native",
                        lambda *a, **k: None)  # force the numpy fallback
    fallback = stage_v3(start, length, count, codes, 1, n_sites,
                        vals=False, lane_counts=False, classes=None)
    for a, b in zip(native, fallback):
        if isinstance(a, np.ndarray):
            assert np.array_equal(a, b)
        else:
            assert a == b


def test_v3_high_counts_exact(rng):
    """Counts past 256 must survive the one-hot strip matmul exactly.

    Regression: the default-precision f32 dot lowers to a single bf16
    pass (TPU MXU and XLA:CPU alike), silently rounding any count or
    per-site strip sum past 256 — found as an off-by-one on a count-293
    fragment. Precision.HIGHEST restores exact integer sums < 2^24."""
    from wgbs_tools_tpu.ops.pileup import pileup_xla

    frags = random_frags(rng, 300, 4000, max_len=10, max_count=3000,
                         dot_rate=0.1, h_rate=0.05)
    got = pileup_pallas_v3(frags.start, frags.length, frags.count,
                           frags.codes, 1, 4000)
    exp = pileup_xla(frags.start, frags.length, frags.count, frags.codes,
                     1, 4000)
    assert (got == exp).all()


def test_v3_lane_counts_exact(rng, monkeypatch):
    """Count-agnostic row packing + per-lane 8-bit counts
    (WGBS_TPU_V3_LANE_COUNTS=1): fewer rows, bit-identical output; counts
    past 255 fall back to the classic per-count-row staging."""
    from wgbs_tools_tpu.ops.pileup import pileup_xla
    from wgbs_tools_tpu.ops.pileup_tpu3 import stage_v3

    frags = random_frags(rng, 4000, 30000, max_len=16, max_count=5,
                         dot_rate=0.05, h_rate=0.02)
    exp = pileup_xla(frags.start, frags.length, frags.count, frags.codes,
                     1, 30000)
    monkeypatch.setenv("WGBS_TPU_V3_LANE_COUNTS", "1")
    got = pileup_pallas_v3(frags.start, frags.length, frags.count,
                           frags.codes, 1, 30000)
    assert (got == exp).all()

    # the lane form really packs deeper: compare row counts directly
    st_lane = stage_v3(frags.start, frags.length, frags.count, frags.codes,
                       1, 30000, lane_counts=True)
    st_classic = stage_v3(frags.start, frags.length, frags.count,
                          frags.codes, 1, 30000, lane_counts=False)
    def rows(st):
        # real rows carry a nonzero count in meta[:, 0] (1s in lane mode)
        return sum(int((t[2][:, 0] > 0).sum())
                   for t in (st if isinstance(st, list) else [st]))

    assert rows(st_lane) < rows(st_classic)


def test_v3_lane_counts_fast_dot_exact(rng, monkeypatch):
    """The lane-count kernel's DEFAULT-precision strip dots are bit-exact:
    every dot input is an integer <= 255 (one bf16 term) and accumulation
    is f32 — adversarial deep overlap with counts near 255 drives per-chunk
    strip sums past 2^16 and must still match the integer oracle, under
    both WGBS_TPU_V3_LC_DOT settings."""
    from wgbs_tools_tpu.formats.pat import PatFrags

    F = 4000
    starts = (1 + rng.integers(0, 60, F)).astype(np.int64)
    lengths = rng.integers(1, 17, F).astype(np.int32)
    counts = rng.integers(200, 256, F).astype(np.int32)
    codes = rng.integers(0, 4, (F, 16)).astype(np.uint8)
    frags = PatFrags(starts, lengths, counts, codes,
                     np.zeros(F, np.int16), ["chr1"], None)
    exp = pileup_xla(frags.start, frags.length, frags.count, frags.codes,
                     1, 512)
    # per-site cov sums really exceed 2^16 (the bf16 integer limit is
    # 256; f32 accumulation is exact to 2^24)
    assert int(np.asarray(exp)[:, 1].max()) > (1 << 16)

    monkeypatch.setenv("WGBS_TPU_V3_LANE_COUNTS", "1")
    monkeypatch.setenv("WGBS_TPU_V3_VALS", "0")  # subject: the lc kernel
    for mode in ("fast", "highest"):
        monkeypatch.setenv("WGBS_TPU_V3_LC_DOT", mode)
        got = pileup_pallas_v3(frags.start, frags.length, frags.count,
                               frags.codes, 1, 512, interpret=True)
        assert (np.asarray(got) == np.asarray(exp)).all(), mode


def test_v3_value_planes_exact(rng, monkeypatch):
    """Value-plane staging (WGBS_TPU_V3_VALS, the round-5 default): the
    host ships pre-masked uint8 mv/cv planes and the kernel is two loads +
    two single-pass dots — bit-identical to the oracle, including
    adversarial deep overlap with counts near 255 (per-site sums past
    2^16). Counts >= 256 and a failed native place both fall back (classic
    / packed lane-count) with identical output."""
    from wgbs_tools_tpu.formats.pat import PatFrags
    from wgbs_tools_tpu.ops.pileup import pileup_xla

    F = 4000
    starts = (1 + rng.integers(0, 60, F)).astype(np.int64)
    lengths = rng.integers(1, 17, F).astype(np.int32)
    counts = rng.integers(200, 256, F).astype(np.int32)
    codes = rng.integers(0, 4, (F, 16)).astype(np.uint8)
    frags = PatFrags(starts, lengths, counts, codes,
                     np.zeros(F, np.int16), ["chr1"], None)
    exp = pileup_xla(frags.start, frags.length, frags.count, frags.codes,
                     1, 512)
    assert int(np.asarray(exp)[:, 1].max()) > (1 << 16)

    st = stage_v3(frags.start, frags.length, frags.count, frags.codes,
                  1, 512)
    assert len(st) == 10 and st[-1] == "vals"  # the default form
    got = pileup_pallas_v3(frags.start, frags.length, frags.count,
                           frags.codes, 1, 512, interpret=True)
    assert (np.asarray(got) == np.asarray(exp)).all()

    # native place failure -> packed lane-count staging, same output
    import wgbs_tools_tpu.native as nat

    monkeypatch.setattr(nat, "place_vals_native", lambda *a, **k: None)
    st2 = stage_v3(frags.start, frags.length, frags.count, frags.codes,
                   1, 512)
    assert len(st2) == 9
    got2 = pileup_pallas_v3(frags.start, frags.length, frags.count,
                            frags.codes, 1, 512, interpret=True)
    assert (np.asarray(got2) == np.asarray(exp)).all()
    monkeypatch.undo()

    # any count >= 256 -> classic staging (vals rides the lane-count gate)
    frags_hi = PatFrags(starts[:64], lengths[:64],
                        np.full(64, 300, np.int32), codes[:64],
                        np.zeros(64, np.int16), ["chr1"], None)
    st3 = stage_v3(frags_hi.start, frags_hi.length, frags_hi.count,
                   frags_hi.codes, 1, 512)
    # classic form, classed (the packed-form default geometry)
    assert isinstance(st3, list) and all(len(t) == 8 for t in st3)
    exp_hi = pileup_xla(frags_hi.start, frags_hi.length, frags_hi.count,
                        frags_hi.codes, 1, 512)
    got3 = pileup_pallas_v3(frags_hi.start, frags_hi.length, frags_hi.count,
                            frags_hi.codes, 1, 512, interpret=True)
    assert (np.asarray(got3) == np.asarray(exp_hi)).all()


def test_v3_vals_vs_lane_vs_classic_identical(rng):
    """Three-way staging bit-identity on one workload: value planes vs
    packed lane counts vs classic per-count rows, all equal to the XLA
    oracle (disjoint forms of the same row packing)."""
    from wgbs_tools_tpu.ops.pileup import pileup_xla
    from wgbs_tools_tpu.ops.pileup_tpu3 import call_staged

    frags = random_frags(rng, 3000, 25000, max_len=16, max_count=7,
                         dot_rate=0.05, h_rate=0.02)
    wl = 25000
    exp = pileup_xla(frags.start, frags.length, frags.count, frags.codes,
                     1, wl)
    outs = {}
    for name, kw in (("vals", dict(lane_counts=True, vals=True, fused=True)),
                     ("vals-split", dict(lane_counts=True, vals=True,
                                         fused=False)),
                     ("lane", dict(lane_counts=True, vals=False)),
                     ("classic", dict(lane_counts=False))):
        st = stage_v3(frags.start, frags.length, frags.count, frags.codes,
                      1, wl, classes=None, **kw)
        if name == "vals":
            assert st[4] is None  # fused: one wide plane, no cv plane
        elif name == "vals-split":
            assert st[4] is not None
        m, c = call_staged(st, wl, interpret=True)
        outs[name] = np.stack([np.asarray(m), np.asarray(c)], axis=1)
        assert (outs[name] == exp).all(), name
    assert len({o.tobytes() for o in outs.values()}) == 1
