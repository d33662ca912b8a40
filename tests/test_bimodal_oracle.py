"""test_bimodal EM conformance vs the reference implementation.

The reference's EM and likelihood functions are importable pure-python
(scipy/numpy); only its pat loading shells out to tabix, so we feed both
sides the same fragment set directly.
"""

import sys

import numpy as np
import pytest

from tests.synth import random_frags
from wgbs_tools_tpu.models.bimodal import test_bimodal_region as bimodal_region

REF_PY = "/root/reference/src/python"


def _ref_bimodal(frags, s1, s2, min_len=3):
    if REF_PY not in sys.path:
        sys.path.insert(0, REF_PY)
    # the reference hard-requires statsmodels (only for BH correction, which
    # this test doesn't touch) — stub it if absent
    try:
        import statsmodels  # noqa: F401
    except ImportError:
        import types

        sm = types.ModuleType("statsmodels")
        stats_m = types.ModuleType("statsmodels.stats")
        multi = types.ModuleType("statsmodels.stats.multitest")
        multi.multipletests = lambda *a, **k: (_ for _ in ()).throw(
            NotImplementedError)
        sm.stats = stats_m
        stats_m.multitest = multi
        sys.modules.setdefault("statsmodels", sm)
        sys.modules.setdefault("statsmodels.stats", stats_m)
        sys.modules.setdefault("statsmodels.stats.multitest", multi)
    try:
        import test_bimodal as ref
    except Exception as e:
        pytest.skip(f"reference test_bimodal not importable: {e}")
    from wgbs_tools_tpu.formats.pat import frags_to_bytes

    pat_text = frags_to_bytes(frags).decode()
    mat = ref.read_pat_vis(pat_text, s1, s2, True, min_len)
    if mat.shape[0] == 0:
        return 1.0
    ll0 = ref.calc_initial_liklihood(mat, should_print=False)
    ll1 = ref.em_pat_matrix(mat, should_print=False)
    from scipy import stats

    test_stat = 2 * np.log(2) * (ll1 - ll0)
    return float(1 - stats.chi2.cdf(test_stat, mat.shape[1]))


@pytest.mark.parametrize("seed,bimodal", [(1, True), (2, False), (3, True)])
def test_bimodal_pval_matches_reference(seed, bimodal):
    rng = np.random.default_rng(seed)
    s1, s2 = 100, 130
    n_reads = 60
    from wgbs_tools_tpu.formats.pat import PatFrags, CODE_C, CODE_T

    starts = rng.integers(s1, s2 - 6, size=n_reads).astype(np.int32)
    lengths = rng.integers(4, 7, size=n_reads).astype(np.int32)
    codes = np.full((n_reads, 8), 3, dtype=np.uint8)
    for i in range(n_reads):
        if bimodal:
            p = 0.9 if rng.random() < 0.5 else 0.1
        else:
            p = 0.5
        codes[i, : lengths[i]] = np.where(
            rng.random(lengths[i]) < p, CODE_C, CODE_T
        )
    frags = PatFrags(starts, lengths, np.ones(n_reads, np.int32), codes,
                     np.zeros(n_reads, np.int16), ["chr1"], None)
    frags = frags.sort().collapse()

    res = bimodal_region(frags, s1, s2, strict=True, min_len=3)
    ref_pv = _ref_bimodal(frags, s1, s2, min_len=3)
    assert abs(res["pval"] - ref_pv) < 1e-6, (res["pval"], ref_pv)
    if bimodal:
        assert res["pval"] < 0.05
