"""Sharded (samples x sites) pipeline correctness on the virtual CPU mesh."""

import numpy as np
import jax.numpy as jnp
import pytest

import jax

from tests.synth import random_frags
from wgbs_tools_tpu.ops.pileup import pileup_xla
from wgbs_tools_tpu.parallel.mesh import make_mesh
from wgbs_tools_tpu.parallel.sharded import bucket_fragments, build_analysis_step


@pytest.mark.parametrize("samples_axis,sites_shards", [(1, 8), (2, 4), (4, 2)])
def test_sharded_pileup_matches_single_device(rng, samples_axis, sites_shards):
    if len(jax.devices()) < samples_axis * sites_shards:
        pytest.skip("not enough devices")
    n_sites = 256 * sites_shards
    frags = random_frags(rng, 600, n_sites - 40, max_len=14)
    n_samples = samples_axis  # one sample per shard for simplicity
    sample_counts = np.zeros((n_samples, n_sites, 2), dtype=np.int32)
    loci = np.cumsum(np.full(n_sites, 10, dtype=np.int64)).astype(np.int32)

    mesh = make_mesh(samples_axis * sites_shards, samples_axis=samples_axis)
    rs, ln, cn, cd = bucket_fragments(
        frags.start, frags.length, frags.count, frags.codes, n_sites,
        sites_shards,
    )
    step = build_analysis_step(mesh, n_sites, halo=32, W=16, max_bp=0, pc=15.0)
    counts, tb, total_cov = step(
        jnp.asarray(rs), jnp.asarray(ln), jnp.asarray(cn), jnp.asarray(cd),
        jnp.asarray(sample_counts), jnp.asarray(loci[:, None]),
    )

    expect = pileup_xla(frags.start, frags.length, frags.count, frags.codes,
                        1, n_sites)
    got = np.asarray(counts)
    assert (got == expect).all()
    assert int(total_cov) == int(expect[:, 1].sum())
    assert tb.shape == (n_sites,)


def test_halo_crossing_reads(rng):
    """Fragments deliberately straddling shard boundaries."""
    from wgbs_tools_tpu.formats.pat import PatFrags, CODE_C

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    sites_shards = 4
    n_sites = 256 * sites_shards
    starts = np.array([250, 255, 256, 511, 512, 767, 1000], dtype=np.int32)
    lengths = np.full(7, 12, dtype=np.int32)
    counts = np.arange(1, 8, dtype=np.int32)
    codes = np.full((7, 12), CODE_C, dtype=np.uint8)
    frags = PatFrags(starts, lengths, counts, codes,
                     np.zeros(7, dtype=np.int16), ["chr1"], None)

    mesh = make_mesh(4, samples_axis=1)
    rs, ln, cn, cd = bucket_fragments(starts, lengths, counts, codes, n_sites,
                                      sites_shards)
    step = build_analysis_step(mesh, n_sites, halo=32, W=8, max_bp=0, pc=1.0)
    sample_counts = np.zeros((1, n_sites, 2), dtype=np.int32)
    loci = np.arange(1, n_sites + 1, dtype=np.int32) * 3
    out, _, _ = step(
        jnp.asarray(rs), jnp.asarray(ln), jnp.asarray(cn), jnp.asarray(cd),
        jnp.asarray(sample_counts), jnp.asarray(loci[:, None]),
    )
    expect = pileup_xla(starts, lengths, counts, codes, 1, n_sites)
    assert (np.asarray(out) == expect).all()


def test_segment_windows_sharded_matches_single_device(rng):
    """Window-sharded fast segmentation == per-window single-device result,
    including the pad-to-device-count path (5 windows on 8 devices)."""
    from wgbs_tools_tpu.models.segment import segment_borders
    from wgbs_tools_tpu.parallel.sharded import segment_windows_sharded

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    n, K, nw = 600, 2, 5
    datas = np.zeros((nw, K, n, 2), dtype=np.int64)
    locis = np.zeros((nw, n), dtype=np.int64)
    for w in range(nw):
        cov = rng.integers(1, 20, size=(K, n))
        meth = rng.binomial(cov, rng.random((K, 1)))
        datas[w, :, :, 0] = meth
        datas[w, :, :, 1] = cov
        locis[w] = np.cumsum(rng.integers(2, 100, size=n)) + 50
    mesh = make_mesh(8, samples_axis=2)
    got = segment_windows_sharded(mesh, datas, locis, max_cpg=150,
                                  max_bp=2000, pseudo_count=15.0)
    assert len(got) == nw
    for w in range(nw):
        single = segment_borders(datas[w], locis[w], 150, 2000, 15.0,
                                 mode="fast")
        assert got[w].tolist() == single.tolist()
