"""Streaming pat consumers (pipeline/pat_stream.py): chunked results equal
the whole-file passes bit-for-bit."""

import numpy as np
import pytest

from tests.synth import random_frags
from wgbs_tools_tpu.formats.bgzf import decompress_file
from wgbs_tools_tpu.formats.pat import (frags_to_bytes, read_pat, write_pat)
from wgbs_tools_tpu.pipeline.pat_stream import (
    SortedStreamEmitter,
    homog_pat_streaming,
    iter_view_pat,
    mask_pat_streaming,
    merge_pats_streaming,
)

TINY = 1 << 12  # chunk_bytes small enough to force many chunks


class _G:
    """Minimal genome stub for whole-file streaming."""

    name = "stub"

    def __init__(self, n):
        self.n = n

    def get_nr_sites(self):
        return self.n


def _mk_pat(rng, path, n_frags, n_sites, seed_extra=0):
    frags = random_frags(np.random.default_rng(rng.integers(1 << 30)),
                         n_frags, n_sites, max_len=14).sort().collapse()
    write_pat(frags, path)
    return frags


def test_emitter_equal_start_boundary():
    """Rows sharing a start arriving in different pushes still collapse."""
    from wgbs_tools_tpu.formats.pat import parse_pat_bytes

    rows1 = b"chr1\t10\tCCT\t2\nchr1\t20\tTT\t1\n"
    rows2 = b"chr1\t20\tTT\t3\nchr1\t25\tC\t1\n"
    out = []
    em = SortedStreamEmitter(out.append)
    em.push(parse_pat_bytes(rows1), 20)   # future >= 20: only start=10 flushes
    em.push(parse_pat_bytes(rows2), 25)
    em.close()
    text = b"".join(frags_to_bytes(f) for f in out)
    assert text == b"chr1\t10\tCCT\t2\nchr1\t20\tTT\t4\nchr1\t25\tC\t1\n"


def test_streaming_merge_matches_inmemory(rng, tmp_path):
    from wgbs_tools_tpu.cli.cmd_pat import _concat_frags

    n_sites = 60_000
    paths, parts = [], []
    for i in range(3):
        p = str(tmp_path / f"in{i}.pat.gz")
        parts.append(_mk_pat(rng, p, 9000 + 1000 * i, n_sites))
        paths.append(p)
    out = str(tmp_path / "merged.pat.gz")
    merge_pats_streaming(paths, out, _G(n_sites), chunk_bytes=TINY)
    expect = _concat_frags(parts).sort().collapse()
    got = read_pat(out)
    assert frags_to_bytes(got) == frags_to_bytes(expect)
    # counts conserved: count(m) == sum(count(inputs))
    assert int(got.count.sum()) == sum(int(p.count.sum()) for p in parts)


def test_streaming_merge_labels(rng, tmp_path):
    from wgbs_tools_tpu.cli.cmd_pat import _concat_frags

    n_sites = 5_000
    paths, parts = [], []
    for i in range(2):
        p = str(tmp_path / f"l{i}.pat.gz")
        parts.append(_mk_pat(rng, p, 800, n_sites))
        paths.append(p)
    out = str(tmp_path / "lab.pat.gz")
    merge_pats_streaming(paths, out, _G(n_sites), labels=["a", "b"],
                         chunk_bytes=TINY)
    expect = _concat_frags(parts, labels=["a", "b"]).sort().collapse()
    got = read_pat(out)
    assert frags_to_bytes(got) == frags_to_bytes(expect)


def test_streaming_mask_matches_inmemory(rng, tmp_path):
    from wgbs_tools_tpu.ops.frag_ops import mask_sites

    n_sites = 40_000
    p = str(tmp_path / "m.pat.gz")
    frags = _mk_pat(rng, p, 12_000, n_sites)
    bstart = np.arange(500, n_sites, 977, dtype=np.int64)
    bend = bstart + 13
    out = str(tmp_path / "masked.pat.gz")
    mask_pat_streaming(p, out, bstart, bend, _G(n_sites), chunk_bytes=TINY)
    expect = mask_sites(frags, bstart, bend, strip=True).sort().collapse()
    assert frags_to_bytes(read_pat(out)) == frags_to_bytes(expect)


def test_streaming_homog_matches_single_pass(rng, tmp_path):
    from wgbs_tools_tpu.ops.frag_ops import homog_counts

    n_sites = 30_000
    p = str(tmp_path / "h.pat.gz")
    frags = _mk_pat(rng, p, 10_000, n_sites)
    bstart = np.arange(1, n_sites - 60, 60, dtype=np.int64)
    bend = bstart + 55
    ranges = [0.0, 0.34, 0.66, 1.0]
    got = homog_pat_streaming(p, bstart, bend, ranges, min_len=3,
                              chunk_bytes=TINY)
    expect = np.asarray(homog_counts(frags, bstart, bend, ranges,
                                     min_cpgs=3))
    assert np.array_equal(got, expect)


def test_iter_view_pat_strict_matches_view_pat(rng, tmp_path):
    """Chunked strict/block filtering + reorder equals the whole-file
    view_pat (clipping can move starts forward across chunk boundaries)."""
    from wgbs_tools_tpu.cli.cmd_pat import _concat_frags
    from wgbs_tools_tpu.cli.view import view_pat

    n_sites = 20_000
    p = str(tmp_path / "v.pat.gz")
    _mk_pat(rng, p, 8_000, n_sites)
    bed = tmp_path / "blocks.bed"
    bs = np.arange(100, n_sites - 200, 450, dtype=np.int64)
    with open(bed, "w") as f:
        for s in bs:
            f.write(f"chr1\t{s}\t{s + 200}\t{s}\t{s + 137}\n")
    g = _G(n_sites)

    out = []
    em = SortedStreamEmitter(out.append)
    for fr, wm in iter_view_pat(p, g, bed_file=str(bed), strict=True,
                                min_len=2, chunk_bytes=TINY):
        em.push(fr, wm)
    em.close()
    got = b"".join(frags_to_bytes(f) for f in out)
    expect = view_pat(p, g, bed_file=str(bed), strict=True, min_len=2)
    assert got == frags_to_bytes(expect)


def test_cview_cli_streams_whole_file(rng, tmp_path, capsys, monkeypatch):
    """The view CLI on a whole pat produces the same text as before."""
    from wgbs_tools_tpu.cli.cmd_view import main_cview

    n_sites = 8_000
    p = str(tmp_path / "c.pat.gz")
    frags = _mk_pat(rng, p, 2_000, n_sites)
    monkeypatch.setenv("WGBS_TPU_REFDIR", str(tmp_path / "none"))

    class _GG(_G):
        pass

    import wgbs_tools_tpu.cli.cmd_view as cv

    monkeypatch.setattr(cv, "Genome", lambda name: _G(n_sites))
    out_file = str(tmp_path / "out.pat")
    assert main_cview([p, "--out_path", out_file]) == 0
    assert open(out_file, "rb").read() == frags_to_bytes(frags)


def test_streaming_consumers_preserve_extra_columns(rng, tmp_path):
    """Regression: the streamed cview/merge/mask paths dropped pat extra
    columns (iter_pat's keep_extras default is False) while the pre-
    streaming whole-file paths kept them — extras must survive all three."""
    from wgbs_tools_tpu.formats.pat import PatFrags, parse_pat_bytes
    from wgbs_tools_tpu.ops.frag_ops import mask_sites

    base = random_frags(np.random.default_rng(99), 400, 20000,
                        max_len=10).sort().collapse()
    extras = np.array([b"rg%d" % (i % 3) for i in range(base.nr_frags)],
                      dtype=object)
    frags = PatFrags(base.start, base.length, base.count, base.codes,
                     base.chrom_id, base.chrom_names, extras)
    path = str(tmp_path / "x.pat.gz")
    write_pat(frags, path)
    g = _G(20000)

    # cview stream (whole-file): extras survive chunked filter+emit
    got = []
    for fr, wm in iter_view_pat(path, g, chunk_bytes=TINY,
                                keep_extras=True):
        got.append(fr)
    assert all(fr.extras is not None for fr in got if fr.nr_frags)

    # merge stream without labels: extras survive (reference sort -m keeps
    # whole lines)
    out = str(tmp_path / "m.pat.gz")
    merge_pats_streaming([path, path], out, g, chunk_bytes=TINY)
    m = parse_pat_bytes(decompress_file(out))
    assert m.extras is not None
    assert all(b"rg" in e for e in m.extras)

    # mask stream (whole-file branch): extras survive
    out2 = str(tmp_path / "k.pat.gz")
    mask_pat_streaming(path, out2, np.array([5000]), np.array([6000]), g,
                       chunk_bytes=TINY)
    k = parse_pat_bytes(decompress_file(out2))
    assert k.extras is not None
    want = mask_sites(frags, np.array([5000]), np.array([6000]),
                      strip=True).sort().collapse()
    assert frags_to_bytes(k) == frags_to_bytes(want)


def test_frag_len_cli_streams_and_matches(rng, tmp_path, capsys, monkeypatch):
    """Streamed frag_len histogram equals the materialized computation,
    whole-genome and bed-restricted, across many tiny chunks."""
    from wgbs_tools_tpu.cli import cmd_pat
    from wgbs_tools_tpu.cli.view import view_pat

    n_sites = 20_000
    p = str(tmp_path / "fl.pat.gz")
    _mk_pat(rng, p, 6_000, n_sites)
    bed = tmp_path / "fl.bed"
    with open(bed, "w") as f:
        for s in range(200, n_sites - 400, 700):
            f.write(f"chr1\t{s}\t{s + 300}\t{s}\t{s + 211}\n")
    g = _G(n_sites)
    monkeypatch.setattr(cmd_pat, "Genome", lambda name: g)
    monkeypatch.setenv("WGBS_TPU_PAT_CHUNK_BYTES", str(TINY))

    def expected(**kw):
        frags = view_pat(p, g, no_sort=True, **kw)
        sizes = np.minimum(frags.length, 30)
        return np.bincount(sizes, weights=frags.count, minlength=31)

    for kw, argv in [({}, []), ({"bed_file": str(bed)},
                                ["-L", str(bed)])]:
        assert cmd_pat.main_frag_len([p, "-v"] + argv) == 0
        out = capsys.readouterr().out
        got = np.zeros(31)
        for line in out.splitlines():
            if line.startswith("#"):
                continue
            i, v = line.split("\t")
            got[int(i)] = float(v)
        assert np.array_equal(got[1:], expected(**kw)[1:31]), kw
