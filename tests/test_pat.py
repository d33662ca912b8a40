import gzip

import numpy as np

from tests.synth import random_frags
from wgbs_tools_tpu.formats.pat import (
    CODE_C,
    CODE_DOT,
    CODE_T,
    frags_to_bytes,
    index_pat,
    load_pat_index,
    pack_codes,
    parse_pat_bytes,
    read_pat,
    unpack_codes,
    write_pat,
)

SAMPLE = (
    b"chr1\t46\tCT\t1\n"
    b"chr1\t47\tCC..TC\t1\n"
    b"chr1\t47\tT\t13\n"
    b"chr2\t2300000\tC\t4\n"
)


def test_parse_sample():
    f = parse_pat_bytes(SAMPLE)
    assert f.nr_frags == 4
    assert f.start.tolist() == [46, 47, 47, 2300000]
    assert f.count.tolist() == [1, 1, 13, 4]
    assert f.length.tolist() == [2, 6, 1, 1]
    assert f.chrom_names == ["chr1", "chr2"]
    assert f.codes[0, :2].tolist() == [CODE_C, CODE_T]
    assert f.codes[1, :6].tolist() == [CODE_C, CODE_C, CODE_DOT, CODE_DOT, CODE_T, CODE_C]
    # padding beyond length is DOT
    assert (f.codes[2, 1:] == CODE_DOT).all()


def test_serialize_roundtrip():
    f = parse_pat_bytes(SAMPLE)
    assert frags_to_bytes(f) == SAMPLE


def test_extras_preserved():
    data = b"chr1\t10\tCCT\t2\trd1\tfoo\n"
    f = parse_pat_bytes(data)
    assert f.extras[0] == b"rd1\tfoo"
    assert frags_to_bytes(f) == data


def test_pack_unpack_roundtrip(rng):
    f = random_frags(rng, 500, 10000, max_len=19)
    packed = pack_codes(f.codes)
    assert packed.shape[1] == (f.codes.shape[1] + 3) // 4
    un = unpack_codes(packed, f.codes.shape[1])
    assert (un == f.codes).all()


def test_sort_collapse(rng):
    data = (
        b"chr1\t50\tCT\t2\n"
        b"chr1\t10\tC\t1\n"
        b"chr1\t50\tCT\t5\n"
        b"chr1\t50\tCC\t1\n"
    )
    f = parse_pat_bytes(data).sort().collapse()
    assert frags_to_bytes(f) == (
        b"chr1\t10\tC\t1\nchr1\t50\tCC\t1\nchr1\t50\tCT\t7\n"
    )


def test_sort_order_matches_shell_sort():
    # sort -k2,2n -k3,3: numeric start then pattern C-locale lexicographic;
    # '.' (0x2e) sorts before 'C' < 'H' < 'T'
    data = b"chr1\t5\tT\t1\nchr1\t5\t.C\t1\nchr1\t5\tCT\t1\nchr1\t5\tC\t1\n"
    f = parse_pat_bytes(data).sort()
    pats = [
        frags_to_bytes(f.take([i])).split(b"\t")[2] for i in range(f.nr_frags)
    ]
    assert pats == [b".C", b"C", b"CT", b"T"]


def test_write_read_roundtrip(tmp_path, rng):
    f = random_frags(rng, 2000, 50000, max_len=15)
    path = str(tmp_path / "x.pat.gz")
    write_pat(f, path)
    # gzip-compatible
    assert gzip.open(path, "rb").read() == frags_to_bytes(f)
    g = read_pat(path)
    assert (g.start == f.start).all()
    assert (g.count == f.count).all()
    assert (g.codes[:, : g.max_len] == f.codes[:, : g.max_len]).all()


def test_region_read_indexed(tmp_path, rng):
    f = random_frags(rng, 5000, 100000, max_len=12)
    path = str(tmp_path / "r.pat.gz")
    write_pat(f, path, stride=256)
    window = (40000, 40500)
    got = read_pat(path, region_sites=window)
    expect = f.slice_sites(*window)
    assert got.nr_frags == expect.nr_frags
    assert (got.start == expect.start).all()
    assert (got.count == expect.count).all()


def test_index_pat_rebuild(tmp_path, rng):
    f = random_frags(rng, 3000, 60000, max_len=10)
    path = str(tmp_path / "i.pat.gz")
    write_pat(f, path, index=False)
    index_pat(path, stride=128)
    window = (1000, 2000)
    got = read_pat(path, region_sites=window)
    expect = f.slice_sites(*window)
    assert got.nr_frags == expect.nr_frags


def test_slice_sites_semantics():
    data = b"chr1\t10\tCCCCC\t1\nchr1\t20\tTT\t1\n"
    f = parse_pat_bytes(data)
    # read 10-14 overlaps window starting at 14
    assert f.slice_sites(14, 30).nr_frags == 2
    assert f.slice_sites(15, 30).nr_frags == 1
    assert f.slice_sites(1, 10).nr_frags == 0
    assert f.slice_sites(1, 11).nr_frags == 1


def test_cdx_sidecar_actually_loadable(tmp_path, rng):
    """Regression: np.savez on a str path appends '.npz', which silently made
    every .cdx sidecar unloadable — region reads fell back to whole-file
    parsing while the existing tests still passed on the fallback."""
    import os

    f = random_frags(rng, 2000, 50000, max_len=12)
    for maker in ("write_pat", "stream", "index_pat"):
        path = str(tmp_path / f"{maker}.pat.gz")
        if maker == "write_pat":
            write_pat(f, path, stride=256)
        elif maker == "stream":
            from wgbs_tools_tpu.formats.pat import PatStreamWriter

            with PatStreamWriter(path, stride=256) as w:
                w.write_frags(f)
        else:
            write_pat(f, path, index=False)
            index_pat(path, stride=256)
        assert os.path.isfile(path + ".cdx"), maker
        idx = load_pat_index(path)
        assert idx is not None, maker
        sites, voffs, max_len = idx
        assert len(sites) == len(voffs) > 1
        assert max_len >= int(f.length.max())
    # legacy '.cdx.npz' sidecars (pre-fix) still load
    legacy = str(tmp_path / "legacy.pat.gz")
    write_pat(f, legacy, stride=256)
    os.replace(legacy + ".cdx", legacy + ".cdx.npz")
    assert load_pat_index(legacy) is not None


def test_parse_pat_native_multithreaded_matches_single():
    """The parallel range-split parse (chrom-table merge + extras offset
    rebasing) equals the single-threaded parse on a multi-chromosome pat
    large enough to engage the threaded path, including extra columns."""
    from wgbs_tools_tpu.native import get_lib, parse_pat_native

    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(95)
    rows = []
    for chrom, base in (("chr1", 0), ("chr2", 500000), ("chrX", 900000)):
        ss = np.sort(rng.integers(1, 400000, size=120_000)) + base
        for s in ss:
            pat = "".join(rng.choice(list("CT."), size=rng.integers(1, 9)))
            extra = f"\trg{int(s) % 3}" if s % 7 == 0 else ""
            rows.append(f"{chrom}\t{s}\t{pat}\t{1 + int(s) % 3}{extra}\n")
    data = "".join(rows).encode()
    assert len(data) > (4 << 20)
    multi = parse_pat_native(data)
    single = parse_pat_native(data, threads=1)
    assert multi is not None and single is not None
    for a, b in zip(multi[:5], single[:5]):
        assert np.array_equal(a, b)
    assert multi[5] == single[5]  # chrom names, first-appearance order
    ea, eb = multi[6], single[6]
    assert (ea is None) == (eb is None)
    if ea is not None:
        assert all(x == y for x, y in zip(ea, eb))


def test_iter_pat_region_matches_read_pat():
    """Streaming region iteration (indexed seek + chunked parse) yields the
    same fragments as read_pat(region_sites), incl. across chunk cuts."""
    import tempfile

    from tests.synth import random_frags
    from wgbs_tools_tpu.formats.pat import (iter_pat_region, read_pat,
                                            write_pat, frags_to_bytes)

    frags = random_frags(np.random.default_rng(97), 20_000, 100_000,
                         max_len=14).sort().collapse()
    with tempfile.TemporaryDirectory() as td:
        p = td + "/r.pat.gz"
        write_pat(frags, p)
        for sites in ((5_000, 42_000), (1, 100_001), (99_000, 100_001)):
            want = read_pat(p, region_sites=sites)
            parts = list(iter_pat_region(p, sites, chunk_bytes=1 << 14))
            got = b"".join(frags_to_bytes(f) for f in parts)
            assert got == frags_to_bytes(want), sites
        # unindexed fallback path
        p2 = td + "/r2.pat.gz"
        write_pat(frags, p2, index=False)
        want = read_pat(p, region_sites=(5_000, 42_000))
        parts = list(iter_pat_region(p2, (5_000, 42_000),
                                     chunk_bytes=1 << 14))
        got = b"".join(frags_to_bytes(f) for f in parts)
        assert got == frags_to_bytes(want)
