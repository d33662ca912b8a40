"""External-interop checks against REAL htslib/samtools-produced files.

No tabix/samtools binaries exist on this machine, but the reference tree
ships genuine htslib artifacts:
  - supplemental/hg19.annotations.bed.gz      (bgzip-compressed, ~100k rows)
  - supplemental/hg19.annotations.bed.gz.tbi  (tabix index)
  - tutorial/bams/*.bam + *.bam.bai           (BGZF BAMs + samtools indexes)

These validate our self-written BGZF reader/writer, virtual-offset
handling, and the hts binning scheme (formats/csi.py) field-for-field
against what htslib actually wrote — guarding exactly the class of
endianness/bin-offset bugs that round-trip tests cannot catch.
"""

import gzip
import os.path as op
import struct

import numpy as np
import pytest

from wgbs_tools_tpu.formats.bgzf import BgzfReader, BgzfWriter
from wgbs_tools_tpu.formats.csi import reg2bin

SUPP = "/root/reference/supplemental"
ANNO = op.join(SUPP, "hg19.annotations.bed.gz")
TBI = ANNO + ".tbi"
BAM = "/root/reference/tutorial/bams/Left_Ventricle_STL001.IGF2.bam"

pytestmark = pytest.mark.skipif(not op.isfile(TBI),
                                reason="htslib fixtures not present")

# the canonical BGZF EOF marker htslib appends to every file (public spec)
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def parse_tbi(path):
    """Minimal tabix-index parser (from the SAM/tabix spec, independent of
    formats/csi.py). Returns (names, refs) where refs[i] =
    (bins {bin: [(voff_beg, voff_end), ...]}, linear [voff, ...])."""
    buf = gzip.decompress(open(path, "rb").read())
    assert buf[:4] == b"TBI\x01"
    (n_ref, fmt, col_seq, col_beg, col_end, meta, skip,
     l_nm) = struct.unpack_from("<8i", buf, 4)
    off = 36
    names = buf[off : off + l_nm].split(b"\x00")[:-1]
    names = [n.decode() for n in names]
    off += l_nm
    refs = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", buf, off)
        off += 4
        bins = {}
        for _ in range(n_bin):
            b, n_chunk = struct.unpack_from("<Ii", buf, off)
            off += 8
            chunks = []
            for _ in range(n_chunk):
                cb, ce = struct.unpack_from("<QQ", buf, off)
                off += 16
                chunks.append((cb, ce))
            bins[b] = chunks
        (n_intv,) = struct.unpack_from("<i", buf, off)
        off += 4
        ioff = struct.unpack_from(f"<{n_intv}Q", buf, off)
        off += 8 * n_intv
        refs.append((bins, list(ioff)))
    return names, refs


@pytest.fixture(scope="module")
def anno_lines():
    """(names, rows) where rows = per line (name_idx, beg0, end0, voff)."""
    reader = BgzfReader(ANNO)
    names = {}
    rows = []
    while True:
        voff = reader.virtual_offset
        line = reader.readline()
        if not line:
            break
        t = line.rstrip(b"\n").split(b"\t")
        c = t[0].decode()
        if c not in names:
            names[c] = len(names)
        rows.append((names[c], int(t[1]), int(t[2]), voff))
    reader.close()
    return list(names), rows


def test_bgzf_reader_matches_gzip_on_htslib_file():
    ours_chunks = []
    r = BgzfReader(ANNO)
    while True:
        buf = r.read(1 << 20)
        if not buf:
            break
        ours_chunks.append(buf)
    r.close()
    ours = b"".join(ours_chunks)
    with gzip.open(ANNO, "rb") as f:
        expect = f.read()
    assert ours == expect
    # the native multithreaded inflater agrees too
    from wgbs_tools_tpu.native import bgzf_decompress_native

    nat = bgzf_decompress_native(open(ANNO, "rb").read())
    if nat is not None:
        assert nat == expect


def test_bgzf_writer_eof_matches_htslib():
    with open(BAM, "rb") as f:
        f.seek(-28, 2)
        assert f.read() == BGZF_EOF
    import io

    sink = io.BytesIO()
    w = BgzfWriter(sink)
    w.write(b"x" * 100)
    w.close()
    assert sink.getvalue()[-28:] == BGZF_EOF


def _ancestors(b):
    out = []
    while b:
        b = (b - 1) >> 3
        out.append(b)
    return out


def test_hts_binning_consistent_with_htslib_tbi(anno_lines):
    """htslib merges sparse fine bins into ancestor bins when finalizing a
    .tbi, so the recorded bin set is a coarsening of record-level binning.
    Two field-level invariants must hold against our reg2bin (csi.py):
    every htslib bin is one of our record bins or an ancestor of one, and
    every line's virtual offset is covered by a chunk of its own bin or an
    ancestor bin."""
    names, rows = anno_lines
    tbi_names, refs = parse_tbi(TBI)
    assert tbi_names == names
    ours = {}
    for ni, beg, end, _ in rows:
        b = int(reg2bin(beg, max(end, beg + 1)))
        ours.setdefault(ni, set()).update([b] + _ancestors(b))
    for ni in range(len(names)):
        htslib = set(refs[ni][0]) - {37450}
        extra = htslib - ours.get(ni, set())
        assert not extra, f"htslib bins outside our bin ancestry: {extra}"

    covered = 0
    for ni, beg, end, voff in rows:
        b = int(reg2bin(beg, max(end, beg + 1)))
        bins = refs[ni][0]
        ok = any(
            any(cb <= voff < ce for cb, ce in bins.get(bb, []))
            for bb in [b] + _ancestors(b)
        )
        assert ok, (names[ni], beg, end, voff)
        covered += 1
    assert covered > 50000


def test_tbi_query_equivalence(anno_lines):
    """Running the tabix query algorithm (our reg2bins + ancestor union,
    csi.py) over htslib's .tbi chunks returns exactly the rows a brute-force
    scan finds, for random regions — the end-to-end index contract."""
    from wgbs_tools_tpu.formats.csi import reg2bins

    names, rows = anno_lines
    _, refs = parse_tbi(TBI)
    rng = np.random.default_rng(3)
    r = BgzfReader(ANNO)
    n_nonempty = 0
    for _ in range(60):
        ni = int(rng.integers(0, len(names)))
        beg = int(rng.integers(0, 50_000_000))
        end = beg + int(rng.integers(1000, 2_000_000))
        brute = [(c, b, e) for (c, b, e, _) in rows
                 if c == ni and b < end and e > beg]
        bins = refs[ni][0]
        chunks = []
        for bb in np.asarray(reg2bins(beg, end)).tolist():
            chunks += bins.get(int(bb), [])
        got = []
        for cb, ce in sorted(set(chunks)):
            r.seek_virtual(cb)
            while r.virtual_offset < ce:
                line = r.readline()
                if not line:
                    break
                t = line.rstrip(b"\n").split(b"\t")
                b0, e0 = int(t[1]), int(t[2])
                if t[0].decode() == names[ni] and b0 < end and e0 > beg:
                    got.append((ni, b0, e0))
        assert sorted(set(got)) == sorted(set(brute)), (names[ni], beg, end)
        n_nonempty += bool(brute)
    r.close()
    assert n_nonempty > 10


def test_tbi_linear_index_seek(anno_lines):
    """Seeking to htslib's linear-index offsets lands on a line whose
    16kb window matches."""
    names, rows = anno_lines
    _, refs = parse_tbi(TBI)
    r = BgzfReader(ANNO)
    checked = 0
    for ni, (_, ioff) in enumerate(refs):
        for k in range(0, len(ioff), max(1, len(ioff) // 5)):
            if ioff[k] == 0:
                continue
            r.seek_virtual(ioff[k])
            line = r.readline()
            t = line.rstrip(b"\n").split(b"\t")
            assert t[0].decode() == names[ni]
            # first line at/after this voff must end past the window start
            assert int(t[2]) > (k << 14) or int(t[1]) <= (k << 14)
            checked += 1
    r.close()
    assert checked > 20


def test_bai_chunk_offsets_point_at_bam_records():
    """samtools' .bai chunk begins are valid record boundaries under our
    BGZF virtual-offset seeking."""
    buf = open(BAM + ".bai", "rb").read()
    assert buf[:4] == b"BAI\x01"
    (n_ref,) = struct.unpack_from("<i", buf, 4)
    off = 8
    voffs = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", buf, off)
        off += 4
        for _ in range(n_bin):
            b, n_chunk = struct.unpack_from("<Ii", buf, off)
            off += 8
            for _ in range(n_chunk):
                cb, ce = struct.unpack_from("<QQ", buf, off)
                off += 16
                if b != 37450:  # skip the pseudo-bin metadata
                    voffs.append(cb)
        (n_intv,) = struct.unpack_from("<i", buf, off)
        off += 4 + 8 * n_intv

    from wgbs_tools_tpu.pipeline.bam import BamReader

    reader = BamReader(BAM)
    n_refs = len(reader.ref_names)
    r = BgzfReader(BAM)
    assert voffs
    for voff in voffs[:50]:
        r.seek_virtual(voff)
        head = r.read(36)
        block_size, ref_id, pos = struct.unpack_from("<iii", head, 0)
        assert 36 <= block_size < 1 << 20
        assert 0 <= ref_id < n_refs
        assert 0 <= pos < 3 << 28
    r.close()
    reader.close()


def test_write_tbi_matches_htslib_fixture(tmp_path):
    """Rebuilding the .tbi for the htslib-produced annotations bed yields
    the SAME index field-for-field: bins, merged chunks (incl. the
    compress_binning parent-merge and block-level chunk merge), the 16kb
    linear index, and the 37450 pseudo-bin record counts."""
    import shutil

    from wgbs_tools_tpu.formats.blocks import index_bed
    from wgbs_tools_tpu.formats.csi import read_tbi

    dst = str(tmp_path / "anno.bed.gz")
    shutil.copy(ANNO, dst)
    index_bed(dst)
    ours = read_tbi(dst + ".tbi")
    theirs = read_tbi(TBI)
    assert ours["names"] == theirs["names"]
    assert ours["preset"] == theirs["preset"]
    assert ours["cols"] == theirs["cols"]
    for rid in range(len(theirs["names"])):
        ob, ol = ours["refs"][rid]
        tb, tl = theirs["refs"][rid]
        assert {k: [tuple(c) for c in v] for k, v in ob.items()} == \
            {k: [tuple(c) for c in v] for k, v in tb.items()}, rid
        assert ol == tl, rid
