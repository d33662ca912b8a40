"""Bounded-memory streaming bam2pat (pipeline/bam_stream.py): output
byte-parity with the whole-file columnar path + RSS boundedness."""

import os
import os.path as op
import subprocess
import sys

import numpy as np
import pytest

from tests.bisim import add_cigar_variants, dump_bam, simulate_reads
from wgbs_tools_tpu.formats.bgzf import decompress_file
from wgbs_tools_tpu.genome.cpg_index import read_fasta
from wgbs_tools_tpu.pipeline.bam2pat_run import bam2pat

pytestmark = pytest.mark.skipif(
    __import__("wgbs_tools_tpu.native", fromlist=["get_lib"]).get_lib()
    is None,
    reason="streaming path requires the native library",
)


def _run_both(bam, genome, tmp_path, slab=1 << 16, **kw):
    d_mem = tmp_path / "mem"
    d_st = tmp_path / "st"
    d_mem.mkdir(exist_ok=True)
    d_st.mkdir(exist_ok=True)
    _, p_mem, s_mem = bam2pat(bam, genome=genome, out_dir=str(d_mem),
                              stream=False, **kw)
    _, p_st, s_st = bam2pat(bam, genome=genome, out_dir=str(d_st),
                            stream=True, slab_bytes=slab, **kw)
    assert decompress_file(p_mem) == decompress_file(p_st), \
        "streamed pat text != in-memory pat text"
    for k, v in s_mem.__dict__.items():
        assert s_st.__dict__[k] == v, (k, v, s_st.__dict__[k])
    return p_mem, p_st


def test_stream_pe_matches_memory(mini_genome, tmp_path):
    """Paired-end, CIGAR variants, long inserts (mates crossing slab
    boundaries) and MAPQ-lost mates — tiny slabs force many carries."""
    rng = np.random.default_rng(31)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=1500, paired=True,
                              insert=4000)
    reads = add_cigar_variants(reads, seqs, rng, frac=0.2)
    # degrade some read2 MAPQs: their mates become lost-singles the
    # streaming path must retire via the PNEXT watermark
    for r in reads:
        if r.flag in (147, 163) and rng.random() < 0.1:
            r.mapq = 2
    bam = dump_bam(reads, seqs, str(tmp_path / "pe.bam"))
    p_mem, p_st = _run_both(bam, mini_genome, tmp_path, slab=1 << 15)
    # region random access through the streamed .cdx agrees
    from wgbs_tools_tpu.formats.pat import read_pat

    a = read_pat(p_mem, region_sites=(200, 900))
    b = read_pat(p_st, region_sites=(200, 900))
    assert np.array_equal(a.start, b.start)
    assert np.array_equal(a.count, b.count)


def test_stream_se_matches_memory(mini_genome, tmp_path):
    rng = np.random.default_rng(32)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=1200, paired=False)
    bam = dump_bam(reads, seqs, str(tmp_path / "se.bam"))
    _run_both(bam, mini_genome, tmp_path, slab=1 << 15)


def test_stream_flags_and_filters(mini_genome, tmp_path):
    """clip/min_cpg and strand filters ride the streaming path unchanged."""
    rng = np.random.default_rng(33)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=800, paired=True)
    bam = dump_bam(reads, seqs, str(tmp_path / "fl.bam"))
    _run_both(bam, mini_genome, tmp_path, clip=2, min_cpg=2)
    _run_both(bam, mini_genome, tmp_path, top_strand=True)


def test_stream_nanopore_matches_memory(mini_genome, tmp_path):
    from tests.test_nanopore import dump_np_bam, simulate_np_reads

    rng = np.random.default_rng(34)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads = simulate_np_reads(seqs, rng, n_reads=300, conv="?", with_h=True,
                              complex_cigar=True)
    bam = dump_np_bam(reads, seqs, str(tmp_path / "np.bam"))
    _run_both(bam, mini_genome, tmp_path, slab=1 << 15)


def test_stream_mbias_tables_match(mini_genome, tmp_path):
    rng = np.random.default_rng(35)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=600, paired=True)
    bam = dump_bam(reads, seqs, str(tmp_path / "mb.bam"))
    d_mem = tmp_path / "mem"
    d_st = tmp_path / "st"
    d_mem.mkdir()
    d_st.mkdir()
    _, p1, _ = bam2pat(bam, genome=mini_genome, out_dir=str(d_mem),
                       stream=False, mbias_prefix=str(d_mem / "m"))
    _, p2, _ = bam2pat(bam, genome=mini_genome, out_dir=str(d_st),
                       stream=True, slab_bytes=1 << 15,
                       mbias_prefix=str(d_st / "m"))
    assert decompress_file(p1) == decompress_file(p2)
    for suff in (".OT.txt", ".OB.txt"):
        assert (d_mem / ("m" + suff)).read_bytes() == \
            (d_st / ("m" + suff)).read_bytes()


_RSS_SCRIPT = r"""
import os, resource, sys
sys.path.insert(0, {repo!r})
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
from wgbs_tools_tpu.genome.refdir import Genome
from wgbs_tools_tpu.pipeline.bam2pat_run import bam2pat

os.environ["WGBS_TPU_REFDIR"] = {refdir!r}
g = Genome("mini")
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on linux
_, out, stats = bam2pat({bam!r}, genome=g, out_dir={out_dir!r},
                        stream=True, slab_bytes=1 << 16)
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print("RSS", base, peak, stats.nr_lines)
"""


def test_stream_rss_bounded(mini_genome, tmp_path):
    """Converting a BAM many times larger than the slab keeps peak RSS a
    small multiple of the slab size — the whole-file path would hold the
    full decompressed BAM (plus all fragments) resident."""
    rng = np.random.default_rng(36)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    # ~60 MB decompressed: 300k single-end 100bp reads over the mini genome
    from wgbs_tools_tpu.pipeline.bam import BamRecord, write_bam
    from tests.bisim import bisulfite_seq

    ref_names = list(seqs.keys())
    chrom = "chr1"
    ref = seqs[chrom]
    meth = rng.random(len(ref)) < 0.5
    n = 300_000
    positions = np.sort(rng.integers(0, len(ref) - 130, size=n))
    records = []
    for i in range(n):
        p = int(positions[i])
        s = bisulfite_seq(ref, p, 100, meth, False)
        records.append(BamRecord(f"r{i:07d}", 0, 0, p, 60, [("M", 100)], s,
                                 b"", b""))
    bam = str(tmp_path / "big.bam")
    write_bam(bam, ref_names, [len(s) for s in seqs.values()], records)
    del records
    # bisulfite text compresses ~40x, so bound the COMPRESSED slab at 64 KiB
    # (~2.5 MB decompressed per slab) and require many slabs
    raw_size = op.getsize(bam)
    assert raw_size > 20 << 16, "fixture should span many 64KiB slabs"

    out_dir = tmp_path / "o"
    out_dir.mkdir()
    script = _RSS_SCRIPT.format(
        repo=op.dirname(op.dirname(op.abspath(__file__))),
        refdir=os.environ["WGBS_TPU_REFDIR"],
        bam=bam, out_dir=str(out_dir))
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("RSS")][0]
    _, base_kib, peak_kib, nr_lines = line.split()
    assert int(nr_lines) == n
    # growth over the post-import baseline stays well under the
    # decompressed BAM size (~60 MB text + ~50 MB columnar arrays)
    growth_mib = (int(peak_kib) - int(base_kib)) / 1024
    assert growth_mib < 60, f"streaming RSS grew {growth_mib:.0f} MiB"
    # and the output really converted
    from wgbs_tools_tpu.formats.pat import read_pat

    frags = read_pat(op.join(str(out_dir), "big.pat.gz"))
    assert int(frags.count.sum()) > 0


def test_stream_truncated_bam_raises(mini_genome, tmp_path):
    from wgbs_tools_tpu.pipeline.bam_stream import iter_bam_columnar_slabs
    from wgbs_tools_tpu.utils import IllegalArgumentError

    rng = np.random.default_rng(37)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=50, paired=False)
    bam = dump_bam(reads, seqs, str(tmp_path / "t.bam"))
    data = open(bam, "rb").read()
    cut = str(tmp_path / "cut.bam")
    with open(cut, "wb") as f:
        f.write(data[: len(data) // 2])
    with pytest.raises(IllegalArgumentError):
        for _ in iter_bam_columnar_slabs(cut, slab_bytes=1 << 14):
            pass


def test_stream_ont_record_fallback(mini_genome, tmp_path):
    """A record whose ML tag uses a non-byte subtype (B,S — legal values,
    nonstandard encoding): the native columnar parser rejects it per-record;
    the streaming path must route exactly that record through the scalar
    parser and keep streaming (ref per-read degradation:
    src/pipeline_wgbs/ont.cpp:90-221), byte-equal to the in-memory path."""
    import struct

    from tests.test_nanopore import simulate_np_reads
    from wgbs_tools_tpu.pipeline.bam import BamRecord, write_bam
    from wgbs_tools_tpu.pipeline.bam_stream import bam2pat_streaming

    rng = np.random.default_rng(38)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads = simulate_np_reads(seqs, rng, n_reads=200, conv="?")
    ref_names = list(seqs.keys())
    ordered = sorted(reads, key=lambda r: (ref_names.index(r.chrom), r.pos0))
    odd = {len(ordered) // 3, 2 * len(ordered) // 3}
    records = []
    for i, rd in enumerate(ordered):
        blob = b"MMZ" + rd.mm.encode() + b"\x00"
        if rd.ml is not None:
            if i in odd:
                blob += (b"MLBS" + struct.pack("<I", len(rd.ml))
                         + struct.pack(f"<{len(rd.ml)}H", *rd.ml))
            else:
                blob += (b"MLBC" + struct.pack("<I", len(rd.ml))
                         + bytes(rd.ml))
        records.append(
            BamRecord(rd.qname, rd.flag, ref_names.index(rd.chrom), rd.pos0,
                      rd.mapq, rd.cigar_list(), rd.seq, b"", blob))
    bam = str(tmp_path / "ont_mixed.bam")
    write_bam(bam, ref_names, [len(s) for s in seqs.values()], records)

    # precondition: the native scan really rejects those records, so the
    # whole-file columnar gate fails and per-record routing is exercised
    from wgbs_tools_tpu.pipeline.bam_columnar import scan_bam_columnar
    from wgbs_tools_tpu.pipeline.bam_columnar_ont import scan_mmml

    buf, _h, _n, _l, cols, offs, rec_end = scan_bam_columnar(bam)
    assert scan_mmml(buf, offs, rec_end) is None

    _, p_mem, s_mem = bam2pat(bam, genome=mini_genome,
                              out_dir=str(tmp_path), stream=False)
    # direct call: StreamUnsupported must NOT be raised (a silent in-memory
    # fallback would make this test vacuous)
    out = str(tmp_path / "st.pat.gz")
    _, p_st, s_st = bam2pat_streaming(bam, mini_genome, mini_genome.index,
                                      out, 10, None, slab_bytes=1 << 15)
    assert decompress_file(p_mem) == decompress_file(p_st)
    for k, v in s_mem.__dict__.items():
        assert s_st.__dict__[k] == v, (k, v, s_st.__dict__[k])
