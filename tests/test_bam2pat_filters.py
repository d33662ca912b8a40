"""blacklist/whitelist region filtering + blueprint conversion filter."""

import numpy as np
import pytest

from tests.bisim import bisulfite_seq, dump_bam, simulate_reads, SimRead
from wgbs_tools_tpu.genome.cpg_index import read_fasta
from wgbs_tools_tpu.pipeline.bam2pat_run import bam2pat
from wgbs_tools_tpu.pipeline.calling import passes_bisulfite_conversion


def test_whitelist_blacklist(mini_genome, tmp_path):
    rng = np.random.default_rng(55)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=300, paired=False)
    bam = dump_bam(reads, seqs, str(tmp_path / "wl.bam"))

    bed = tmp_path / "regions.bed"
    bed.write_text("chr1\t0\t10000\n")

    all_frags, _, _ = bam2pat(bam, genome=mini_genome, write_output=False)
    wl_frags, _, _ = bam2pat(bam, genome=mini_genome, write_output=False,
                             whitelist=str(bed))
    bl_frags, _, _ = bam2pat(bam, genome=mini_genome, write_output=False,
                             blacklist=str(bed))
    assert 0 < wl_frags.count.sum() < all_frags.count.sum()
    assert 0 < bl_frags.count.sum() < all_frags.count.sum()
    # whitelist + blacklist partition the reads
    assert (wl_frags.count.sum() + bl_frags.count.sum()
            == all_frags.count.sum())
    # whitelist reads start within/near the region
    idx = mini_genome.index
    s_lim = idx.locus2site("chr1", 11000)
    wl_chr1 = wl_frags.take(
        np.array([wl_frags.chrom_names[c] == "chr1"
                  for c in wl_frags.chrom_id])
    )
    assert (wl_chr1.start < s_lim).all()


def test_blueprint_conversion_filter_unit():
    #        0123456789
    ref_s = b"ACTTCATCAG"  # C at 1(+T) 4(+A) 7(+A) — none CpG
    # fully converted read: all non-CpG Cs -> T
    conv = b"ATTTTATTAG"
    # margin=0 so the 3 CH sites count
    assert passes_bisulfite_conversion(conv, ref_s, bottom=False, margin=0)
    # unconverted read keeps Cs
    assert not passes_bisulfite_conversion(ref_s, ref_s, bottom=False,
                                           margin=0)
    # too few CH sites
    assert not passes_bisulfite_conversion(b"AT", b"AC", bottom=False,
                                           margin=0)


def test_blueprint_in_pipeline(mini_genome, tmp_path):
    rng = np.random.default_rng(56)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, meth = simulate_reads(seqs, rng, n_reads=150, paired=False)
    # append unconverted reads (raw reference slices, top strand)
    ref = seqs["chr1"]
    bad = []
    for i in range(50):
        pos = int(rng.integers(0, len(ref) - 102))
        bad.append(SimRead(f"bad{i:04d}", 0, "chr1", pos,
                           bytes(ref[pos : pos + 100]), "100M"))
    bam = dump_bam(reads + bad, seqs, str(tmp_path / "bp.bam"))

    plain, _, s1 = bam2pat(bam, genome=mini_genome, write_output=False)
    filt, _, s2 = bam2pat(bam, genome=mini_genome, write_output=False,
                          blueprint=True)
    assert s2.nr_bad_conv >= 50  # all unconverted reads dropped
    assert filt.count.sum() < plain.count.sum()


def test_strand_filters_partition(mini_genome, tmp_path):
    """--top_strand/--bottom_strand split a PE BAM into OT/OB reads."""
    rng = np.random.default_rng(57)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=200, paired=True)
    bam = dump_bam(reads, seqs, str(tmp_path / "st.bam"))

    all_f, _, all_s = bam2pat(bam, genome=mini_genome, write_output=False)
    top_f, _, top_s = bam2pat(bam, genome=mini_genome, write_output=False,
                              top_strand=True)
    bot_f, _, bot_s = bam2pat(bam, genome=mini_genome, write_output=False,
                              bottom_strand=True)
    assert top_s.nr_lines > 0 and bot_s.nr_lines > 0
    assert top_s.nr_lines + bot_s.nr_lines == all_s.nr_lines
    assert top_f.count.sum() + bot_f.count.sum() == all_f.count.sum()
    # exact-FLAG whitelists (ref: bam2pat.py:159-168)
    top_flags = {r.flag for r in reads if r.flag in (99, 147)}
    assert top_flags == {99, 147}


def test_include_flags_filter(mini_genome, tmp_path):
    """--include_flags requires FLAG bits (samtools view -f)."""
    rng = np.random.default_rng(58)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=150, paired=False)
    bam = dump_bam(reads, seqs, str(tmp_path / "inc.bam"))
    n_rev = sum(1 for r in reads if r.flag & 16)
    assert 0 < n_rev < len(reads)
    _, _, s_all = bam2pat(bam, genome=mini_genome, write_output=False)
    _, _, s_rev = bam2pat(bam, genome=mini_genome, write_output=False,
                          include_flags=16)
    assert s_all.nr_lines == len(reads)
    assert s_rev.nr_lines == n_rev


def test_read_group_filter(mini_genome, tmp_path):
    """--read_group keeps only reads whose RG:Z tag matches."""
    from wgbs_tools_tpu.pipeline.bam import BamRecord, write_bam

    rng = np.random.default_rng(59)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=120, paired=False)
    ref_names = list(seqs.keys())
    ref_lengths = [len(s) for s in seqs.values()]
    order = sorted(range(len(reads)),
                   key=lambda i: (ref_names.index(reads[i].chrom),
                                  reads[i].pos0))
    records, n_a = [], 0
    for k, i in enumerate(order):
        rd = reads[i]
        rg = b"grpA" if k % 2 == 0 else b"grpB"
        n_a += rg == b"grpA"
        records.append(BamRecord(rd.qname, rd.flag,
                                 ref_names.index(rd.chrom), rd.pos0, rd.mapq,
                                 rd.cigar_list(), rd.seq, b"",
                                 b"RGZ" + rg + b"\x00"))
    bam = str(tmp_path / "rg.bam")
    write_bam(bam, ref_names, ref_lengths, records)

    _, _, s_all = bam2pat(bam, genome=mini_genome, write_output=False)
    _, _, s_a = bam2pat(bam, genome=mini_genome, write_output=False,
                        read_group="grpA")
    assert s_all.nr_lines == len(reads)
    assert s_a.nr_lines == n_a


def test_whitelist_with_cigar_variants(mini_genome, tmp_path):
    """Region filtering must use the reference-consumed span (vectorized
    CIGAR scan), not the sequence length."""
    from tests.bisim import add_cigar_variants

    rng = np.random.default_rng(60)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=240, paired=False)
    reads = add_cigar_variants(reads, seqs, rng, frac=0.4)
    bam = dump_bam(reads, seqs, str(tmp_path / "wlc.bam"))
    bed = tmp_path / "regions.bed"
    bed.write_text("chr1\t0\t20000\nchr2\t5000\t15000\n")

    all_f, _, _ = bam2pat(bam, genome=mini_genome, write_output=False)
    wl_f, _, _ = bam2pat(bam, genome=mini_genome, write_output=False,
                         whitelist=str(bed))
    bl_f, _, _ = bam2pat(bam, genome=mini_genome, write_output=False,
                         blacklist=str(bed))
    assert wl_f.count.sum() + bl_f.count.sum() == all_f.count.sum()
    assert 0 < wl_f.count.sum() < all_f.count.sum()


def test_mbias_columnar_equals_record_path(mini_genome, tmp_path):
    """--mbias tables from the columnar fast path == record path's."""
    rng = np.random.default_rng(61)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=200, paired=True)
    bam = dump_bam(reads, seqs, str(tmp_path / "mbc.bam"))

    p1 = str(tmp_path / "col.mbias")
    bam2pat(bam, genome=mini_genome, write_output=False, mbias_prefix=p1)

    # force the record path by disabling the native scan
    import wgbs_tools_tpu.pipeline.bam_columnar as bc
    orig = bc.scan_bam_columnar
    bc.scan_bam_columnar = lambda path: None
    try:
        p2 = str(tmp_path / "rec.mbias")
        bam2pat(bam, genome=mini_genome, write_output=False, mbias_prefix=p2)
    finally:
        bc.scan_bam_columnar = orig

    for strand in ("OT", "OB"):
        a = np.loadtxt(f"{p1}.{strand}.txt", skiprows=1)
        b = np.loadtxt(f"{p2}.{strand}.txt", skiprows=1)
        assert (a == b).all(), strand
    assert np.loadtxt(f"{p1}.OT.txt", skiprows=1).sum() > 0
