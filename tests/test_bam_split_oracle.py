"""Oracle conformance for snp_patter (N9) and add_cpg_counts (N10).

Byte-level comparisons against the reference binaries compiled from
/root/reference (src/pipeline_wgbs/snp_patter.cpp, add_cpg_counts.cpp) on
synthetic bisulfite reads with SNPs planted at C/T- and G/A-ambiguous
positions — exactly where the strand-aware ambiguity rules
(snp_patter.cpp:16-59) hide silent divergence.
"""

import os
import subprocess

import numpy as np
import pytest

from tests.bisim import dump_bam, dump_sam, simulate_reads
from tests.oracle import oracle
from tests.test_bam2pat import shim_path  # noqa: F401
from wgbs_tools_tpu.genome.cpg_index import read_fasta
from wgbs_tools_tpu.pipeline.bam import BamReader, parse_tag
from wgbs_tools_tpu.pipeline.bam_split import (add_cpg_counts_bam,
                                               split_bam_by_allele)


def _plant_snp(reads, seqs, rng, let1, let2, quals=False):
    """Pick a SNP position covered by many reads; rewrite each covering
    read's base to a (possibly bisulfite-converted) allele base, plus some
    garbage bases. Returns (chrom, snp_pos0)."""
    chrom = list(seqs.keys())[0]
    cov = {}
    for rd in reads:
        if rd.chrom != chrom or "M" not in rd.cigar_str:
            continue
        for p in range(rd.pos0, rd.pos0 + len(rd.seq)):
            cov[p] = cov.get(p, 0) + 1
    snp_pos0 = max(cov, key=cov.get)

    conv = {"C": "T", "G": "A"}
    for rd in reads:
        if rd.chrom != chrom:
            continue
        i = snp_pos0 - rd.pos0
        if not (0 <= i < len(rd.seq)):
            continue
        r = rng.random()
        if r < 0.45:
            base = let1
        elif r < 0.9:
            base = let2
        else:
            base = "N"  # unclassifiable
        # the sequencer sees the bisulfite-converted base on the read's
        # conversion strand: top strand converts C->T, bottom G->A
        bottom = bool(rd.flag & 16)
        if base in conv and rng.random() < 0.5 and (
                (base == "C" and not bottom) or (base == "G" and bottom)):
            base = conv[base]
        seq = bytearray(rd.seq)
        seq[i] = ord(base)
        rd.seq = bytes(seq)
        if quals:
            q = list("F" * len(rd.seq))
            if rng.random() < 0.3:
                q[i] = "#"  # phred 2: below any reasonable qual_filter
            rd.qual = "".join(q)
    return chrom, snp_pos0


def _ref_snp_patter(reads, seqs, pos1, let1, let2, qual_filter, paired,
                    tmp_path):
    """reference [match_maker |] snp_patter; returns kept (qname, flag)."""
    sam = dump_sam(reads, seqs, str(tmp_path / f"snp_{let1}{let2}.sam"))
    sp = oracle("snp_patter")
    cmd = [sp, "--snp_pos", str(pos1), "--snp_let1", let1,
           "--snp_let2", let2, "--qual_filter", str(qual_filter)]
    with open(sam, "rb") as f:
        if paired:
            p1 = subprocess.Popen([oracle("match_maker")], stdin=f,
                                  stdout=subprocess.PIPE)
            p2 = subprocess.Popen(cmd, stdin=p1.stdout,
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.DEVNULL)
            p1.stdout.close()
            out, _ = p2.communicate()
        else:
            out = subprocess.run(cmd, stdin=f, stdout=subprocess.PIPE,
                                 stderr=subprocess.DEVNULL).stdout
    kept = []
    for line in out.decode().splitlines():
        t = line.split("\t")
        kept.append((t[0], int(t[1])))
    return sorted(kept)


@pytest.mark.parametrize("let1,let2,paired,qf", [
    ("C", "A", False, 0),
    ("C", "A", True, 0),
    ("G", "T", False, 0),
    ("G", "T", True, 0),
    ("A", "T", True, 0),
    ("C", "G", False, 0),
    ("C", "T", True, 0),   # top-strand reads must be rejected wholesale
    ("G", "A", True, 0),   # bottom-strand reads must be rejected wholesale
    ("C", "A", True, 30),  # base-quality filter
])
def test_snp_patter_oracle(mini_genome, tmp_path, let1, let2, paired, qf):
    seed = sum(ord(c) for c in let1 + let2) * 1000 + paired * 7 + qf
    rng = np.random.default_rng(seed)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    # simulate over one short chromosome only, for deep SNP coverage
    sub = {"chrX": seqs["chrX"]}
    reads, _ = simulate_reads(sub, rng, n_reads=900, paired=paired)
    chrom, snp_pos0 = _plant_snp(reads, sub, rng, let1, let2, quals=qf > 0)
    pos1 = snp_pos0 + 1

    expect1 = _ref_snp_patter(reads, sub, pos1, let1, let2, qf, paired,
                              tmp_path)
    expect2 = _ref_snp_patter(reads, sub, pos1, let2, let1, qf, paired,
                              tmp_path)

    bam = dump_bam(reads, sub, str(tmp_path / "snp.bam"))
    out1, out2 = split_bam_by_allele(bam, chrom, pos1, let1, let2,
                                     out_dir=str(tmp_path),
                                     genome=mini_genome, min_mapq=0,
                                     exclude_flags=0, qual_filter=qf)

    def kept(path):
        reader = BamReader(path)
        res = sorted((r.qname, r.flag) for r in reader)
        reader.close()
        return res

    assert kept(out1) == expect1
    assert kept(out2) == expect2
    assert len(expect1) > 3 or (let1, let2) in [("C", "T"), ("G", "A")]


def _ref_add_cpg_counts(reads, seqs, genome, chrom, shim_dir, tmp_path,
                        paired, min_cpg, clip, add_pat):
    sam = dump_sam([r for r in reads if r.chrom == chrom], seqs,
                   str(tmp_path / f"acc_{chrom}.sam"))
    env = dict(os.environ, PATH=shim_dir + ":" + os.environ["PATH"])
    cmd = [oracle("add_cpg_counts"), genome.join("CpG.bed.gz"), chrom,
           "--min_cpg", str(min_cpg), "--clip", str(clip)]
    if add_pat:
        cmd.append("--pat")
    with open(sam, "rb") as f:
        if paired:
            p1 = subprocess.Popen([oracle("match_maker")], stdin=f,
                                  stdout=subprocess.PIPE)
            p2 = subprocess.Popen(cmd, stdin=p1.stdout,
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.DEVNULL, env=env)
            p1.stdout.close()
            out, _ = p2.communicate()
        else:
            out = subprocess.run(cmd, stdin=f, stdout=subprocess.PIPE,
                                 stderr=subprocess.DEVNULL, env=env).stdout
    rows = []
    for line in out.decode().splitlines():
        t = line.split("\t")
        yi = next(x[5:] for x in t[11:] if x.startswith("YI:Z:"))
        xp = next((x[5:] for x in t[11:] if x.startswith("XP:Z:")), None)
        rows.append((t[0], int(t[1]), int(t[3]), yi, xp))
    return sorted(rows)


@pytest.mark.parametrize("paired,min_cpg,clip,add_pat", [
    (False, 1, 0, False),
    (True, 1, 0, True),
    (True, 4, 2, True),
])
def test_add_cpg_counts_oracle(mini_genome, tmp_path, shim_path, paired,
                               min_cpg, clip, add_pat):
    rng = np.random.default_rng(97 + min_cpg + clip)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=250, paired=paired)

    bam = dump_bam(reads, seqs, str(tmp_path / "acc.bam"))
    out = str(tmp_path / "acc.out.bam")
    add_cpg_counts_bam(bam, out, genome=mini_genome, min_mapq=0,
                       exclude_flags=0, min_cpg=min_cpg, clip=clip,
                       add_pat=add_pat)
    reader = BamReader(out)
    got = []
    for r in reader:
        yi = parse_tag(r.tags, b"YI")
        xp = parse_tag(r.tags, b"XP") if add_pat else None
        got.append((r.qname, r.flag, r.pos + 1, yi, xp))
    reader.close()
    got = sorted(got)

    expect = []
    for chrom in mini_genome.get_chroms():
        if any(r.chrom == chrom for r in reads):
            expect += _ref_add_cpg_counts(reads, seqs, mini_genome, chrom,
                                          shim_path, tmp_path, paired,
                                          min_cpg, clip, add_pat)
    assert got == sorted(expect)
    assert len(got) > 50
