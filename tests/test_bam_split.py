"""add_cpg_counts / split_by_meth / split_by_allele tests."""

import numpy as np
import pytest

from tests.bisim import dump_bam, simulate_reads
from wgbs_tools_tpu.cli.main import main as cli_main
from wgbs_tools_tpu.genome.cpg_index import read_fasta
from wgbs_tools_tpu.pipeline.bam import BamReader
from wgbs_tools_tpu.pipeline.bam_split import (
    add_cpg_counts_bam,
    split_bam_by_allele,
    split_bam_by_meth,
)


@pytest.fixture(scope="module")
def counts_bam(tmp_path_factory, mini_genome):
    d = tmp_path_factory.mktemp("split")
    rng = np.random.default_rng(31)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, meth = simulate_reads(seqs, rng, n_reads=300, paired=True,
                                 meth_rate=0.5)
    bam = dump_bam(reads, seqs, str(d / "in.bam"))
    out = str(d / "in.counts.bam")
    add_cpg_counts_bam(bam, out, genome=mini_genome)
    return d, out, reads


def test_add_cpg_counts_tags(counts_bam, mini_genome):
    d, out, reads = counts_bam
    reader = BamReader(out)
    recs = list(reader)
    assert len(recs) > 0
    n_tagged = 0
    for rec in recs:
        yi = rec.get_tag("YI")
        assert yi is not None
        m, u = (int(x) for x in yi.split(","))
        assert m >= 0 and u >= 0
        if m + u > 0:
            n_tagged += 1
    assert n_tagged > len(recs) * 0.5
    # mates share the same YI value
    by_name = {}
    for rec in recs:
        by_name.setdefault(rec.qname, []).append(rec.get_tag("YI"))
    for vals in by_name.values():
        assert len(set(vals)) == 1


def test_split_by_meth(counts_bam):
    d, out, _ = counts_bam
    m_path, u_path = split_bam_by_meth(out, out_dir=str(d), homog_prop=0.75,
                                       min_cpg=3)
    for path, check in ((m_path, lambda p: p >= 0.75),
                        (u_path, lambda p: p <= 0.25)):
        recs = list(BamReader(path))
        assert recs
        for rec in recs:
            m, u = (int(x) for x in rec.get_tag("YI").split(","))
            assert m + u >= 3
            assert check(m / (m + u))


def test_split_by_meth_requires_yi(counts_bam, mini_genome, tmp_path):
    from wgbs_tools_tpu.utils import IllegalArgumentError

    rng = np.random.default_rng(32)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=20, paired=False)
    bam = dump_bam(reads, seqs, str(tmp_path / "noyi.bam"))
    with pytest.raises(IllegalArgumentError):
        split_bam_by_meth(bam, out_dir=str(tmp_path))


def test_split_by_allele(mini_genome, tmp_path):
    rng = np.random.default_rng(33)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=400, paired=False)
    # pick a SNP position on chr1 that is an A (no bisulfite ambiguity for
    # A/G on top strand reads aligned to it)
    ref = seqs["chr1"]
    pos0 = int(np.nonzero(ref[1000:2000] == ord("A"))[0][0]) + 1000
    # flip half the reads covering it to 'G'
    n_cover = 0
    for rd in reads:
        if rd.chrom == "chr1" and rd.pos0 <= pos0 < rd.pos0 + len(rd.seq):
            n_cover += 1
            if n_cover % 2 == 0:
                s = bytearray(rd.seq)
                s[pos0 - rd.pos0] = ord("G")
                rd.seq = bytes(s)
    bam = dump_bam(reads, seqs, str(tmp_path / "snp.bam"))
    p1, p2 = split_bam_by_allele(bam, "chr1", pos0 + 1, "A", "G",
                                 out_dir=str(tmp_path), genome=mini_genome)
    r1 = list(BamReader(p1))
    r2 = list(BamReader(p2))
    if n_cover >= 2:
        assert len(r1) > 0 and len(r2) > 0
    for rec in r1:
        from wgbs_tools_tpu.pipeline.calling import clean_cigar, is_bottom

        seq = clean_cigar(rec.seq, rec.cigar)
        idx = pos0 - rec.pos
        # top-strand A allele reads must show A; bottom strand may show A only
        base = chr(seq[idx])
        assert base in ("A",) or is_bottom(rec.flag, False)


def test_cli_wiring(counts_bam, mini_genome):
    d, out, _ = counts_bam
    assert cli_main(["split_by_meth", out, "0.6", "-o", str(d)]) == 0
