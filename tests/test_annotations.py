"""Annotation + Illumina array-map subsystem (ref: init_genome.py:189-210,
genomic_region.py:58-70,212-232, convert.py:60,257-273, beta_to_450k.py)."""

import gzip
import os.path as op

import numpy as np
import pytest

from tests.synth import make_fasta
from wgbs_tools_tpu.cli.main import main as cli_main
from wgbs_tools_tpu.genome import Genome, init_genome
from wgbs_tools_tpu.genome.region import GenomicRegion


@pytest.fixture(scope="module")
def anno_genome(tmp_path_factory, mini_genome):
    """A genome initialized WITH annotations + ilmn map (mini_genome's
    fixture already exported WGBS_TPU_REFDIR; stay in that root)."""
    d = tmp_path_factory.mktemp("anno")
    rng = np.random.default_rng(5)
    fasta = make_fasta(str(d / "anno.fa"), {"chr1": 40000, "chr2": 20000},
                       rng)

    anno = str(d / "anno_src.bed")
    with open(anno, "w") as f:
        f.write("chr1\t1000\t5000\tpromoter\tGENE_A\n")
        f.write("chr1\t4000\t9000\texon\tGENE_A\n")
        f.write("chr1\t20000\t25000\tintron\tGENE_B\n")
        f.write("chr2\t100\t400\ttss\tGENE_C\n")

    refdir = init_genome("minianno", fasta, force=True, set_default=False,
                         annotations=anno)
    g = Genome("minianno")

    # ilmn map over real sites of this genome: cg ids -> site index (with a
    # 450K-membership third column for some)
    sites = [5, 17, 42, 100]
    ilmn = str(d / "ilmn_src.tsv")
    with open(ilmn, "w") as f:
        for k, s in enumerate(sites):
            f.write(f"cg{k:08d}\t{s}\t{1 if k % 2 == 0 else 0}\n")
    init_genome("minianno", fasta, force=True, set_default=False,
                annotations=anno, ilmn2cpg=ilmn)
    g = Genome("minianno")
    return g, sites


def test_refdir_ingestion(anno_genome):
    g, _ = anno_genome
    assert g.annotations and op.isfile(g.annotations)
    assert g.ilmn2cpg_dict and op.isfile(g.ilmn2cpg_dict)
    with gzip.open(g.annotations, "rt") as f:
        assert f.readline().startswith("chr1\t1000\t5000\tpromoter")


def test_region_annotation(anno_genome):
    g, _ = anno_genome
    gr = GenomicRegion(region="chr1:1500-2000", genome=g, no_anno=False)
    assert gr.annotation == "promoter\tGENE_A"
    assert "promoter\tGENE_A" in str(gr)
    # spans two annotation rows
    gr2 = GenomicRegion(region="chr1:4500-4600", genome=g, no_anno=False)
    assert gr2.annotation == "promoter\tGENE_A\nexon\tGENE_A"
    # outside any annotation
    gr3 = GenomicRegion(region="chr1:30000-31000", genome=g, no_anno=False)
    assert gr3.annotation == ""
    # suppressed by default
    gr4 = GenomicRegion(region="chr1:1500-2000", genome=g)
    assert "promoter" not in str(gr4)


def test_convert_region_prints_annotation(anno_genome, capsys):
    g, _ = anno_genome
    assert cli_main(["convert", "-r", "chr1:1500-2000",
                     "--genome", "minianno"]) == 0
    out = capsys.readouterr().out
    assert "promoter\tGENE_A" in out
    assert cli_main(["convert", "-r", "chr1:1500-2000", "--no_anno",
                     "--genome", "minianno"]) == 0
    assert "promoter" not in capsys.readouterr().out


def test_convert_bed_annotation_columns(anno_genome, tmp_path, capsys):
    g, _ = anno_genome
    bed = str(tmp_path / "q.bed")
    with open(bed, "w") as f:
        f.write("chr1\t1200\t4500\n")     # overlaps promoter + exon
        f.write("chr1\t30000\t31000\n")   # no annotation
        f.write("chr2\t150\t300\n")       # tss
    assert cli_main(["convert", "-L", bed, "--genome", "minianno"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0].split("\t")[5:] == ["promoter,exon", "GENE_A"]
    assert lines[1].split("\t")[5:] == [".", "."]
    assert lines[2].split("\t")[5:] == ["tss", "GENE_C"]
    # --no_anno drops the columns
    assert cli_main(["convert", "-L", bed, "--no_anno",
                     "--genome", "minianno"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines[0].split("\t")) == 5


def test_array_id_roundtrip(anno_genome, capsys):
    g, sites = anno_genome
    gr = GenomicRegion(array_id="cg00000002", genome=g)
    assert gr.sites == (sites[2], sites[2] + 1)
    assert cli_main(["convert", "--array_id", "cg00000002", "-p",
                     "--genome", "minianno"]) == 0
    out = capsys.readouterr().out.strip()
    assert out.startswith("chr")
    with pytest.raises(Exception):
        GenomicRegion(array_id="cg99999999", genome=g)


def test_beta_to_450k_end_to_end(anno_genome, tmp_path, capsys):
    from wgbs_tools_tpu.formats.beta import save_beta

    g, sites = anno_genome
    n = g.get_nr_sites()
    rng = np.random.default_rng(11)
    cov = rng.integers(1, 30, size=n)
    meth = rng.binomial(cov, 0.5)
    beta = str(tmp_path / "s.beta")
    save_beta(beta, np.stack([meth, cov], axis=1))
    out_csv = str(tmp_path / "s.450k.csv")
    assert cli_main(["beta_to_450k", beta, "-o", out_csv,
                     "--genome", "minianno"]) == 0
    rows = open(out_csv).read().strip().splitlines()
    # default = 450K subset (third column == 1): cg00000000, cg00000002
    body = [r for r in rows if r.startswith("cg")]
    got_ids = [r.split(",")[0] for r in body]
    assert got_ids == ["cg00000000", "cg00000002"]
    for r, k in zip(body, [0, 2]):
        s = sites[k]
        expect = meth[s - 1] / cov[s - 1]
        assert abs(float(r.split(",")[1]) - expect) < 1e-3

    out2 = str(tmp_path / "s.epic.csv")
    assert cli_main(["beta_to_450k", beta, "-o", out2, "--EPIC",
                     "--genome", "minianno"]) == 0
    body2 = [r for r in open(out2).read().splitlines() if r.startswith("cg")]
    assert len(body2) == 4
