import gzip

import numpy as np
import pytest

from wgbs_tools_tpu.genome import GenomicRegion
from wgbs_tools_tpu.genome.cpg_index import find_cpg_loci
from wgbs_tools_tpu.utils import IllegalArgumentError


def test_find_cpg_loci_basic():
    seq = np.frombuffer(b"AACGTCGCGA", dtype=np.uint8)
    # CG at 0-based 2, 5, 7 -> 1-based 3, 6, 8
    assert find_cpg_loci(seq).tolist() == [3, 6, 8]


def test_find_cpg_loci_case_insensitive():
    from wgbs_tools_tpu.genome.cpg_index import _concat_seq

    seq = _concat_seq([b"aacg", b"tcgA"])
    assert find_cpg_loci(seq).tolist() == [3, 6]


def test_index_matches_fasta(mini_genome):
    idx = mini_genome.index
    assert idx.nr_sites > 0
    assert idx.chrom_names == ["chr1", "chr2", "chrX"]
    # dictionary compat file agrees with the in-memory arrays
    with gzip.open(mini_genome.join("CpG.bed.gz"), "rt") as f:
        first = f.readline().split()
    assert first[0] == "chr1"
    assert int(first[1]) == int(idx.loci[0])
    assert int(first[2]) == 1


def test_site_locus_roundtrip(mini_genome):
    idx = mini_genome.index
    for site in [1, 2, idx.nr_sites // 2, idx.nr_sites]:
        chrom, loc = idx.site2locus(site)
        assert idx.locus2site(chrom, loc) == site


def test_region2sites_end_exclusive(mini_genome):
    idx = mini_genome.index
    # take the 5th site of chr2 and query exactly its locus as region end:
    s1, s2 = idx.chrom_site_bounds("chr2")
    site = s1 + 4
    _, loc = idx.site2locus(site)
    prev_loc = int(idx.loci[site - 2])
    got = idx.region2sites("chr2", prev_loc, loc)
    # site at region end locus is excluded (ref genomic_region.py:146-149)
    assert got == (site - 1, site)


def test_genomic_region_parsing(mini_genome):
    idx = mini_genome.index
    gr = GenomicRegion(region="chr1", genome=mini_genome)
    assert gr.chrom == "chr1"
    assert gr.sites == idx.chrom_site_bounds("chr1")

    s1 = 10
    chrom, loc1 = idx.site2locus(s1)
    gr2 = GenomicRegion(sites=f"{s1}-{s1+5}", genome=mini_genome)
    assert gr2.sites == (10, 15)
    assert gr2.chrom == chrom
    # region round trip
    gr3 = GenomicRegion(region=gr2.region_str, genome=mini_genome)
    assert gr3.sites == gr2.sites

    with pytest.raises(IllegalArgumentError):
        GenomicRegion(region="chr9:1-100", genome=mini_genome)
    with pytest.raises(IllegalArgumentError):
        GenomicRegion(region="chr1:500-100", genome=mini_genome)


def test_whole_genome_region(mini_genome):
    gr = GenomicRegion(genome=mini_genome)
    assert gr.is_whole()
    assert str(gr) == "Whole genome"
