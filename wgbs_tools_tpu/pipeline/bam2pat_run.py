"""bam2pat: BAM -> pat (+ beta) conversion pipeline.

Reference flow (ref: src/python/bam2pat.py:144-209,303-422): a Pool forks per
chromosome, each running `samtools view | match_maker | patter | sort | uniq`
and parts are concatenated. Here the BAM is decoded natively, reads are
called per chromosome with the exact patter rules (pipeline/calling.py),
fragments are sorted/collapsed as arrays, and the pileup runs on device.
"""

import os.path as op

import numpy as np

from ..formats.pat import PatFrags, empty_frags, write_pat
from ..genome.refdir import Genome
from ..utils import IllegalArgumentError, pretty_name
from ..utils.log import logger
from .bam import (
    BamReader,
    EXCLUDE_FLAGS,
    EXCLUDE_FLAGS_NANOPORE,
    FPAIRED,
    FUNMAP,
    MIN_MAPQ,
)
from .calling import MBiasCounter, ReadStats, call_records, rows_to_frags


def detect_layout(bam_path):
    """(is_paired_end, is_nanopore) from the first primary record
    (ref: bam2pat.py:243-267, patter.cpp:324-350)."""
    reader = BamReader(bam_path)
    paired = False
    nanopore = "PL:ONT" in reader.header_text
    for rec in reader:
        if rec.flag & FUNMAP:
            continue
        paired = bool(rec.flag & FPAIRED)
        if rec.get_tag("MM") is not None or rec.get_tag("Mm") is not None:
            nanopore = True
        break
    reader.close()
    return paired, nanopore


def bam2pat(bam_path, genome=None, out_dir=".", region=None, min_mapq=MIN_MAPQ,
            exclude_flags=None, clip=0, min_cpg=1, mbias_prefix=None,
            include_chroms=None, force=True, write_output=True,
            with_qname=False, nanopore=None, np_thresh=0.667, cpc_call="C",
            combine_mods=False):
    """Convert a BAM to a sorted/collapsed PatFrags batch (and pat.gz file).

    Returns (frags, out_path or None, stats).
    """
    g = genome if genome is not None else Genome(None)
    idx = g.index
    paired, detected_np = detect_layout(bam_path)
    if nanopore is None:
        nanopore = detected_np
    if nanopore and paired:
        raise IllegalArgumentError(
            "Unrecognized bam format: paired end and nanopore")
    if nanopore:
        paired = False
    if exclude_flags is None:
        exclude_flags = EXCLUDE_FLAGS_NANOPORE if nanopore else EXCLUDE_FLAGS

    reader = BamReader(bam_path)
    ref_names = reader.ref_names
    per_chrom = {c: [] for c in idx.chrom_names}
    for rec in reader:
        if rec.flag & FUNMAP or rec.ref_id < 0:
            continue
        if rec.mapq < min_mapq or (rec.flag & exclude_flags):
            continue
        chrom = ref_names[rec.ref_id]
        if chrom in per_chrom:
            per_chrom[chrom].append(rec)
    reader.close()

    stats = ReadStats()
    mbias = MBiasCounter() if mbias_prefix else None
    parts = []
    chroms = include_chroms or idx.chrom_names
    for chrom in chroms:
        records = per_chrom.get(chrom, [])
        if not records:
            continue
        records.sort(key=lambda r: r.pos)
        site_base, _ = idx.chrom_site_bounds(chrom)
        loci = idx.chrom_loci(chrom)
        starts, patterns, qnames = call_records(
            records, loci, site_base, chrom, paired, clip=clip,
            min_cpg=min_cpg, stats=stats, mbias=mbias, with_qname=with_qname,
            nanopore=nanopore, np_thresh=np_thresh, cpc_call=cpc_call,
            combine_mods=combine_mods,
        )
        frags = rows_to_frags(starts, patterns, chrom, qnames)
        if frags.nr_frags:
            parts.append(frags.sort().collapse())
        logger.info("bam2pat: %s", stats.summary(chrom))

    if parts:
        from ..cli.cmd_pat import _concat_frags

        frags = _concat_frags(parts)
    else:
        frags = empty_frags()

    out_path = None
    if write_output:
        out_path = op.join(out_dir, pretty_name(bam_path) + ".pat.gz")
        write_pat(frags, out_path)
        logger.info("bam2pat: wrote %s (%d fragments)", out_path,
                    frags.nr_frags)
    if mbias_prefix and mbias is not None:
        mbias.dump(mbias_prefix)
    return frags, out_path, stats
