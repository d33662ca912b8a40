"""Nanopore (MM/ML) calling conformance vs the reference patter oracle."""

import os
import struct
import subprocess

import numpy as np
import pytest

from tests.bisim import SimRead, dump_bam
from tests.oracle import oracle
from tests.test_bam2pat import TABIX_SHIM, shim_path  # noqa: F401
from wgbs_tools_tpu.formats.pat import frags_to_bytes, parse_pat_bytes
from wgbs_tools_tpu.genome.cpg_index import read_fasta
from wgbs_tools_tpu.pipeline.bam2pat_run import bam2pat
from wgbs_tools_tpu.pipeline.nanopore import revcomp


class NpRead(SimRead):
    def __init__(self, *a, mm="", ml=None, **kw):
        super().__init__(*a, **kw)
        self.mm = mm
        self.ml = ml

    def sam_line(self):
        base = super().sam_line()
        base += f"\tMM:Z:{self.mm}"
        if self.ml is not None:
            base += "\tML:B:C," + ",".join(str(v) for v in self.ml)
        return base


def _skips(ordinals):
    out = []
    prev = -1
    for p in ordinals:
        out.append(p - prev - 1)
        prev = p
    return out


def _complex_fwd_read(ref, pos, rng, core=280):
    """Forward-oriented SEQ with soft-clips, an insertion and a D or N gap.

    Returns (fwd_seq, cigar_str). Covers the general CIGAR branch of
    bam_columnar_ont._normalize_cigar (the one-op fast path only sees xM)."""
    a = int(rng.integers(50, 101))
    c = int(rng.integers(50, 101))
    e = core - a - c
    b = int(rng.integers(1, 6))  # insertion length
    d = int(rng.integers(1, 6))  # deletion / ref-skip length
    s1 = int(rng.integers(0, 8))
    s2 = int(rng.integers(0, 8))
    gap = "N" if rng.integers(2) else "D"
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    sc1 = bytes(alpha[rng.integers(0, 4, s1)])
    sc2 = bytes(alpha[rng.integers(0, 4, s2)])
    ins = bytes(alpha[rng.integers(0, 4, b)])
    fwd_seq = (sc1 + bytes(ref[pos : pos + a]) + ins
               + bytes(ref[pos + a : pos + a + c])
               + bytes(ref[pos + a + c + d : pos + a + c + d + e]) + sc2)
    cigar = ""
    if s1:
        cigar += f"{s1}S"
    cigar += f"{a}M{b}I{c}M{d}{gap}{e}M"
    if s2:
        cigar += f"{s2}S"
    return fwd_seq, cigar


def simulate_np_reads(seqs, rng, n_reads=200, read_len=300, conv="?",
                      with_h=False, meth_rate=0.6, call_rate=0.8,
                      complex_cigar=False):
    reads = []
    chroms = list(seqs.keys())
    for r in range(n_reads):
        chrom = chroms[rng.integers(len(chroms))]
        ref = seqs[chrom]
        if len(ref) < read_len + 2:
            continue
        pos = int(rng.integers(0, len(ref) - read_len - 2))
        bottom = bool(rng.integers(2))
        if complex_cigar:
            fwd_seq, cigar = _complex_fwd_read(ref, pos, rng,
                                               core=read_len - 20)
        else:
            fwd_seq = bytes(ref[pos : pos + read_len])
            cigar = f"{read_len}M"
        as_seq = revcomp(fwd_seq) if bottom else fwd_seq

        # choose called C ordinals in as-sequenced orientation
        c_ords = [i for i, b in enumerate(as_seq) if b == ord("C")]
        ordinals = [k for k in range(len(c_ords)) if rng.random() < call_rate]
        probs = [int(rng.integers(0, 256)) for _ in ordinals]
        header = "C+m," if conv == "." else f"C+m{conv},"
        mm = header + ",".join(str(s) for s in _skips(ordinals))
        ml = probs
        if with_h:
            h_ordinals = [k for k in range(len(c_ords))
                          if rng.random() < 0.3]
            h_probs = [int(rng.integers(0, 256)) for _ in h_ordinals]
            # equal-block ML slicing requires same block length; pad by
            # trimming to min length
            n = min(len(ordinals), len(h_ordinals))
            ordinals, probs = ordinals[:n], probs[:n]
            h_ordinals, h_probs = h_ordinals[:n], h_probs[:n]
            mm = "C+m?," + ",".join(str(s) for s in _skips(ordinals))
            mm += ";C+h?," + ",".join(str(s) for s in _skips(h_ordinals))
            ml = probs + h_probs
        reads.append(
            NpRead(f"np{r:05d}", 16 if bottom else 0, chrom, pos, fwd_seq,
                   cigar, mm=mm, ml=ml)
        )
    return reads


def np_tags_blob(mm, ml):
    blob = b"MMZ" + mm.encode() + b"\x00"
    if ml is not None:
        blob += b"MLB" + b"C" + struct.pack("<I", len(ml)) + bytes(ml)
    return blob


def dump_np_bam(reads, seqs, path):
    from wgbs_tools_tpu.pipeline.bam import BamRecord, write_bam

    ref_names = list(seqs.keys())
    records = []
    for rd in sorted(reads, key=lambda r: (ref_names.index(r.chrom), r.pos0)):
        records.append(
            BamRecord(rd.qname, rd.flag, ref_names.index(rd.chrom), rd.pos0,
                      rd.mapq, rd.cigar_list(), rd.seq, b"",
                      np_tags_blob(rd.mm, rd.ml))
        )
    write_bam(path, ref_names, [len(s) for s in seqs.values()], records)
    return path


def ref_np_pat(reads, genome, shim_dir, tmp_path, extra_args=()):
    pt = oracle("patter")
    env = dict(os.environ, PATH=shim_dir + ":" + os.environ["PATH"])
    rows = []
    for chrom in genome.get_chroms():
        cr = sorted([r for r in reads if r.chrom == chrom],
                    key=lambda r: r.pos0)
        if not cr:
            continue
        sam = "\n".join(r.sam_line() for r in cr) + "\n"
        p = subprocess.run(
            [pt, genome.join("CpG.bed.gz"), chrom] + list(extra_args),
            input=sam.encode(), stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, env=env)
        rows += [l + b"\t1" for l in p.stdout.splitlines() if l]
    if not rows:
        return parse_pat_bytes(b"")
    return parse_pat_bytes(b"\n".join(rows) + b"\n").sort().collapse()


@pytest.mark.parametrize("conv,with_h,complex_cigar",
                         [("?", False, False), (".", False, False),
                          ("?", True, False), ("?", False, True),
                          (".", True, True)])
def test_nanopore_matches_reference(mini_genome, tmp_path, shim_path, conv,
                                    with_h, complex_cigar):
    rng = np.random.default_rng(21)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads = simulate_np_reads(seqs, rng, n_reads=150, conv=conv,
                              with_h=with_h, complex_cigar=complex_cigar)
    bam = dump_np_bam(reads, seqs, str(tmp_path / "np.bam"))
    frags, _, stats = bam2pat(bam, genome=mini_genome, write_output=False)
    expect = ref_np_pat(reads, mini_genome, shim_path, tmp_path)
    assert frags_to_bytes(frags) == frags_to_bytes(expect)
    assert frags.nr_frags > 0


def test_nanopore_combine_mods(mini_genome, tmp_path, shim_path):
    rng = np.random.default_rng(22)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads = simulate_np_reads(seqs, rng, n_reads=100, conv="?", with_h=True)
    bam = dump_np_bam(reads, seqs, str(tmp_path / "npc.bam"))
    frags, _, _ = bam2pat(bam, genome=mini_genome, write_output=False,
                          combine_mods=True)
    expect = ref_np_pat(reads, mini_genome, shim_path, tmp_path,
                        extra_args=["--combine_mods"])
    assert frags_to_bytes(frags) == frags_to_bytes(expect)
