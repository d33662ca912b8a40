import numpy as np
import pytest

from tests.oracle import run_oracle
from tests.synth import random_frags
from wgbs_tools_tpu.formats.pat import frags_to_bytes
from wgbs_tools_tpu.ops.pairs import pair_counts


def test_pairs_vs_oracle(rng):
    frags = random_frags(rng, 800, 4000, max_len=12, dot_rate=0.15)
    start, end = 1, 4001
    out = run_oracle("stdin2pairs", [start, end], frags_to_bytes(frags))
    expect = np.array(out.split(), dtype=np.int64).reshape(-1, 4)
    got = pair_counts(frags, (start, end))
    assert got.shape == expect.shape
    assert (got == expect).all()


def test_pairs_subwindow(rng):
    frags = random_frags(rng, 500, 3000, max_len=10)
    out = run_oracle("stdin2pairs", [1000, 2000], frags_to_bytes(frags))
    expect = np.array(out.split(), dtype=np.int64).reshape(-1, 4)
    got = pair_counts(frags, (1000, 2000))
    assert (got == expect).all()


def test_pairs_streaming_matches_oneshot(rng, tmp_path, monkeypatch,
                                         mini_genome):
    """StreamingPairs over tiny chunks == one-shot pair_counts, and the CLI
    runs whole-file streaming (WGBS_TPU_PAT_CHUNK_BYTES forces many chunk
    boundaries through arbitrary fragment splits)."""
    from wgbs_tools_tpu.formats.pat import write_pat
    from wgbs_tools_tpu.ops.pairs import StreamingPairs

    nr = mini_genome.get_nr_sites()
    frags = random_frags(rng, 1200, min(5000, nr), max_len=14, dot_rate=0.1)
    frags = frags.sort().collapse()
    window = (1, nr + 1)
    expect = pair_counts(frags, window)

    sp = StreamingPairs(window)
    n = frags.nr_frags
    for lo in range(0, n, 97):  # uneven chunking
        sp.add(frags.take(slice(lo, min(lo + 97, n))))
    assert (sp.result() == expect).all()

    pat = str(tmp_path / "sp.pat.gz")
    write_pat(frags, pat)
    monkeypatch.setenv("WGBS_TPU_PAT_CHUNK_BYTES", "1024")
    from wgbs_tools_tpu.cli.cmd_misc import main_pat2pairs

    assert main_pat2pairs([pat, "-o", str(tmp_path)]) == 0
    got = np.fromfile(str(tmp_path / "sp.pairs"), dtype=np.uint32)
    assert (got.reshape(-1, 4) == expect).all()


def test_mbias_tables_and_plot(tmp_path, mini_genome):
    from tests.bisim import dump_bam, simulate_reads
    from wgbs_tools_tpu.genome.cpg_index import read_fasta
    from wgbs_tools_tpu.pipeline.bam2pat_run import bam2pat

    rng = np.random.default_rng(44)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=200, paired=True)
    bam = dump_bam(reads, seqs, str(tmp_path / "mb.bam"))
    prefix = str(tmp_path / "mb.mbias")
    bam2pat(bam, genome=mini_genome, write_output=False, mbias_prefix=prefix)
    import os.path as op

    assert op.isfile(prefix + ".OT.txt")
    assert op.isfile(prefix + ".OB.txt")
    ot = np.loadtxt(prefix + ".OT.txt", skiprows=1)
    ob = np.loadtxt(prefix + ".OB.txt", skiprows=1)
    assert ot.sum() + ob.sum() > 0

    from wgbs_tools_tpu.cli.cmd_misc import plot_mbias

    out = plot_mbias([prefix + ".OT.txt", prefix + ".OB.txt"], str(tmp_path),
                     PE=True)
    assert op.isfile(out)


def test_mbias_batch_equals_per_read(mini_genome):
    """MBiasCounter.update_batch must reproduce the per-read update exactly
    (the per-read path was verified against patter's --mbias tables)."""
    from tests.bisim import simulate_reads
    from wgbs_tools_tpu.genome.cpg_index import read_fasta
    from wgbs_tools_tpu.pipeline.calling import (
        MBiasCounter,
        call_read,
        call_reads_batch,
        clean_cigar,
    )

    rng = np.random.default_rng(45)
    seqs = read_fasta(mini_genome.join("genome.fa"))
    reads, _ = simulate_reads(seqs, rng, n_reads=300, paired=True)
    idx = mini_genome.index

    mb_ref = MBiasCounter()
    mb_batch = MBiasCounter()
    per_chrom = {}
    for r in reads:
        per_chrom.setdefault(r.chrom, []).append(r)
    for chrom, crs in per_chrom.items():
        crs.sort(key=lambda r: r.pos0)
        site_base, _ = idx.chrom_site_bounds(chrom)
        loci = idx.chrom_loci(chrom)
        seqs_adj, positions, flags = [], [], []
        for r in crs:
            seq = clean_cigar(r.seq, r.cigar_list())
            call_read(seq, r.pos0 + 1, r.flag, True, loci, site_base,
                      clip=2, mbias=mb_ref)
            seqs_adj.append(seq)
            positions.append(r.pos0 + 1)
            flags.append(r.flag)
        call_reads_batch(seqs_adj, positions, flags, True, loci, site_base,
                         clip=2, mbias=mb_batch)
    total = 0
    for key in mb_ref.tables:
        assert (mb_ref.tables[key] == mb_batch.tables[key]).all(), key
        total += mb_ref.tables[key].sum()
    assert total > 0
