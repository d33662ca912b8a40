"""Synthetic data generators for tests and benchmarks."""

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_seq(n, rng, cpg_boost=0.05):
    """Random DNA with an elevated CG dinucleotide rate."""
    seq = BASES[rng.integers(0, 4, size=n)]
    # plant CG sites at random positions for density
    n_cpg = int(n * cpg_boost)
    pos = rng.choice(n - 1, size=n_cpg, replace=False)
    seq[pos] = ord("C")
    seq[pos + 1] = ord("G")
    return seq


def make_fasta(path, chrom_sizes, rng, width=70):
    with open(path, "w") as f:
        for chrom, n in chrom_sizes.items():
            seq = make_seq(n, rng).tobytes().decode()
            f.write(f">{chrom}\n")
            for i in range(0, n, width):
                f.write(seq[i : i + width] + "\n")
    return path


def random_frags(rng, nr_frags, nr_sites, max_len=12, max_count=5,
                 meth_rate=0.7, dot_rate=0.05, h_rate=0.0, site_base=1):
    """Random sorted+collapsed PatFrags over sites [site_base, site_base+nr_sites)."""
    from wgbs_tools_tpu.formats.pat import PatFrags, CODE_C, CODE_T, CODE_H, CODE_DOT

    lengths = rng.integers(1, max_len + 1, size=nr_frags).astype(np.int32)
    starts = (
        site_base + rng.integers(0, max(nr_sites - 1, 1), size=nr_frags)
    ).astype(np.int32)
    counts = rng.integers(1, max_count + 1, size=nr_frags).astype(np.int32)
    L = int(lengths.max()) if nr_frags else 1
    u = rng.random((nr_frags, L))
    codes = np.where(u < meth_rate, CODE_C, CODE_T).astype(np.uint8)
    if h_rate:
        codes[rng.random((nr_frags, L)) < h_rate] = CODE_H
    codes[rng.random((nr_frags, L)) < dot_rate] = CODE_DOT
    cols = np.arange(L)[None, :]
    codes[cols >= lengths[:, None]] = CODE_DOT
    frags = PatFrags(
        starts,
        lengths,
        counts,
        codes,
        np.zeros(nr_frags, dtype=np.int16),
        ["chr1"],
        None,
    )
    return frags.sort().collapse()


def random_beta(rng, nr_sites, max_cov=50):
    cov = rng.integers(0, max_cov, size=nr_sites).astype(np.int64)
    meth = (cov * rng.random(nr_sites)).astype(np.int64)
    return np.stack([meth, cov], axis=1)
