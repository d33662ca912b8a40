"""pat -> beta conversion (the pileup pipeline).

Reference flow (ref: src/python/pat2beta.py:14-65): per-chromosome
`tabix | stdin2beta` processes in a Pool, concatenated with numpy and
saturated to uint8. Here the whole pat file is parsed into a PatFrags batch
and piled up on device over the full CpG axis in one shot (the per-chromosome
Pool becomes tile-parallelism inside the kernel / shards of a device mesh).
"""

import os.path as op

from ..formats.beta import trim_to_uint
from ..formats.pat import read_pat
from ..ops.pileup import pileup_frags
from ..utils import splitextgz
from ..utils.log import logger


def pat2beta(pat_path, out_dir=".", genome=None, lbeta=False, backend="auto",
             force=True, out_path=None):
    """Convert a pat[.gz] file to a beta/lbeta file. Returns the output path."""
    from ..genome.refdir import Genome

    g = genome if genome is not None else Genome(None)
    nr_sites = g.get_nr_sites() if hasattr(g, "get_nr_sites") else g.nr_sites

    frags = read_pat(pat_path)
    counts = pileup_frags(frags, (1, nr_sites + 1), backend=backend)

    suff = ".lbeta" if lbeta else ".beta"
    if out_path is None:
        out_path = op.join(out_dir, splitextgz(op.basename(pat_path))[0] + suff)
    trim_to_uint(counts, lbeta).tofile(out_path)
    logger.info("pat2beta: %s -> %s (%d frags, %d sites)", pat_path, out_path,
                frags.nr_frags, nr_sites)
    return out_path


def pat2beta_counts(pat_path, nr_sites, backend="auto"):
    """Raw (nr_sites, 2) int counts (pre-saturation) for a pat file."""
    frags = read_pat(pat_path)
    return pileup_frags(frags, (1, nr_sites + 1), backend=backend)
