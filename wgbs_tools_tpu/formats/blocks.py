"""Blocks files (wgbstools bed: chr, start, end, startCpG, endCpG) and the
binary uxm format.

ref: docs/bed_format.md, src/python/beta_to_blocks.py:23-91, homog.py:48-58.
"""

import gzip

import numpy as np

from ..utils import IllegalArgumentError
from .bgzf import is_gzip

BLOCK_COLS = ("chr", "start", "end", "startCpG", "endCpG")


def load_blocks(path, nrows=None):
    """Load a blocks bed into a dict of numpy columns.

    Accepts optional header, comments, gz compression. Returns
    {chr: object[n], start,end,startCpG,endCpG: int64[n]}; NA CpG columns
    become -1.
    """
    opener = gzip.open if is_gzip(path) else open
    chroms, starts, ends, scpg, ecpg = [], [], [], [], []
    with opener(path, "rb") as f:
        for i, line in enumerate(f):
            line = line.rstrip(b"\n")
            if not line or line.startswith(b"#"):
                continue
            tokens = line.split(b"\t")
            if len(tokens) < 5:
                raise IllegalArgumentError(
                    f"Invalid blocks file: {path}. less than 5 columns. "
                    "Run convert -L to add the CpG columns"
                )
            if not tokens[1].isdigit():  # header line
                continue
            chroms.append(tokens[0].decode())
            starts.append(int(tokens[1]))
            ends.append(int(tokens[2]))
            scpg.append(_int_or_na(tokens[3]))
            ecpg.append(_int_or_na(tokens[4]))
            if nrows is not None and len(chroms) >= nrows:
                break
    return {
        "chr": np.array(chroms, dtype=object),
        "start": np.array(starts, dtype=np.int64),
        "end": np.array(ends, dtype=np.int64),
        "startCpG": np.array(scpg, dtype=np.int64),
        "endCpG": np.array(ecpg, dtype=np.int64),
    }


def _int_or_na(tok):
    t = tok.strip()
    if t in (b"NA", b"NaN", b"nan", b""):
        return -1
    return int(t)


def is_block_file_nice(blocks):
    """Sorted / non-empty / non-overlapping validation
    (exact rule set of ref: beta_to_blocks.py:23-47)."""
    s, e = blocks["startCpG"], blocks["endCpG"]
    if (s < 0).any() or (e < 0).any():
        return False, "Some blocks are empty (NA)"
    if not (e - s > 0).all():
        return False, "Some blocks are empty (startCpG==endCpG)"
    if not (np.diff(s) >= 0).all():
        return False, "startCpG is not monotonically increasing"
    if not (np.diff(e) >= 0).all():
        return False, "endCpG is not monotonically increasing"
    stacked = np.stack([s, e])
    if np.unique(stacked, axis=1).shape[1] != s.shape[0]:
        return False, "Some blocks are duplicated"
    if s.shape[0] > 1 and not (s[1:] - e[:-1] >= 0).all():
        return False, "Some blocks overlap"
    return True, ""


def write_blocks(blocks, path):
    rows = []
    for i in range(blocks["startCpG"].shape[0]):
        rows.append(
            f"{blocks['chr'][i]}\t{blocks['start'][i]}\t{blocks['end'][i]}"
            f"\t{blocks['startCpG'][i]}\t{blocks['endCpG'][i]}\n"
        )
    data = "".join(rows).encode()
    if path.endswith(".gz"):
        from .bgzf import BgzfWriter

        with BgzfWriter(path) as w:
            w.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)
    return path


def sites_blocks(index, sites_list):
    """Build a blocks dict from a list of (startCpG, endCpG) using a CpGIndex
    for the locus columns (replaces add_loci, ref: src/cpg2bed/add_loci.cpp)."""
    sites_arr = np.asarray(sites_list, dtype=np.int64).reshape(-1, 2)
    s, e = sites_arr[:, 0], sites_arr[:, 1]
    cids = index.site2chrom_id(s)
    chroms = np.array([index.chrom_names[c] for c in cids], dtype=object)
    # exact add_loci convention (ref: src/cpg2bed/add_loci.cpp:51-52):
    # start = locus of first site; end = locus of last site + 1 (or start+2
    # for empty blocks)
    start_loc = index.loci[s - 1].astype(np.int64)
    end_loc = np.where(e == s, start_loc + 2, index.loci[np.maximum(e - 2, 0)] + 1)
    return {
        "chr": chroms,
        "start": start_loc.astype(np.int64),
        "end": end_loc.astype(np.int64),
        "startCpG": s,
        "endCpG": e,
    }
