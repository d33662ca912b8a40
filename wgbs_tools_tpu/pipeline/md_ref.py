"""Reconstruct reference sequence from alignments' MD:Z tags.

Aligners emit MD tags describing, for every aligned read, the reference
bases wherever they differ from the read (and at deletions). Combining
SEQ + CIGAR + MD across the reads covering a locus therefore recovers the
reference sequence over all covered spans — bisulfite conversion is a
read-side change, so the MD tag records the true (unconverted) reference
base at every converted position.

This makes real-data conformance possible without shipping a genome: the
tutorial BAMs of the reference project (tutorial/bams/*.bam) carry MD tags
on every record, so the CpG dictionary for their windows can be rebuilt
bit-for-bit and both pipelines (ours and the reference binaries) run on
identical coordinates (see tests/test_tutorial_real.py).
"""

import re

import numpy as np

_MD_TOKEN = re.compile(rb"(\d+)|\^([A-Za-z]+)|([A-Za-z])")


def find_tag(tags: bytes, want: bytes, want_type: int):
    """Scan a BAM aux blob for tag `want` of type `want_type` ('Z' etc.).
    Returns the value bytes (Z/H: excl. NUL) or None."""
    i = 0
    n = len(tags)
    while i + 3 <= n:
        tag = tags[i : i + 2]
        typ = tags[i + 2]
        i += 3
        if typ in b"cC":
            sz = 1
        elif typ in b"sS":
            sz = 2
        elif typ in b"iIf":
            sz = 4
        elif typ == ord("A"):
            sz = 1
        elif typ in b"ZH":
            j = tags.index(0, i)
            if tag == want and typ == want_type:
                return tags[i:j]
            i = j + 1
            continue
        elif typ == ord("B"):
            sub = tags[i]
            cnt = int.from_bytes(tags[i + 1 : i + 5], "little")
            es = 1 if sub in b"cC" else 2 if sub in b"sS" else 4
            sz = 5 + es * cnt
        else:
            return None  # unparseable aux region
        i += sz
    return None


def read_ref_bases(rec):
    """(ref_positions int64[], ref_bases uint8[]) recovered from one record.

    Covers aligned (M/=/X) and deleted (D) reference positions; returns
    empty arrays when the record has no MD tag. ref positions are 0-based.
    """
    md = find_tag(rec.tags, b"MD", ord("Z"))
    empty = (np.empty(0, np.int64), np.empty(0, np.uint8))
    if md is None:
        return empty

    # reference-touching event stream in ref order: (pos, read_base|None)
    pos_list = []
    base_list = []  # read base for M events, -1 placeholder for D events
    ref_pos = rec.pos
    read_pos = 0
    seq = rec.seq
    for op, ln in rec.cigar:
        if op in "M=X":
            pos_list.append(np.arange(ref_pos, ref_pos + ln, dtype=np.int64))
            base_list.append(
                np.frombuffer(seq[read_pos : read_pos + ln], dtype=np.uint8)
                .astype(np.int16))
            ref_pos += ln
            read_pos += ln
        elif op in "IS":
            read_pos += ln
        elif op == "D":
            pos_list.append(np.arange(ref_pos, ref_pos + ln, dtype=np.int64))
            base_list.append(np.full(ln, -1, dtype=np.int16))
            ref_pos += ln
        elif op == "N":
            ref_pos += ln  # MD does not span reference skips
        # H / P consume nothing
    if not pos_list:
        return empty
    positions = np.concatenate(pos_list)
    bases = np.concatenate(base_list)

    # overlay the MD corrections: numbers consume match positions (ref ==
    # read base), single letters are mismatches (ref base given), ^RUNS are
    # deletion reference bases
    m_idx = np.nonzero(bases >= 0)[0]  # aligned events in order
    d_idx = np.nonzero(bases < 0)[0]  # deletion events in order
    mi = di = 0
    for num, dele, sub in _MD_TOKEN.findall(md):
        if num:
            mi += int(num)
        elif dele:
            L = len(dele)
            if di + L > d_idx.shape[0]:
                return empty  # MD inconsistent with CIGAR: distrust the read
            bases[d_idx[di : di + L]] = np.frombuffer(dele, dtype=np.uint8)
            di += L
        else:
            if mi >= m_idx.shape[0]:
                return empty
            bases[m_idx[mi]] = sub[0]
            mi += 1
    if mi > m_idx.shape[0] or (bases < 0).any():
        return empty
    return positions, bases.astype(np.uint8)


def reconstruct_consensus(records, bisulfite=True):
    """Reference reconstruction across records of ONE chromosome.

    bisulfite=True applies strand-aware base resolution: bisulfite aligners
    (bwa-meth et al.) compute MD against the strand-converted genome, so a
    top-strand (OT) read reports an unmethylated C as T while a bottom-
    strand (OB) read reports the same position faithfully (its conversion
    hits G positions instead). Per true base b, the consistent evidence is

        b=C: OT votes {C,T} + OB votes {C}    (OT C->T, OB keeps C)
        b=T: OT votes {T}   + OB votes {T}
        b=G: OT votes {G}   + OB votes {G,A}  (OB G->A)
        b=A: OT votes {A}   + OB votes {A}

    and the consensus takes the argmax with strict margin (ties emit 'N' —
    e.g. a fully unmethylated C with no bottom-strand coverage is genuinely
    indistinguishable from T).

    Returns (start0, seq uint8[span]) with ord('N') at uncovered/ambiguous
    positions, and the fraction of votes inconsistent with the consensus.
    """
    pos_parts, base_parts, strand_parts = [], [], []
    for rec in records:
        p, b = read_ref_bases(rec)
        if p.size:
            pos_parts.append(p)
            base_parts.append(b)
            strand_parts.append(
                np.full(p.shape[0], 1 if (rec.flag & 16) else 0, np.int8))
    if not pos_parts:
        return 0, np.empty(0, dtype=np.uint8), 0.0
    pos = np.concatenate(pos_parts)
    base = np.char.upper(
        np.concatenate(base_parts).view("S1")).view(np.uint8)
    strand = np.concatenate(strand_parts)
    lo, hi = int(pos.min()), int(pos.max()) + 1
    span = hi - lo
    code = np.full(256, 4, dtype=np.int8)
    for k, c in enumerate(b"ACGT"):
        code[c] = k
    top = np.zeros((span, 5), dtype=np.int32)
    bot = np.zeros((span, 5), dtype=np.int32)
    np.add.at(top, (pos[strand == 0] - lo, code[base[strand == 0]]), 1)
    np.add.at(bot, (pos[strand == 1] - lo, code[base[strand == 1]]), 1)
    A, C, G, T = 0, 1, 2, 3
    if bisulfite:
        scores = np.stack([
            top[:, A] + bot[:, A],                       # A
            top[:, C] + top[:, T] + bot[:, C],           # C
            top[:, G] + bot[:, G] + bot[:, A],           # G
            top[:, T] + bot[:, T],                       # T
        ], axis=1)
    else:
        scores = (top + bot)[:, :4]
    order = np.argsort(scores, axis=1)
    best = order[:, -1]
    margin = (np.take_along_axis(scores, order[:, -1:], 1)
              - np.take_along_axis(scores, order[:, -2:-1], 1))[:, 0]
    covered = (top + bot).sum(axis=1) > 0
    out = np.frombuffer(b"ACGT", dtype=np.uint8)[best].copy()
    out[~covered | (margin == 0)] = ord("N")
    total = (top + bot)[:, :4].sum()
    consistent = np.take_along_axis(scores, best[:, None], 1)[:, 0][covered]
    disagree = 1.0 - consistent.sum() / total if total else 0.0
    return lo, out, float(disagree)
