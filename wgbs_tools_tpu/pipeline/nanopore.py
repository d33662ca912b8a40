"""Nanopore / modification-aware calling: MM/ML tags -> pat patterns.

Exact reimplementation of the reference's ONT branch
(ref: src/pipeline_wgbs/ont.cpp): MM skip-counts index the C's of the
as-sequenced read (reverse-complement for bottom-strand alignments), ML
probabilities threshold at np_thresh into M/U/H/N states, the per-C mask is
flipped to forward orientation and CIGAR-normalized, and the pattern is
emitted over reference CpG positions with the dot-convention
(unlisted C = unmethylated) only when the MM header uses "C+m"/"C+m."
(not "C+m?"). Biomodal "C+C" sections merge into 5mC or 5hmC calls per
`cpc_call`; `combine_mods` sums 5mC+5hmC probabilities.
"""

import numpy as np

from ..utils import IllegalArgumentError

B_C, B_G = ord("C"), ord("G")
_RC = bytes.maketrans(b"ACGTN", b"TGCAN")


def revcomp(seq: bytes) -> bytes:
    return seq.translate(_RC)[::-1]


def parse_mm_sections(mm_str):
    """MM tag -> {mod_char: (skips list, np_dot, section_index)}.

    Section headers look like C+m, C+m., C+m?, C+h, C+C?
    (ref: ont.cpp:310-333,361-416).
    """
    sections = {}
    parts = [s for s in mm_str.split(";") if s]
    for idx, part in enumerate(parts):
        if len(part) < 3 or not part.startswith("C+"):
            continue
        mod = part[2]
        header = part.split(",", 1)[0]
        np_dot = not (len(header) > 3 and header[3] == "?")
        skips = (
            [int(x) for x in part.split(",")[1:]] if "," in part else []
        )
        if mod not in sections:
            sections[mod] = (skips, np_dot, idx)
    return sections


def mm_positions(skips):
    """Cumulative skip counts -> C-ordinal positions (ref: ont.cpp:302-308)."""
    out = []
    pos = 0
    for v in skips:
        pos += v
        out.append(pos)
        pos += 1
    return out


def slice_ml(ml_vals, section_idx, n, total_sections_n):
    """ML is a flat array; slice the block for this section
    (ref: ont.cpp:395-415). Missing ML (Biomodal) -> all 255."""
    if ml_vals is None:
        return [255] * n
    if n == 0:
        return []
    if len(ml_vals) % n != 0:
        raise IllegalArgumentError("Unsupported MM field (ML not modulo)")
    lo = section_idx * n
    if len(ml_vals) >= lo + n:
        return list(ml_vals[lo : lo + n])
    return [255] * n


class NanoporeCalls:
    """Per-read parsed modification calls."""

    def __init__(self, mm_str, ml_vals, cpc_call="C", combine_mods=False):
        secs = parse_mm_sections(mm_str) if mm_str else {}
        self.np_dot = False
        m_pos, m_ml = [], []
        h_pos, h_ml = [], []
        if "h" in secs:
            skips, _, idx = secs["h"]
            h_pos = mm_positions(skips)
            h_ml = slice_ml(ml_vals, idx, len(h_pos), len(secs))
        if "m" in secs:
            skips, np_dot, idx = secs["m"]
            self.np_dot = np_dot
            m_pos = mm_positions(skips)
            m_ml = slice_ml(ml_vals, idx, len(m_pos), len(secs))
        if "C" in secs and cpc_call != ".":
            skips, _, idx = secs["C"]
            c_pos = mm_positions(skips)
            tgt_pos, tgt_ml = (h_pos, h_ml) if cpc_call == "H" else (m_pos, m_ml)
            existing = set(tgt_pos)
            for p in c_pos:
                if p not in existing:
                    k = int(np.searchsorted(np.array(tgt_pos, dtype=np.int64), p))
                    tgt_pos.insert(k, p)
                    tgt_ml.insert(k, 255)
        self.m_pos, self.m_ml = m_pos, m_ml
        self.h_pos, self.h_ml = h_pos, h_ml
        self.combine_mods = combine_mods

    @property
    def empty(self):
        return not self.m_pos and not self.h_pos and not self.np_dot


def make_meth_mask(orig_seq: bytes, calls: NanoporeCalls, np_thresh=0.667):
    """Per-base status mask over the as-sequenced read
    (ref: ont.cpp:22-87). E=not called, M/H/U/N as documented."""
    mask = bytearray(b"E" * len(orig_seq))
    c_counter = 0
    mi = hi = 0
    m_pos, m_ml = calls.m_pos, calls.m_ml
    h_pos, h_ml = calls.h_pos, calls.h_ml
    hi_thresh = 255 * np_thresh
    lo_thresh = 255 * (1 - np_thresh)
    for i, b in enumerate(orig_seq):
        if b != B_C:
            continue
        if calls.combine_mods:
            h_prob = m_prob = 0
            has_h = hi < len(h_pos) and c_counter == h_pos[hi]
            has_m = mi < len(m_pos) and c_counter == m_pos[mi]
            if has_h:
                h_prob = h_ml[hi]
                hi += 1
            if has_m:
                m_prob = m_ml[mi]
                mi += 1
            if has_h or has_m:
                combined = min(h_prob + m_prob, 255)
                st = ord("N")
                if combined > hi_thresh:
                    st = ord("M")
                elif combined < lo_thresh:
                    st = ord("U")
                mask[i] = st
        else:
            st = ord("N")
            if hi < len(h_pos) and c_counter == h_pos[hi]:
                if h_ml[hi] > hi_thresh:
                    st = ord("H")
                elif h_ml[hi] < lo_thresh:
                    st = ord("U")
                mask[i] = st
                hi += 1
            if mi < len(m_pos) and c_counter == m_pos[mi]:
                if m_ml[mi] > hi_thresh:
                    st = ord("M")
                elif m_ml[mi] < lo_thresh:
                    if st != ord("H"):
                        st = ord("U")
                elif st != ord("H"):
                    st = ord("N")
                mask[i] = st
                mi += 1
        c_counter += 1
    return bytes(mask)


def np_call_read(seq_adj: bytes, mask_adj: bytes, start_locus: int,
                 bottom: bool, np_dot: bool, loci: np.ndarray, site_base: int,
                 clip: int = 0):
    """Build the pattern over reference CpG positions (ref: ont.cpp:132-218).

    seq_adj / mask_adj: CIGAR-normalized forward-oriented read and status
    mask. Returns (start_site, pattern bytes) or None.
    """
    n = len(seq_adj)
    loop_start = -1 if bottom else 0
    k0 = int(np.searchsorted(loci, start_locus + loop_start, side="left"))
    k1 = int(np.searchsorted(loci, start_locus + n, side="left"))
    calls = []
    first_k = -1
    for k in range(k0, k1):
        i = int(loci[k]) - start_locus
        di = i + 1 if bottom else i
        if di >= len(mask_adj) or di < 0:
            cur = ord(".")
        else:
            st = mask_adj[di]
            if st == ord("N"):
                cur = ord(".")
            elif st == ord("E"):
                has_base = di < len(seq_adj) and (
                    seq_adj[di] == (B_G if bottom else B_C)
                )
                cur = ord("T") if (np_dot and has_base) else ord(".")
            elif st == ord("M"):
                cur = ord("C")
            elif st == ord("U"):
                cur = ord("T")
            elif st == ord("H"):
                cur = ord("H")
            else:
                cur = ord(".")
        clip_pos = di if bottom else i
        if clip > 0 and not (clip_pos >= clip and clip_pos < n - clip):
            cur = ord(".")
        if first_k < 0 and cur != ord("."):
            first_k = k
        if first_k >= 0:
            calls.append(cur)
    if first_k < 0:
        return None
    pattern = bytes(calls).rstrip(b".")
    if not pattern:
        return None
    return site_base + first_k, pattern
