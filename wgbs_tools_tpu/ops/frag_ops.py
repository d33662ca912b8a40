"""Fragment-level operations: region/blocks filtering (cview), strip/clip,
U/X/M homogeneity counting (homog), subsampling (pat_sampler), site masking
(mask_pat).

The reference implements each of these as a standalone C++ stdin->stdout
filter (ref: src/cview/cview.cpp, src/homog/homog.cpp,
src/pat_sampler/sampler.cpp, src/pat2beta/mask_pat.cpp). Here they are
vectorized array transforms over PatFrags batches; the homog bin accumulation
has a device (segment-sum) path.
"""

import numpy as np

from ..formats.pat import CODE_C, CODE_DOT, CODE_H, CODE_T, PatFrags
from ..utils import IllegalArgumentError

# ---------------------------------------------------------------------------
# strip / gap helpers
# ---------------------------------------------------------------------------


def strip_frags(frags: PatFrags) -> PatFrags:
    """Remove leading/trailing unknown ('.') calls, dropping all-dot reads
    (ref: cview's --strip via patter_utils strip_read)."""
    if frags.nr_frags == 0:
        return frags
    L = frags.max_len
    cols = np.arange(L)[None, :]
    in_read = cols < frags.length[:, None]
    known = (frags.codes != CODE_DOT) & in_read
    any_known = known.any(axis=1)
    first = np.argmax(known, axis=1)
    last = L - 1 - np.argmax(known[:, ::-1], axis=1)

    out = frags.take(any_known)
    first = first[any_known]
    last = last[any_known]
    new_len = (last - first + 1).astype(np.int32)
    # shift codes left by `first` per row
    idx = np.clip(first[:, None] + np.arange(out.max_len)[None, :], 0, L - 1)
    codes = np.take_along_axis(out.codes, idx, axis=1)
    codes[np.arange(out.max_len)[None, :] >= new_len[:, None]] = CODE_DOT
    out.codes = codes
    out.start = (out.start + first).astype(np.int32)
    out.length = new_len
    return out


def has_gaps(frags: PatFrags) -> np.ndarray:
    cols = np.arange(frags.max_len)[None, :]
    in_read = cols < frags.length[:, None]
    return ((frags.codes == CODE_DOT) & in_read).any(axis=1)


def _pass_filters(frags: PatFrags, strip=False, min_cpgs=1, no_gaps=False):
    """cview's pass_read filter chain (ref: cview.cpp:8-17)."""
    if strip:
        frags = strip_frags(frags)
    keep = np.ones(frags.nr_frags, dtype=bool)
    if min_cpgs > 1:
        keep &= frags.length >= min_cpgs
    if no_gaps:
        keep &= ~has_gaps(frags)
    return frags.take(keep) if not keep.all() else frags


# ---------------------------------------------------------------------------
# blocks overlap machinery
# ---------------------------------------------------------------------------


def overlap_pairs(frags: PatFrags, bstart, bend):
    """(frag_idx, block_idx) pairs for every fragment/block overlap.

    Blocks must be sorted by startCpG (ends may be non-monotonic; we use a
    running-max bound like the reference's deque scan, homog.cpp:246-258).
    """
    bstart = np.asarray(bstart, dtype=np.int64)
    bend = np.asarray(bend, dtype=np.int64)
    s = frags.start.astype(np.int64)
    e = s + frags.length
    be_max = np.maximum.accumulate(bend)
    lo = np.searchsorted(be_max, s, side="right")  # first block with end > start
    hi = np.searchsorted(bstart, e, side="left")  # blocks starting before read end
    counts = np.maximum(hi - lo, 0)
    fi = np.repeat(np.arange(frags.nr_frags), counts)
    offs = np.repeat(lo - np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    bi = np.arange(fi.shape[0], dtype=np.int64) + offs
    # exact overlap check (running-max bound may over-include)
    ok = (bstart[bi] < e[fi]) & (bend[bi] > s[fi])
    return fi[ok], bi[ok]


def filter_by_blocks(frags: PatFrags, bstart, bend, strict=False, strip=False,
                     min_cpgs=1, no_gaps=False) -> PatFrags:
    """cview: keep reads overlapping blocks; --strict clips each read to each
    overlapping block (ref: cview.cpp:87-167)."""
    fi, bi = overlap_pairs(frags, bstart, bend)
    if not strict:
        keep = np.unique(fi)
        return _pass_filters(frags.take(keep), strip, min_cpgs, no_gaps)

    bstart = np.asarray(bstart, dtype=np.int64)
    bend = np.asarray(bend, dtype=np.int64)
    sub = frags.take(fi)
    os = np.maximum(sub.start.astype(np.int64), bstart[bi])
    oe = np.minimum(sub.start.astype(np.int64) + sub.length, bend[bi])
    shift = (os - sub.start).astype(np.int64)
    new_len = (oe - os).astype(np.int32)
    idx = np.clip(shift[:, None] + np.arange(sub.max_len)[None, :], 0,
                  max(sub.max_len - 1, 0))
    codes = np.take_along_axis(sub.codes, idx, axis=1)
    codes[np.arange(sub.max_len)[None, :] >= new_len[:, None]] = CODE_DOT
    sub.codes = codes
    sub.start = os.astype(np.int32)
    sub.length = new_len
    return _pass_filters(sub, strip, min_cpgs, no_gaps)


# ---------------------------------------------------------------------------
# homog: read-level U/X/M counting per block
# ---------------------------------------------------------------------------


def homog_counts(frags: PatFrags, bstart, bend, ranges, min_cpgs=5,
                 inclusive=False, backend="numpy"):
    """Per-block counts of reads binned by their methylation fraction.

    ranges: monotone float boundaries starting at 0 and ending at 1, e.g.
    [0, 0.34, 0.66, 1] -> 3 bins U/X/M. Exact reference binning semantics
    (ref: homog.cpp:154-196): H counts as C; nrC+nrT >= min_cpgs; bin b where
    ranges[b] <= nrC/(nrC+nrT) < ranges[b+1], last bin right-inclusive.

    backend="jax" runs the per-pair clip/count/bin/scatter on device
    (segment-sum over (read, block) overlap pairs).

    Returns int64 (n_blocks, len(ranges)-1).
    """
    if backend == "jax":
        return _homog_counts_jax(frags, bstart, bend, ranges, min_cpgs,
                                 inclusive)
    ranges = np.asarray(ranges, dtype=np.float32)
    if ranges[0] != 0 or ranges[-1] != 1 or (np.diff(ranges) <= 0).any():
        raise IllegalArgumentError("Invalid range - must start with 0, end with 1")
    nbins = ranges.shape[0] - 1
    B = len(np.asarray(bstart))
    out = np.zeros((B, nbins), dtype=np.int64)
    if frags.nr_frags == 0 or B == 0:
        return out

    fi, bi = overlap_pairs(frags, bstart, bend)
    if fi.shape[0] == 0:
        return out
    bstart = np.asarray(bstart, dtype=np.int64)
    bend = np.asarray(bend, dtype=np.int64)

    s = frags.start.astype(np.int64)[fi]
    ln = frags.length.astype(np.int64)[fi]
    codes = frags.codes[fi]
    if inclusive:
        off = np.zeros_like(s)
        length = ln
        # inclusive uses full read but requires full length >= min_cpgs
        len_gate = ln
    else:
        os_ = np.maximum(s, bstart[bi])
        oe = np.minimum(s + ln, bend[bi])
        off = os_ - s
        length = oe - os_
        len_gate = length

    cols = np.arange(frags.max_len)[None, :]
    in_clip = (cols >= off[:, None]) & (cols < (off + length)[:, None])
    is_c = ((codes == CODE_C) | (codes == CODE_H)) & in_clip
    is_t = (codes == CODE_T) & in_clip
    nrC = is_c.sum(axis=1).astype(np.float32)
    nrT = is_t.sum(axis=1).astype(np.float32)

    informative = nrC + nrT
    # reference gates on clipped length (update_block, homog.cpp:185-196) AND
    # on informative calls (update_m2, homog.cpp:165-167)
    keep = (len_gate >= min_cpgs) & (informative >= min_cpgs) & (informative > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        meth = nrC / informative

    meth = meth[keep]
    bins = np.searchsorted(ranges, meth, side="right") - 1
    bins = np.minimum(bins, nbins - 1)
    flat = bi[keep] * nbins + bins
    np.add.at(out.reshape(-1), flat, frags.count[fi][keep])
    return out


def _homog_kernel_jax():
    """Build (once) the jitted device kernel for homog counting."""
    global _HOMOG_KERNEL
    if _HOMOG_KERNEL is not None:
        return _HOMOG_KERNEL
    from functools import partial

    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n_blocks", "n_bins"))
    def kernel(codes, off, length, len_gate, counts, bi, ranges, min_cpgs,
               n_blocks, n_bins):
        L = codes.shape[1]
        cols = jnp.arange(L)[None, :]
        in_clip = (cols >= off[:, None]) & (cols < (off + length)[:, None])
        is_c = ((codes == CODE_C) | (codes == CODE_H)) & in_clip
        is_t = (codes == CODE_T) & in_clip
        nrC = is_c.sum(axis=1).astype(jnp.float32)
        nrT = is_t.sum(axis=1).astype(jnp.float32)
        informative = nrC + nrT
        keep = ((len_gate >= min_cpgs) & (informative >= min_cpgs)
                & (informative > 0))
        meth = nrC / jnp.maximum(informative, 1.0)
        bins = jnp.searchsorted(ranges, meth, side="right") - 1
        bins = jnp.minimum(bins, n_bins - 1)
        flat = jnp.where(keep, bi * n_bins + bins, n_blocks * n_bins)
        return jax.ops.segment_sum(
            jnp.where(keep, counts, 0), flat,
            num_segments=n_blocks * n_bins + 1,
        )[: n_blocks * n_bins].reshape(n_blocks, n_bins)

    _HOMOG_KERNEL = kernel
    return kernel


_HOMOG_KERNEL = None


def _homog_counts_jax(frags, bstart, bend, ranges, min_cpgs, inclusive):
    """Device path of homog_counts: identical semantics, jnp reductions +
    segment-sum scatter over the (read, block) pairs."""
    import jax.numpy as jnp

    ranges = np.asarray(ranges, dtype=np.float32)
    nbins = ranges.shape[0] - 1
    B = len(np.asarray(bstart))
    if frags.nr_frags == 0 or B == 0:
        return np.zeros((B, nbins), dtype=np.int64)
    fi, bi = overlap_pairs(frags, bstart, bend)
    if fi.shape[0] == 0:
        return np.zeros((B, nbins), dtype=np.int64)
    bstart = np.asarray(bstart, dtype=np.int64)
    bend = np.asarray(bend, dtype=np.int64)
    s = frags.start.astype(np.int64)[fi]
    ln = frags.length.astype(np.int64)[fi]
    if inclusive:
        off = np.zeros_like(s)
        length = ln
        len_gate = ln
    else:
        os_ = np.maximum(s, bstart[bi])
        oe = np.minimum(s + ln, bend[bi])
        off = os_ - s
        length = oe - os_
        len_gate = length

    kernel = _homog_kernel_jax()
    out = kernel(
        jnp.asarray(frags.codes[fi]), jnp.asarray(off.astype(np.int32)),
        jnp.asarray(length.astype(np.int32)),
        jnp.asarray(len_gate.astype(np.int32)),
        jnp.asarray(frags.count[fi].astype(np.int32)),
        jnp.asarray(bi.astype(np.int32)), jnp.asarray(ranges),
        np.int32(min_cpgs), B, int(nbins),
    )
    return np.asarray(out, dtype=np.int64)


# ---------------------------------------------------------------------------
# pat_sampler: binomial thinning
# ---------------------------------------------------------------------------


def sample_frags(frags: PatFrags, rate, reps=1, seed=None) -> PatFrags:
    """count' ~ Binomial(count*reps, rate); drop zero-count rows
    (ref: src/pat_sampler/sampler.cpp:36-50 — which seeds per line from the
    wall clock; we use a counter-based generator for reproducibility)."""
    if not 0 < rate <= 1:
        raise IllegalArgumentError(f"Invalid sampling rate: {rate}")
    rng = np.random.default_rng(seed)
    new_counts = rng.binomial(frags.count.astype(np.int64) * reps, rate)
    keep = new_counts > 0
    out = frags.take(keep)
    out.count = new_counts[keep].astype(np.int32)
    return out


# ---------------------------------------------------------------------------
# mask_pat: hide sites inside given blocks
# ---------------------------------------------------------------------------


def mask_sites(frags: PatFrags, bstart, bend, strip=True) -> PatFrags:
    """Replace calls falling in [bstart, bend) blocks with '.', then strip
    (ref: src/pat2beta/mask_pat.cpp:12-150)."""
    if frags.nr_frags == 0:
        return frags
    bstart = np.asarray(bstart, dtype=np.int64)
    bend = np.asarray(bend, dtype=np.int64)
    sites = frags.start.astype(np.int64)[:, None] + np.arange(frags.max_len)[None, :]
    # site masked iff inside any block: use searchsorted over sorted blocks
    be_max = np.maximum.accumulate(bend)
    j = np.searchsorted(bstart, sites, side="right") - 1
    jc = np.clip(j, 0, len(bstart) - 1)
    masked = (j >= 0) & (sites < bend[jc]) & (sites >= bstart[jc])
    if len(bstart) > 1 and not (bstart[1:] >= bend[:-1]).all():
        # overlapping blocks: fall back to interval stabbing via running max
        masked = (j >= 0) & (sites < be_max[jc])
    codes = frags.codes.copy()
    codes[masked] = CODE_DOT
    out = PatFrags(frags.start.copy(), frags.length.copy(), frags.count.copy(),
                   codes, frags.chrom_id.copy(), frags.chrom_names,
                   frags.extras)
    return strip_frags(out) if strip else out
