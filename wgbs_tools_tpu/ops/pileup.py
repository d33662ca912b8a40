"""Pileup: pat fragments -> per-CpG (meth, cov) counts.

This is the pat2beta hot loop. The reference streams pat text through a C++
accumulator one line at a time (ref: src/pat2beta/stdin2beta.cpp:59-93):
cov[site] += count for calls in {C,T,H}, meth[site] += count for {C,H}.

Here fragments are dense device arrays and the pileup is a batched
scatter-add over the CpG axis. Two implementations:

- `pileup_xla`: jnp scatter-add — the portable reference path (CPU + TPU).
- `pileup_pallas` (ops/pileup_tpu.py): tiled Pallas kernel that exploits the
  sorted-by-start invariant to accumulate each site tile in VMEM.

Both operate on a window [window_start, window_start + window_len) of 1-based
global CpG indices and return int32 (window_len, 2).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.pat import CODE_C, CODE_DOT, CODE_H, PatFrags

DEFAULT_BATCH = 1 << 20


@partial(jax.jit, static_argnames=("window_len",))
def _pileup_batch_xla(start_rel, length, count, codes, window_len):
    """Scatter-add one fragment batch into a (window_len, 2) count table.

    start_rel: int32[F] fragment start relative to window (may be negative
    for fragments overlapping the left edge).
    codes: uint8[F, L].
    """
    F, L = codes.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    site = start_rel[:, None] + pos
    in_read = pos < length[:, None]
    in_window = (site >= 0) & (site < window_len)
    observed = in_read & in_window & (codes != CODE_DOT)
    meth_call = (codes == CODE_C) | (codes == CODE_H)

    cnt = count[:, None]
    cov_val = jnp.where(observed, cnt, 0)
    meth_val = jnp.where(observed & meth_call, cnt, 0)

    # out-of-window positions scatter to a dropped overflow row
    site_clipped = jnp.where(in_window, site, window_len)

    flat_sites = site_clipped.reshape(-1)
    out = jnp.zeros((window_len + 1, 2), dtype=jnp.int32)
    out = out.at[flat_sites, 0].add(meth_val.reshape(-1), mode="drop")
    out = out.at[flat_sites, 1].add(cov_val.reshape(-1), mode="drop")
    return out[:window_len]


def pileup_xla(start, length, count, codes, window_start, window_len,
               batch=DEFAULT_BATCH):
    """Host-orchestrated pileup over fragment batches.

    start: int32[F] 1-based global CpG start indices.
    Returns np.int32 (window_len, 2) [meth, cov].
    """
    start = np.asarray(start)
    F = start.shape[0]
    total = jnp.zeros((window_len, 2), dtype=jnp.int32)
    for lo in range(0, max(F, 1), batch):
        hi = min(lo + batch, F)
        if hi <= lo:
            break
        sl = slice(lo, hi)
        total = total + _pileup_batch_xla(
            jnp.asarray(start[sl].astype(np.int32) - window_start),
            jnp.asarray(np.asarray(length)[sl].astype(np.int32)),
            jnp.asarray(np.asarray(count)[sl].astype(np.int32)),
            jnp.asarray(np.asarray(codes)[sl]),
            window_len,
        )
    return np.asarray(total)


class PileupAccumulator:
    """Streaming single-device pileup: fold PatFrags batches into a
    (window_len, 2) count table with bounded per-batch work.

    pat files are sorted by startCpG, so each streaming chunk covers a
    contiguous slice of the site axis; every batch piles up over its local
    span only (padded to a power-of-two bucket to bound recompiles) and adds
    into the host total. The multi-device counterpart is
    parallel.sharded.ShardedPileup; both produce counts bit-identical to a
    one-shot pileup (integer adds commute).
    """

    def __init__(self, window, backend="auto", batch=DEFAULT_BATCH,
                 min_span=1 << 16):
        self.window = window
        self.n = window[1] - window[0]
        self.backend = backend
        self.batch = batch
        self.min_span = min_span
        self.total = np.zeros((self.n, 2), dtype=np.int64)

    def add(self, frags: PatFrags):
        s, e = self.window
        sel = frags.slice_sites(s, e, min_overlap=1) if frags.nr_frags \
            else frags
        if sel.nr_frags == 0:
            return
        lo = max(int(sel.start.min()), s)
        hi = min(int((sel.start.astype(np.int64) + sel.length).max()), e)
        span = max(hi - lo, 1)
        n_pad = self.min_span
        while n_pad < span:
            n_pad <<= 1
        n_pad = min(n_pad, self.n)
        lo = min(lo, e - n_pad)
        res = pileup_frags(sel, (lo, lo + n_pad), backend=self.backend,
                           batch=self.batch)
        self.total[lo - s : lo - s + n_pad] += res

    def result(self):
        return self.total


def pileup_frags(frags: PatFrags, window, backend="auto", **kw):
    """Pileup a PatFrags batch over a 1-based [s, e) site window.

    backend: "pallas2" = sub-block grouped TPU kernel (fastest steady-state),
    "pallas" = tile/halo TPU kernel, "xla" = scatter path; "auto" picks
    pallas2 on TPU, xla elsewhere.
    """
    s, e = window
    n = e - s
    sel = frags.slice_sites(s, e, min_overlap=1) if frags.nr_frags else frags
    if backend == "auto":
        backend = "pallas2" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas2":
        from .pileup_tpu2 import pileup_pallas_v2

        return pileup_pallas_v2(
            sel.start, sel.length, sel.count, sel.codes, s, n, **kw
        )
    if backend == "pallas":
        from .pileup_tpu import pileup_pallas

        return pileup_pallas(
            sel.start, sel.length, sel.count, sel.packed(), s, n, **kw
        )
    return pileup_xla(sel.start, sel.length, sel.count, sel.codes, s, n, **kw)
