"""Adjacent-CpG pair counts (tt/tc/ct/cc) — the `.pairs` format.

ref: src/pat2beta/stdin2pairs.cpp:59-97 (experimental in the reference; the
wrapper pat2pairs.py exists but is not registered). Counts are indexed at the
second site of each pair.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.pat import CODE_C, CODE_T


@partial(jax.jit, static_argnames=("window_len",))
def _pairs_batch(start_rel, length, count, codes, window_len):
    F, L = codes.shape
    pos = jnp.arange(1, L, dtype=jnp.int32)[None, :]
    site = start_rel[:, None] + pos
    pre = codes[:, :-1]
    cur = codes[:, 1:]
    in_read = pos < length[:, None]
    in_win = (site >= 0) & (site < window_len)
    valid = (
        in_read & in_win
        & ((pre == CODE_T) | (pre == CODE_C))
        & ((cur == CODE_T) | (cur == CODE_C))
    )
    # pair id: tt=0 tc=1 ct=2 cc=3
    pair = (pre == CODE_C).astype(jnp.int32) * 2 + (cur == CODE_C)
    site_c = jnp.where(in_win, site, window_len)
    flat = site_c * 4 + pair
    out = jnp.zeros(((window_len + 1) * 4,), dtype=jnp.int32)
    out = out.at[flat.reshape(-1)].add(
        jnp.where(valid, count[:, None], 0).reshape(-1), mode="drop"
    )
    return out[: window_len * 4].reshape(window_len, 4)


def pair_counts(frags, window):
    """(window_len, 4) int32 [tt, tc, ct, cc] over 1-based [s, e)."""
    s, e = window
    sel = frags.slice_sites(s, e) if frags.nr_frags else frags
    return np.asarray(
        _pairs_batch(
            jnp.asarray(sel.start.astype(np.int32) - s),
            jnp.asarray(sel.length.astype(np.int32)),
            jnp.asarray(sel.count.astype(np.int32)),
            jnp.asarray(sel.codes),
            e - s,
        )
    )


@partial(jax.jit, donate_argnums=0)
def _pairs_accum(acc, start_rel, length, count, codes):
    """acc (n, 4) int32 += this batch's pair counts (donated buffer)."""
    n = acc.shape[0]
    F, L = codes.shape
    pos = jnp.arange(1, L, dtype=jnp.int32)[None, :]
    site = start_rel[:, None] + pos
    pre = codes[:, :-1]
    cur = codes[:, 1:]
    valid = (
        (pos < length[:, None]) & (site >= 0) & (site < n)
        & ((pre == CODE_T) | (pre == CODE_C))
        & ((cur == CODE_T) | (cur == CODE_C))
    )
    pair = (pre == CODE_C).astype(jnp.int32) * 2 + (cur == CODE_C)
    flat = jnp.where(valid, site * 4 + pair, n * 4)
    return (
        acc.reshape(-1)
        .at[flat.reshape(-1)]
        .add(jnp.where(valid, count[:, None], 0).reshape(-1), mode="drop")
        .reshape(n, 4)
    )


class StreamingPairs:
    """Bounded-memory whole-genome pair counting: fold PatFrags batches
    into a device-resident (window_len, 4) table, fetch once at the end.

    Pairs are strictly intra-read (ref: stdin2pairs.cpp:59-97 walks one
    line at a time), so the per-chunk contributions are purely additive —
    streaming needs no overlap carry and is bit-identical to the one-shot
    pair_counts on the concatenated input. Host RSS stays O(chunk); only
    the final (n, 4) table (451 MB at hg19) is ever materialized.
    Fragment-count / code-width padding buckets keep the jitted update in
    a small set of compiled shapes across chunks.
    """

    def __init__(self, window):
        self.window = window
        n = window[1] - window[0]
        self.acc = jnp.zeros((n, 4), dtype=jnp.int32)

    def add(self, frags):
        s, e = self.window
        sel = frags.slice_sites(s, e) if frags.nr_frags else frags
        F = sel.nr_frags
        if F == 0:
            return
        Fp = max(1 << (F - 1).bit_length(), 1 << 12)
        W = (sel.codes.shape[1] + 31) // 32 * 32
        start = np.full(Fp, -(1 << 30), dtype=np.int32)  # padding: off-window
        start[:F] = sel.start.astype(np.int64) - s
        length = np.zeros(Fp, dtype=np.int32)
        length[:F] = sel.length
        count = np.zeros(Fp, dtype=np.int32)
        count[:F] = sel.count
        codes = np.full((Fp, W), 3, dtype=np.uint8)  # CODE_DOT padding
        codes[:F, : sel.codes.shape[1]] = sel.codes
        self.acc = _pairs_accum(self.acc, jnp.asarray(start),
                                jnp.asarray(length), jnp.asarray(count),
                                jnp.asarray(codes))

    def result(self):
        return np.asarray(self.acc)
