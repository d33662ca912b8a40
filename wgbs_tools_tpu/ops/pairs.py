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
