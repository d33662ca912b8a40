#!/usr/bin/env python
"""Microbenchmark: XLA gather forms for the exact-segmentation ll-table
lookup on the TPU (BENCHMARKS.md pegs the naive 1-D take at 0.12 G elem/s —
the entire cost-build bound). Candidates:

  t1    tbl[idx]                       (baseline 1-D take)
  t1s   sorted idx -> take -> invert   (argsort restructuring)
  t1f   lax.gather(indices_are_sorted) on the row-monotone layout
  r128  (T/128,128) row gather + one-hot select
  r8    (T/8,8) row gather + select
  oh    one-hot f32 matmul (small caps only)
"""

import os
import os.path as op
import sys
import time

sys.path.insert(0, op.dirname(op.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    op.join(op.dirname(op.abspath(__file__)), ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp

N, W = 60_000, 1024
CAP = int(os.environ.get("GB_CAP", 2048))
T = CAP * (CAP + 1) // 2
M = N * W

rng = np.random.default_rng(0)
tbl = rng.random(T).astype(np.float32)
# REALISTIC indices: the actual cost-build pattern (band totals from
# Poisson coverage prefix sums; idx = tri(nt) + nm, non-increasing along
# the W axis) — gather locality matters enormously on this chip, so
# uniform-random indices mis-measure by ~25x
cov = rng.poisson(10.0, size=N).astype(np.int64)
meth = rng.binomial(cov, 0.7).astype(np.int64)
pt = np.concatenate([[0], np.cumsum(cov)])
pm = np.concatenate([[0], np.cumsum(meth)])
i_row = np.arange(N)[:, None]
k_col = i_row - (W - 1) + np.arange(W)[None, :]
kc = np.clip(k_col, 0, None)
nt = pt[i_row + 1] - pt[kc]
nm = pm[i_row + 1] - pm[kc]
# cap band totals like max_bp does (keeps everything inside the table)
sel_ok = nt < CAP
nt = np.where(sel_ok, nt, 0)
nm = np.where(sel_ok, nm, 0)
idx = (nt * (nt + 1) // 2 + nm).astype(np.int32)
print(f"idx span {idx.min()}..{idx.max()} of T={T}; in-band "
      f"{100*sel_ok.mean():.1f}%")

d_tbl = jnp.asarray(tbl)
d_idx = jnp.asarray(idx)


def timeit(name, fn, *args):
    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        # slice ON DEVICE before fetching — np.asarray(full) would drag
        # the whole 245 MB result through the ~20 MB/s tunnel
        np.asarray(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1])

    f = jax.jit(fn)
    sync(f(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        o = f(*args)
        sync(o)
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(f"{name:6s} {dt*1e3:9.1f} ms   {M/dt/1e9:7.2f} G elem/s")
    return dt


def t1(tbl, idx):
    return jnp.take(tbl, idx)


def t1f(tbl, idx):
    # per-row monotone decreasing -> flip W to make ascending per row;
    # mark sorted (XLA may pick a cheaper emitter; correctness unaffected)
    flipped = idx[:, ::-1]
    out = jnp.take(tbl, flipped, indices_are_sorted=True)
    return out[:, ::-1]


def t1s(tbl, idx):
    flat = idx.reshape(-1)
    order = jnp.argsort(flat)
    taken = jnp.take(tbl, flat[order], indices_are_sorted=True)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    return jnp.take(taken, inv).reshape(idx.shape)


def _chunked_rows(width):
    shift = width.bit_length() - 1
    Tp = (T + width - 1) // width * width

    def f(tbl, idx):
        t2 = jnp.zeros(Tp, tbl.dtype).at[:T].set(tbl).reshape(-1, width)

        def body(idx_c):
            rows = t2[idx_c >> shift]
            lo = idx_c & (width - 1)
            sel = (jnp.arange(width, dtype=jnp.int32)[None, None, :]
                   == lo[..., None])
            return jnp.sum(jnp.where(sel, rows, 0.0), axis=-1)

        # bound the materialized rows: map over row chunks
        CH = 2000
        assert idx.shape[0] % CH == 0
        return jax.lax.map(body, idx.reshape(-1, CH, W)).reshape(idx.shape)

    return f


def oh(tbl, idx):
    # one-hot f32 matmul over table COLUMNS of a rectangular re-layout:
    # only sane for tiny T; measured for scaling info
    pass


print(f"backend={jax.default_backend()} cap={CAP} T={T} M={M}")
which = os.environ.get("GB_WHICH", "t1,t1f,t1s,r128,r8").split(",")
tests = {"t1": t1, "t1f": t1f, "t1s": t1s,
         "r128": _chunked_rows(128), "r8": _chunked_rows(8)}
for name in which:
    try:
        timeit(name, tests[name], d_tbl, d_idx)
    except Exception as e:
        print(f"{name:6s} FAILED: {str(e)[:120]}")
