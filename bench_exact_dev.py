#!/usr/bin/env python
"""On-chip timing of the exact-device segmentation after the round-5
band-clip + row-gather changes (n=60k, W=1000, K=3, ~30x coverage —
the BENCHMARKS.md shape that measured 1.78 s/window in round 4)."""

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

N = int(os.environ.get("BE_N", 60_000))
K = int(os.environ.get("BE_K", 3))
COV = float(os.environ.get("BE_COV", 10.0))  # per sample -> 3*10 = 30x
MAX_CPG = int(os.environ.get("BE_MAXCPG", 1000))
MAX_BP = int(os.environ.get("BE_MAXBP", 2000))
TRIALS = int(os.environ.get("BE_TRIALS", 5))

rng = np.random.default_rng(0)
cov = rng.poisson(COV, size=(K, N)).astype(np.int64)
meth = rng.binomial(cov, np.clip(
    0.15 + 0.7 * ((np.arange(N) // 250) % 2), 0, 1)[None, :])
data = np.stack([meth, cov], axis=2)
loci = np.cumsum(rng.integers(5, 60, size=N)).astype(np.int64) + 100

from wgbs_tools_tpu.models.segment_exact_tpu import (  # noqa: E402
    _round_width, max_band_width, segment_exact_device_T)

W = min(MAX_CPG, N)
bw = max_band_width(loci, W, MAX_BP)
print(f"n={N} K={K} W={W} max_bp={MAX_BP} band_width={bw} "
      f"(clipped {_round_width(bw)})")

t0 = time.perf_counter()
T = segment_exact_device_T(data, loci, W, MAX_BP, 15.0)
print(f"cold (compile + table build + h2d): {time.perf_counter()-t0:.2f} s")
assert T is not None, "window ineligible (cap?)"

ts = []
for _ in range(TRIALS):
    t0 = time.perf_counter()
    T2 = segment_exact_device_T(data, loci, W, MAX_BP, 15.0)
    ts.append(time.perf_counter() - t0)
assert (T2 == T).all()
ts.sort()
print(f"warm per-window: median {ts[len(ts)//2]*1e3:.0f} ms "
      f"(min {ts[0]*1e3:.0f}, max {ts[-1]*1e3:.0f})")

if os.environ.get("BE_HOST"):
    from wgbs_tools_tpu.models.segment import segment_borders

    t0 = time.perf_counter()
    segment_borders(data, loci, MAX_CPG, MAX_BP, 15.0, mode="exact")
    print(f"host exact (1 thread incl. traceback): "
          f"{time.perf_counter()-t0:.2f} s")

if os.environ.get("BE_STAGES"):
    import jax
    import jax.numpy as jnp

    from wgbs_tools_tpu.models.segment_exact_tpu import (
        _device_table, _dp_exact_pairs, _exact_cost_pairs, build_ll_table,
        max_band_total)

    need = max_band_total(data, loci, W, MAX_BP) + 1
    cap = 1 << max(int(need - 1).bit_length(), 6)
    tbl = _device_table(15.0, build_ll_table(15.0, cap))
    Wb = _round_width(bw)
    ps = np.concatenate([np.zeros((K, 1, 2), np.int64),
                         np.cumsum(data.astype(np.int64), axis=1)], axis=1)
    pm = (ps[:, :, 0] & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    pt = (ps[:, :, 1] & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    dpm, dpt = jnp.asarray(pm), jnp.asarray(pt)
    dlo = jnp.asarray(loci, dtype=jnp.int32)

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[:1])

    out = _exact_cost_pairs(dpm, dpt, dlo, tbl, Wb, MAX_BP)
    sync(out)
    for name, fn in (("cost", lambda: _exact_cost_pairs(
            dpm, dpt, dlo, tbl, Wb, MAX_BP)),):
        ts = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            sync(fn())
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {sorted(ts)[len(ts)//2]*1e3:.0f} ms")
    ch, cl, ok = out
    sync(_dp_exact_pairs(ch, cl, ok, Wb))
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        sync(_dp_exact_pairs(ch, cl, ok, Wb))
        ts.append(time.perf_counter() - t0)
    print(f"dp:   {sorted(ts)[len(ts)//2]*1e3:.0f} ms")

if os.environ.get("BE_BATCH"):
    import jax
    import jax.numpy as jnp

    from wgbs_tools_tpu.models.segment_exact_tpu import (
        _device_table, _exact_batch_ring, build_ll_table, max_band_total)

    B = int(os.environ.get("BE_B", 8))
    need = max_band_total(data, loci, W, MAX_BP) + 1
    cap = 1 << max(int(need - 1).bit_length(), 6)
    tbl = _device_table(15.0, build_ll_table(15.0, cap))
    Wb = _round_width(bw)
    ps = np.concatenate([np.zeros((K, 1, 2), np.int64),
                         np.cumsum(data.astype(np.int64), axis=1)], axis=1)
    pm = (ps[:, :, 0] & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    pt = (ps[:, :, 1] & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    dpm = jnp.asarray(np.broadcast_to(pm, (B,) + pm.shape))
    dpt = jnp.asarray(np.broadcast_to(pt, (B,) + pt.shape))
    dlo = jnp.asarray(np.broadcast_to(loci.astype(np.int32),
                                      (B, N)))

    def sync(o):
        np.asarray(o[:1, :1])

    sync(_exact_batch_ring(dpm, dpt, dlo, tbl, Wb, MAX_BP))
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        sync(_exact_batch_ring(dpm, dpt, dlo, tbl, Wb, MAX_BP))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts)//2]
    print(f"batched B={B}: {dt*1e3:.0f} ms total, {dt/B*1e3:.0f} ms/window")

if os.environ.get("BE_PROD"):
    # the production entry (segment_exact_device_batch) end to end,
    # including h2d of the raw counts and d2h of the tracebacks
    from wgbs_tools_tpu.models.segment_exact_tpu import (
        segment_exact_device_batch)

    B = int(os.environ.get("BE_B", 16))
    datas = np.broadcast_to(data.astype(np.uint8),
                            (B,) + data.shape).copy()
    locis = np.broadcast_to(loci, (B, N)).copy()
    Ts = segment_exact_device_batch(datas, locis, W, MAX_BP, 15.0, batch=B)
    assert all(t is not None for t in Ts)
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        Ts = segment_exact_device_batch(datas, locis, W, MAX_BP, 15.0,
                                        batch=B)
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts)//2]
    print(f"prod batch B={B}: {dt*1e3:.0f} ms total, "
          f"{dt/B*1e3:.0f} ms/window (incl. h2d + traceback d2h)")
