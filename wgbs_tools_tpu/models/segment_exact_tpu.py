"""Exact-parity segmentation DP on device (ll table + software doubles).

The reference segmentor's borders depend on an exact chain of float32/
float64 roundings (ref: src/segment_betas/segmentor.cpp:60-159): per-dataset
log-likelihoods rounded to float32, the dataset sum and DP maximization in
IEEE float64 with strict-'>' first-argmax ties. Round 3 proved a plain-f32
device DP only reaches ~95-97% border agreement, and this round measured
that the TPU's native f64 is two-float emulation with non-IEEE rounding —
so neither floats nor hardware doubles can reproduce the chain on-chip.

This module runs the O(n*W*K) work on the TPU anyway, bit-exactly:

  1. The per-dataset likelihood is a pure function of the integer pair
     (nmeth, ntotal) — the round-3 discovery behind the host memo
     (native/segment_exact.cpp:33-43). The HOST builds a triangular float32
     table of every ll(nm, nt) with the reference rounding chain (numpy
     float32/float64 emulation, proven byte-identical to the C++ and the
     reference by the oracle tests), sized to the largest in-band total of
     the window.
  2. The DEVICE computes band counts as int32 prefix-sum differences
     (Hankel skews, gather-free), looks ll values up in the table, and
     performs the float64 dataset summation and the DP max/argmax in
     SOFTWARE IEEE-754 arithmetic over uint32 pairs (ops/softfloat.py) —
     integer ops are exact on every backend, so every double rounding and
     every tie-break equals the host chain bit-for-bit.

Windows whose in-band totals exceed the table cap (coverage*band beyond
`WGBS_TPU_LL_CAP`, default 8192 -> a 134 MB table) or whose loci are not
monotone fall back to the host path — the caller treats a None return as
"use native/numpy".
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.softfloat import (f64_add, f64_from_f32_normal,
                             f64_sort_key)
from .segment import _hankel

LL_CAP = int(os.environ.get("WGBS_TPU_LL_CAP", 8192))

_TABLE_CACHE = {}
_DEV_TABLE_CACHE = {}


def _device_table(pc, tbl):
    """Device-resident 128-padded copy of the host ll table (one resident
    at a time — re-shipping 10s-of-MB per window would dominate on slow
    links)."""
    key = (float(pc), tbl.shape[0])
    hit = _DEV_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    arr = jnp.asarray(np.pad(tbl, (0, (-tbl.shape[0]) % 128)))
    _DEV_TABLE_CACHE.clear()
    _DEV_TABLE_CACHE[key] = arr
    return arr


def build_ll_table(pc, cap):
    """Host-side float32 table of ll(nm, nt) for 0 <= nm <= nt < cap,
    triangular-flat at index nt*(nt+1)//2 + nm, with the reference's exact
    rounding chain (matches _cost_block_exact / segment_exact.cpp)."""
    # the triangular-flat layout is cap-independent (entries for nt < cap'
    # sit at identical indices in any larger table), so a cached table for
    # the same pc and any cap' >= cap is reusable as-is — per-window cap
    # variation must not rebuild a hundreds-of-MB table per window
    for (c_pc, c_cap), tbl in _TABLE_CACHE.items():
        if c_pc == float(pc) and c_cap >= cap:
            return tbl
    nt = np.repeat(np.arange(cap, dtype=np.int64),
                   np.arange(1, cap + 1, dtype=np.int64))
    size = nt.shape[0]
    nm = np.arange(size, dtype=np.int64) - (nt * (nt + 1)) // 2
    pc32 = np.float32(pc)
    nm32 = nm.astype(np.float32)
    nt32 = nt.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        p32 = (nm32 + pc32) / (nt32 + np.float32(2) * pc32)
        p64 = p32.astype(np.float64)
        t1 = np.where(p32 > 0, nm32.astype(np.float64) * np.log2(p64), 0.0)
        ll = (np.zeros(size, np.float32).astype(np.float64) + t1).astype(
            np.float32)
        t2 = np.where(p32 < 1,
                      (nt32 - nm32).astype(np.float64) * np.log2(1.0 - p64),
                      0.0)
        ll = (ll.astype(np.float64) + t2).astype(np.float32)
    ll = np.where(nt32 == 0, np.float32(0), ll)
    _TABLE_CACHE.clear()  # one table resident at a time (134 MB at the cap)
    _TABLE_CACHE[(float(pc), int(cap))] = ll
    return ll


def max_band_width(loci, W, max_bp):
    """Largest number of in-band candidate predecessors of any site — the
    effective DP window. The reference's max_bp cap (segmentor.cpp band)
    typically bounds this to ~an eighth of max_cpg at WGBS spacing, so
    clipping the device cost build and DP to it cuts both the table
    gathers and the scan work by the same factor (the host C++ DP already
    band-prunes — this is the device analogue). Exactness: every cell
    dropped by the clip has loci-distance > max_bp, i.e. was already
    masked out of the max/argmax in the full-width build."""
    if not max_bp:
        return int(W)
    loci = np.asarray(loci, dtype=np.int64)
    klo = np.searchsorted(loci, loci - max_bp, side="left")
    width = np.arange(loci.shape[0], dtype=np.int64) - klo + 1
    return int(min(max(int(width.max(initial=1)), 1), W))


def _round_width(bw):
    """Pad the band width to a lane-friendly size (mult of 128, min 128)."""
    return max((bw + 127) // 128 * 128, 128)


def max_band_total(data, loci, W, max_bp):
    """Largest in-band (nm <= nt) total of any candidate block — the table
    size the device kernel needs. Host-side, int64, monotone loci only."""
    pt = np.cumsum(np.asarray(data, dtype=np.int64)[:, :, 1], axis=1)
    pt = np.concatenate([np.zeros((pt.shape[0], 1), np.int64), pt], axis=1)
    n = loci.shape[0]
    if max_bp:
        hi = np.searchsorted(loci, loci + max_bp, side="right")
    else:
        hi = np.full(n, n, dtype=np.int64)
    hi = np.minimum(np.maximum(hi, np.arange(n) + 1), np.arange(n) + W)
    hi = np.minimum(hi, n)
    return int((pt[:, hi] - pt[:, :n]).max(initial=0))


def _gather_tbl(tbl, idx):
    """f32 table lookup via 128-lane ROW gather + one-hot lane select.

    XLA's plain 1-D `take` runs at ~0.11 G elem/s on this chip; gathering
    (T/128, 128) rows and selecting the lane on the VPU measured 3x
    faster (0.33 G elem/s, bench_gather.py) — the row fetches tile onto
    the native (8,128) layout. Chunked over the site axis with `lax.map`
    so the materialized rows stay ~128 MB. Bit-exact: the select keeps
    the f32 value untouched (0/1 mask + sum with one nonzero).
    tbl must be padded to a multiple of 128 entries.
    WGBS_TPU_LL_GATHER=take reverts to the plain take for A/B.
    """
    if os.environ.get("WGBS_TPU_LL_GATHER") == "take":
        return jnp.take(tbl, idx)
    n, Wd = idx.shape
    # bound the materialized (CH, Wd, 128) row tensor to ~134 MB even when
    # max_bp=0 leaves the window unclipped (Wd = max_cpg)
    CH = max(256, 2048 * 128 // max(Wd, 1))
    n_pad = -(-n // CH) * CH
    if n_pad != n:
        idx = jnp.pad(idx, ((0, n_pad - n), (0, 0)))
    t2 = tbl.reshape(-1, 128)
    lanes = jnp.arange(128, dtype=jnp.int32)[None, None, :]

    def body(ic):
        rows = t2[ic >> 7]
        sel = lanes == (ic & 127)[..., None]
        return jnp.sum(jnp.where(sel, rows, 0.0), axis=-1)

    out = jax.lax.map(body, idx.reshape(-1, CH, Wd)).reshape(n_pad, Wd)
    return out[:n]


def _exact_cost_body(pm, pt, loci, tbl, W, max_bp):
    """(Ch, Cl) uint32 (n, W) cost-row pairs in ascending-k order
    (pair[i, v] = cost of block [k..i], k = i-W+1+v) plus the validity
    mask (k >= 0 and within the max_bp band)."""
    n = loci.shape[0]
    K = pm.shape[0]
    j_col = jnp.arange(W, dtype=jnp.int32)[None, :]
    i_row = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = (i_row - (W - 1) + j_col) >= 0  # k >= 0

    def window_vals(vec, fill):
        pad = jnp.full(W - 1, fill, dtype=vec.dtype)
        return _hankel(jnp.concatenate([pad, vec]), n, W)

    if max_bp:
        lk = window_vals(loci, loci[0])
        ok = valid & ((loci[:, None] - lk) <= max_bp)
    else:
        ok = valid

    def ll_pairs(d):
        # int32 prefix-sum differences: wraparound-safe (in-band totals
        # < 2^31 even when the full-window cumsum wraps)
        nm = pm[d, 1 : n + 1][:, None] - window_vals(pm[d, : n + 1], 0)
        nt = pt[d, 1 : n + 1][:, None] - window_vals(pt[d, : n + 1], 0)
        use = ok & (nt > 0)
        ntc = jnp.where(use, nt, 0)
        nmc = jnp.where(use, nm, 0)
        idx = ntc * (ntc + 1) // 2 + nmc
        ll = jnp.where(use, _gather_tbl(tbl, idx), jnp.float32(0))
        # ll values are normal-or-zero f32; the cheap widen is exact here
        return f64_from_f32_normal(ll)

    def one_dataset(carry, d):
        ah, al = carry
        vh, vl = ll_pairs(d)
        return f64_add(ah, al, vh, vl), None

    # dataset 0 seeds the accumulator exactly (0.0 + v == v in IEEE for
    # v != -0, and ll is never -0) — saves one emulated add per cell
    ch0, cl0 = ll_pairs(0)
    if K > 1:
        (ch, cl), _ = jax.lax.scan(one_dataset, (ch0, cl0),
                                   jnp.arange(1, K))
    else:
        ch, cl = ch0, cl0
    return ch, cl, ok


@partial(jax.jit, static_argnames=("W", "max_bp"))
def _exact_cost_pairs(pm, pt, loci, tbl, W, max_bp):
    return _exact_cost_body(pm, pt, loci, tbl, W, max_bp)


def _dp_exact_body(Ch, Cl, ok, W, unroll=8):
    """Sequential DP over software-double cost pairs; returns ks (n,) int32
    with ks[i] = argmax predecessor (first maximum, ascending k — the
    reference's strict-'>' scan order).

    The carry is the (W,) sliding window of M values itself, advanced by a
    STATIC shift (concat of a static slice + the new value) — the round-4
    form carried the whole (n+W,) M array and paid two dynamic slices and
    two dynamic updates into it per site, which dominated the scan
    (319 ms of the 439 ms window at W_band=128; the arithmetic itself is
    ~1 ms of VPU work). Same operations in the same order on the same
    values, so the result stays bit-identical: window cells with k < 0
    are +0.0 here exactly as the old Mpad zeros were, and are excluded by
    the same `ok` mask. `unroll` sites run inside each scan step; padding
    steps past n emit discarded ks."""
    n = Ch.shape[0]
    n_pad = -(-n // unroll) * unroll
    if n_pad != n:
        Ch = jnp.pad(Ch, ((0, n_pad - n), (0, 0)))
        Cl = jnp.pad(Cl, ((0, n_pad - n), (0, 0)))
        ok = jnp.pad(ok, ((0, n_pad - n), (0, 0)))
    # ring buffer of W + unroll M values: window reads and the new-value
    # write happen at STATIC offsets (u is a python int in the unrolled
    # loop), so no per-site dynamic slice, no cross-lane shift
    Bh0 = jnp.zeros(W + unroll, jnp.uint32)  # +0.0 == M[k] init (masked)
    Bl0 = jnp.zeros(W + unroll, jnp.uint32)

    def step(carry, xs):
        Bh, Bl = carry
        i0, chs, cls, oks = xs
        outs = []
        for u in range(unroll):
            wh = jax.lax.slice(Bh, (u,), (u + W,))
            wl = jax.lax.slice(Bl, (u,), (u + W,))
            sh_, sl_ = f64_add(wh, wl, chs[u], cls[u])
            kh, kl = f64_sort_key(sh_, sl_)
            kh = jnp.where(oks[u], kh, jnp.uint32(0))
            kl = jnp.where(oks[u], kl, jnp.uint32(0))
            mhi = jnp.max(kh)
            c2 = kh == mhi
            mlo = jnp.max(jnp.where(c2, kl, jnp.uint32(0)))
            am = jnp.argmax(c2 & (kl == mlo)).astype(jnp.int32)
            Bh = Bh.at[W + u].set(sh_[am])
            Bl = Bl.at[W + u].set(sl_[am])
            outs.append((i0 + u) - (W - 1) + am)
        Bh = jnp.concatenate([Bh[unroll:], jnp.zeros(unroll, jnp.uint32)])
        Bl = jnp.concatenate([Bl[unroll:], jnp.zeros(unroll, jnp.uint32)])
        return (Bh, Bl), jnp.stack(outs)

    (_, _), ks = jax.lax.scan(
        step, (Bh0, Bl0),
        (jnp.arange(0, n_pad, unroll, dtype=jnp.int32),
         Ch.reshape(-1, unroll, W), Cl.reshape(-1, unroll, W),
         ok.reshape(-1, unroll, W)))
    return ks.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("W",))
def _dp_exact_pairs(Ch, Cl, ok, W):
    return _dp_exact_body(Ch, Cl, ok, W)


def _dp_exact_batched_ring(Ch_t, Cl_t, ok_t, W, unroll=8):
    """Batched ring-buffer DP over (n, B, W) cost pairs (site-major
    layout: the scan consumes leading-axis slices directly, avoiding the
    round-4 (B, n, W)-as-xs transpose blowup). Per-step arithmetic runs on
    (B, W) tiles, amortizing the per-instruction overhead that bounds the
    single-window scan (measured 5.3 us/site at W=128 — pure VPU issue
    overhead on 128-lane vectors). Same per-window op order as
    _dp_exact_body — bit-identical results."""
    n, B, _ = Ch_t.shape
    n_pad = -(-n // unroll) * unroll
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0), (0, 0))
        Ch_t = jnp.pad(Ch_t, pad)
        Cl_t = jnp.pad(Cl_t, pad)
        ok_t = jnp.pad(ok_t, pad)
    Bh0 = jnp.zeros((B, W + unroll), jnp.uint32)
    Bl0 = jnp.zeros((B, W + unroll), jnp.uint32)
    rows = jnp.arange(B)

    def step(carry, xs):
        Bh, Bl = carry
        i0, chs, cls, oks = xs  # chs: (unroll, B, W)
        outs = []
        for u in range(unroll):
            wh = jax.lax.slice(Bh, (0, u), (B, u + W))
            wl = jax.lax.slice(Bl, (0, u), (B, u + W))
            sh_, sl_ = f64_add(wh, wl, chs[u], cls[u])
            kh, kl = f64_sort_key(sh_, sl_)
            kh = jnp.where(oks[u], kh, jnp.uint32(0))
            kl = jnp.where(oks[u], kl, jnp.uint32(0))
            mhi = jnp.max(kh, axis=1, keepdims=True)
            c2 = kh == mhi
            mlo = jnp.max(jnp.where(c2, kl, jnp.uint32(0)), axis=1,
                          keepdims=True)
            am = jnp.argmax(c2 & (kl == mlo), axis=1).astype(jnp.int32)
            Bh = Bh.at[:, W + u].set(sh_[rows, am])
            Bl = Bl.at[:, W + u].set(sl_[rows, am])
            outs.append((i0 + u) - (W - 1) + am)
        Bh = jnp.concatenate(
            [Bh[:, unroll:], jnp.zeros((B, unroll), jnp.uint32)], axis=1)
        Bl = jnp.concatenate(
            [Bl[:, unroll:], jnp.zeros((B, unroll), jnp.uint32)], axis=1)
        return (Bh, Bl), jnp.stack(outs)  # (unroll, B)

    (_, _), ks = jax.lax.scan(
        step, (Bh0, Bl0),
        (jnp.arange(0, n_pad, unroll, dtype=jnp.int32),
         Ch_t.reshape(-1, unroll, B, W), Cl_t.reshape(-1, unroll, B, W),
         ok_t.reshape(-1, unroll, B, W)))
    return ks.reshape(-1, B).T[:, :n]  # (B, n)


@partial(jax.jit, static_argnames=("W", "max_bp"))
def _exact_batch_ring(pm, pt, loci, tbl, W, max_bp):
    """Batched cost+DP: vmapped cost build -> site-major transpose -> one
    ring-buffer DP scan over all B windows."""
    ch, cl, ok = jax.vmap(
        lambda a, b, c: _exact_cost_body(a, b, c, tbl, W, max_bp))(
            pm, pt, loci)
    return _dp_exact_batched_ring(
        jnp.moveaxis(ch, 0, 1), jnp.moveaxis(cl, 0, 1),
        jnp.moveaxis(ok, 0, 1), W)


@partial(jax.jit, static_argnames=("W", "max_bp"))
def _exact_batch_ring_raw(data, loci, tbl, W, max_bp):
    """As _exact_batch_ring but fed the RAW (B, K, n, 2) count tensor:
    the wraparound prefix sums run ON DEVICE (int32 cumsum wraps mod 2^32
    exactly like the host's int64-then-mask chain), so the h2d ships the
    narrow count bytes instead of 4x-wider precomputed prefix pairs —
    on slow links the transfer was a third of the genome-wide wall."""
    d32 = data.astype(jnp.int32)
    ps = jnp.concatenate(
        [jnp.zeros((d32.shape[0], d32.shape[1], 1, 2), jnp.int32),
         jnp.cumsum(d32, axis=2)], axis=2)
    return _exact_batch_ring(ps[..., 0], ps[..., 1], loci, tbl, W, max_bp)


def _dp_exact_batched(Ch, Cl, ok, W, unroll=8):
    """Explicitly batched DP over (B, n, W) cost pairs.

    The cost tensors stay resident and each step dynamic-slices its rows —
    passing them as scan xs made XLA materialize a transposed copy with a
    pathologically padded layout (measured: a 1 GB tensor became a 30.7 GB
    allocation). Same arithmetic and order per window as _dp_exact_body."""
    B, n, _ = Ch.shape
    n_pad = -(-n // unroll) * unroll
    if n_pad != n:
        Ch = jnp.pad(Ch, ((0, 0), (0, n_pad - n), (0, 0)))
        Cl = jnp.pad(Cl, ((0, 0), (0, n_pad - n), (0, 0)))
        ok = jnp.pad(ok, ((0, 0), (0, n_pad - n), (0, 0)))
    Mh0 = jnp.zeros((B, n_pad + W + 1), jnp.uint32)
    Ml0 = jnp.zeros((B, n_pad + W + 1), jnp.uint32)
    rows = jnp.arange(B)

    def step(carry, i0):
        Mh, Ml = carry
        chs = jax.lax.dynamic_slice(Ch, (0, i0, 0), (B, unroll, W))
        cls_ = jax.lax.dynamic_slice(Cl, (0, i0, 0), (B, unroll, W))
        oks = jax.lax.dynamic_slice(ok, (0, i0, 0), (B, unroll, W))
        outs = []
        for u in range(unroll):
            i = i0 + u
            wh = jax.lax.dynamic_slice(Mh, (0, i + 1), (B, W))
            wl = jax.lax.dynamic_slice(Ml, (0, i + 1), (B, W))
            sh_, sl_ = f64_add(wh, wl, chs[:, u], cls_[:, u])
            kh, kl = f64_sort_key(sh_, sl_)
            kh = jnp.where(oks[:, u], kh, jnp.uint32(0))
            kl = jnp.where(oks[:, u], kl, jnp.uint32(0))
            mhi = jnp.max(kh, axis=1, keepdims=True)
            c2 = kh == mhi
            mlo = jnp.max(jnp.where(c2, kl, jnp.uint32(0)), axis=1,
                          keepdims=True)
            am = jnp.argmax(c2 & (kl == mlo), axis=1).astype(jnp.int32)
            Mh = jax.lax.dynamic_update_slice(
                Mh, sh_[rows, am][:, None], (0, W + i + 1))
            Ml = jax.lax.dynamic_update_slice(
                Ml, sl_[rows, am][:, None], (0, W + i + 1))
            outs.append(i - (W - 1) + am)
        return (Mh, Ml), jnp.stack(outs)  # (unroll, B)

    (_, _), ks = jax.lax.scan(
        step, (Mh0, Ml0), jnp.arange(0, n_pad, unroll, dtype=jnp.int32))
    return ks.reshape(-1, B).T[:, :n]  # (B, n)


@partial(jax.jit, static_argnames=("W", "max_bp"))
def _exact_batch(pm, pt, loci, tbl, W, max_bp):
    """Batched cost+DP over B equal-size windows: one launch, the
    sequential scan's per-step overhead amortizes across the window batch
    (each step processes (B, W) lanes instead of (W,))."""
    ch, cl, ok = jax.vmap(
        lambda a, b, c: _exact_cost_body(a, b, c, tbl, W, max_bp))(
            pm, pt, loci)
    return _dp_exact_batched(ch, cl, ok, W)


def segment_exact_device_batch(datas, locis, W, max_bp, pseudo_count,
                               cap_limit=None, batch=16):
    """Batched device exact DP over equal-size windows.

    datas: (B, K, n, 2) int counts; locis: (B, n). Returns a list of B
    traceback arrays (n+1,) — entries are None for windows the device path
    cannot take (non-monotone loci / totals past the table cap); the caller
    runs those on the host. Windows run `batch` at a time with a fixed
    launch shape (tail padded by repeating the first window) through the
    site-major ring-buffer DP (_dp_exact_batched_ring): the scan's
    per-instruction overhead — the single-window bound, 5.3 us/site at
    the typical 128-site band — amortizes across the batch. Measured on
    the v5e chip at n=60k/K=3/~30x: 95 ms/window at batch=16 (vs 446 ms
    single-window, vs 1.78 s for the round-4 full-width form).
    """
    datas = np.asarray(datas)
    locis = np.asarray(locis, dtype=np.int64)
    B, K, n, _ = datas.shape
    res = [None] * B
    if n < 2:
        return res
    cap_limit = LL_CAP if cap_limit is None else cap_limit
    elig, need_max = [], 0
    for w in range(B):
        loci = locis[w]
        if (np.diff(loci) < 0).any() or loci.max(initial=0) >= 1 << 31:
            continue
        need = max_band_total(datas[w], loci, W, max_bp) + 1
        if need > cap_limit:
            continue
        elig.append(w)
        need_max = max(need_max, need)
    if not elig:
        return res
    cap = 1 << max(int(need_max - 1).bit_length(), 6)
    tbl = _device_table(pseudo_count, build_ll_table(pseudo_count, cap))
    Wb = min(W, _round_width(max(
        max_band_width(locis[w], W, max_bp) for w in elig)))

    # ship the counts in their narrow on-disk dtype; the wraparound
    # prefix sums run on device (_exact_batch_ring_raw) — 4x less h2d
    # than precomputed int32 prefix pairs. Batches run SYNCHRONOUSLY:
    # dispatching all launches before the first fetch (async-dispatch
    # pipelining) measured 3x SLOWER genome-wide on the tunneled chip
    # (354.7 s vs 107.8 s, same blocks) — deep dispatch queues behave
    # pathologically on this transport, matching the round-3 finding for
    # the pileup flush.
    ship = datas if datas.dtype.itemsize <= 4 else datas.astype(np.int32)
    for lo in range(0, len(elig), batch):
        sel = elig[lo : lo + batch]
        padded = sel + [sel[0]] * (batch - len(sel))
        ks = np.asarray(_exact_batch_ring_raw(
            jnp.asarray(ship[padded]),
            jnp.asarray(locis[padded], dtype=jnp.int32), tbl, Wb,
            int(max_bp) if max_bp else 0))
        for j, w in enumerate(sel):
            T = np.empty(n + 1, dtype=np.int64)
            T[0] = 0
            T[1:] = ks[j]
            res[w] = T
    return res


def segment_exact_device_T(data, loci, W, max_bp, pseudo_count,
                           cap_limit=None):
    """Device exact-parity traceback for one window, or None when the
    window is ineligible (non-monotone loci / in-band totals past the
    table cap) — the caller then uses the host path.

    Returns T (n+1,) int64 identical to native segment_exact_dp's output.
    """
    data = np.asarray(data)
    loci = np.asarray(loci, dtype=np.int64)
    n = loci.shape[0]
    if n < 2 or (np.diff(loci) < 0).any() or loci.max(initial=0) >= 1 << 31:
        return None
    cap_limit = LL_CAP if cap_limit is None else cap_limit
    need = max_band_total(data, loci, W, max_bp) + 1
    if need > cap_limit:
        return None
    cap = 1 << max(int(need - 1).bit_length(), 6)
    tbl = build_ll_table(pseudo_count, cap)
    # band clip: every candidate farther than max_bp is masked anyway, so
    # both the cost build and the DP shrink to the real band width
    Wb = min(W, _round_width(max_band_width(loci, W, max_bp)))

    d64 = data.astype(np.int64)
    ps = np.concatenate(
        [np.zeros((d64.shape[0], 1, 2), np.int64), np.cumsum(d64, axis=1)],
        axis=1)
    pm = (ps[:, :, 0] & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    pt = (ps[:, :, 1] & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

    ch, cl, ok = _exact_cost_pairs(
        jnp.asarray(pm), jnp.asarray(pt),
        jnp.asarray(loci, dtype=jnp.int32),
        _device_table(pseudo_count, tbl), Wb,
        int(max_bp) if max_bp else 0)
    ks = np.asarray(_dp_exact_pairs(ch, cl, ok, Wb))
    T = np.empty(n + 1, dtype=np.int64)
    T[0] = 0
    T[1:] = ks
    return T
