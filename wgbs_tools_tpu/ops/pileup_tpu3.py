"""Row-packed Pallas pileup kernel (v3).

The v2 kernel (pileup_tpu2.py) gives every fragment its own 256-lane row;
with WGBS fragments averaging ~12 sites, ~95% of lanes compute masked-off
work — BENCHMARKS.md's roofline pegs it at ~10% VPU occupancy. v3 closes
most of that gap:

- fragments are split at 128-site sub-block boundaries (<= 2 pieces each;
  piece pileups are independent, so this is exact);
- pieces of the same sub-block and repeat count with DISJOINT site
  intervals are bin-packed into shared kernel rows (native first-fit with
  128-bit occupancy masks — native/wgbsio.cpp::pack_rows128), cutting row
  count to roughly the local coverage depth;
- codes are pre-placed at their in-sub-block offsets on the host (gaps and
  padding decode to '.', which the kernel treats as unobserved), so the
  kernel needs NO barrel rolls and no per-fragment start/length meta: just
  unpack -> compare -> one-hot matmul into per-sub-block strips -> aligned
  adds. Rows never cross tiles, so the v2 halo carry disappears too.

Bit-exactness: identical integer adds in a different grouping (and the
same f32 one-hot matmul bound as v2: per-site per-chunk count sums must
stay < 2^24, true for any real data).

Three staged forms share that row packing (newest first, each the
fallback of the one above):
- VALUE PLANES (round 5, default — `WGBS_TPU_V3_VALS`): count-agnostic
  rows + pre-masked uint8 mv/cv planes; the kernel is two loads + two
  single-pass dots (1046.9 M frags/s on-chip at the headline shape);
- LANE COUNTS (`WGBS_TPU_V3_LANE_COUNTS`): count-agnostic rows + packed
  2-bit codes + packed per-lane 8-bit counts (415.6 M frags/s);
- CLASSIC: per-(sub-block, count) rows + packed codes; the only form for
  counts >= 256 and the tiled A/B grid.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.pat import CODE_DOT
from .pileup_tpu2 import _split_long, planar_pack_cols

import os as _os

SB = 128          # sub-block width (lanes) — also the row width
# grid geometry (env-overridable for on-chip A/B sweeps; defaults chosen
# by measurement — see BENCHMARKS.md "Roofline / speed-of-light"):
# sub-blocks per output tile -> tile = TILE_SB * 128 sites. Chunks never
# cross tiles, so at typical coverage the tile cap (not ROW_CHUNK) sets
# rows/chunk; larger tiles -> fuller chunks -> fewer grid steps.
def _env_int(name, default, lo, mult=1):
    """Env override with validation: silently-wrong geometry is worse than
    a crash (e.g. rc < 2 breaks the guaranteed-padding-row invariant that
    stashes base_g in row rc-1; Mosaic requires the row-chunk block dim to
    divide by 8)."""
    raw = _os.environ.get(name)
    if raw is None:
        return default
    try:
        v = int(raw)
    except ValueError:
        raise ValueError(f"{name}={raw!r}: must be an integer") from None
    if v < lo or v % mult:
        raise ValueError(
            f"{name}={v}: must be >= {lo}"
            + (f" and a multiple of {mult}" if mult > 1 else ""))
    return v


# geometry env vars are read AT CALL TIME (not import) so overrides work
# through the persistent worker, whose process outlives any one client env
def _tile_sb(vals=False):
    # value-plane steps are load/dot-bound, not decode-bound: the round-5
    # sweep moved the optimum to far larger tiles/chunks (see
    # BENCHMARKS.md "value-plane geometry sweep")
    return _env_int("WGBS_TPU_V3_TILE_SB", 64 if vals else 8, 1)


def _row_chunk(vals=False):
    return _env_int("WGBS_TPU_V3_RC", 1024 if vals else 256, 8,
                    mult=8)  # rows per chunk


def _g_max(vals=False):
    return _env_int("WGBS_TPU_V3_G_MAX", _tile_sb(vals),
                    1)  # sub-blocks/chunk
# measured on-chip (flat grid, headline shape, cross-process bench
# methodology — see bench.py / BENCHMARKS.md geometry sweeps):
# PACKED forms: TILE_SB=8 with rc classes (16, 128) — per-step decode
# scales with rc, so classed routing wins (397.9 vs 313.3 M frags/s
# round 4). VALUE-PLANE form: single-class rc=1024, TILE_SB=64 — steps
# are load/dot-bound, so fewer, fuller chunks win (round-5 sweep: 1869
# vs 977 M frags/s for the packed-form geometry; official 3-process
# median 2511.7 M frags/s).


def _unpack_words(words, rc):
    """(rc, 8) packed int32 -> (rc, SB) 2-bit codes, lane l = field l//8 of
    word l%8 (the host placement layout).

    Probed alternative (round 5): a single broadcasted variable shift
    `(words[:, None, :] >> 2*iota) & 3` followed by a (rc, 16, 8) ->
    (rc, 128) reshape — Mosaic rejects the shape cast
    ("infer-vector-layout: unsupported shape cast" on
    vector<16x16x8xi32> -> vector<16x128xi32>), so the 16-way
    shift+mask+lane-concat chain remains the only lowering this
    toolchain accepts."""
    return jnp.concatenate(
        [(words >> (2 * j)) & 3 for j in range(16)], axis=1)


def _kernel(c0_ref, c1_ref, meta_blk, words_blk, meth_out, cov_out,
            acc_m, acc_c, sem_out, *, tile, rc, g_max):
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        acc_m[...] = jnp.zeros_like(acc_m)
        acc_c[...] = jnp.zeros_like(acc_c)

    active = (c0_ref[i] + c) < c1_ref[i]

    @pl.when(active)
    def _():
        counts = meta_blk[0, 0].reshape(rc, 1)
        dg = meta_blk[0, 1].reshape(rc)
        base_g = meta_blk[0, 1, rc - 1] - g_max  # stashed in the padding row

        words = words_blk[...]
        # (rc, SB) — codes pre-placed at their in-sub-block offsets
        work = _unpack_words(words, rc)
        observed = work != CODE_DOT
        meth_call = observed & (work != 0)  # codes 1 (C) and 2 (H)

        mv = jnp.where(meth_call, counts, 0).astype(jnp.float32)
        cv = jnp.where(observed, counts, 0).astype(jnp.float32)
        onehot = (
            dg[None, :] == jax.lax.broadcasted_iota(jnp.int32, (g_max, rc), 0)
        ).astype(jnp.float32)
        # Precision.HIGHEST is LOAD-BEARING: the default f32 dot runs a
        # single-bf16-pass matmul on TPU (and XLA:CPU), which rounds any
        # count/strip value past 256 — found as an off-by-one on
        # count-295 fragments. With HIGHEST each f32 operand's exact
        # multi-bf16 expansion is accumulated in f32, so one-hot sums of
        # integers < 2^24 are exact (regression: test_pileup_tpu3.py::
        # test_v3_high_counts_exact).
        strips_m = jnp.dot(onehot, mv, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        strips_c = jnp.dot(onehot, cv, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        off0 = base_g * SB - i * tile
        for g in range(g_max):  # unrolled: Mosaic can't slice strips dynamically
            off = off0 + g * SB
            ok = (off >= 0) & (off + SB <= tile)
            offc = pl.multiple_of(jnp.clip(off, 0, tile - SB), SB)
            acc_m[:, pl.ds(offc, SB)] += \
                jnp.where(ok, strips_m[g], 0.0).astype(jnp.int32)[None]
            acc_c[:, pl.ds(offc, SB)] += \
                jnp.where(ok, strips_c[g], 0.0).astype(jnp.int32)[None]

    @pl.when(c == n_c - 1)
    def _():
        cp_m = pltpu.make_async_copy(acc_m, meth_out.at[i], sem_out.at[0])
        cp_c = pltpu.make_async_copy(acc_c, cov_out.at[i], sem_out.at[1])
        cp_m.start()
        cp_c.start()
        cp_m.wait()
        cp_c.wait()


def _kernel_flat(ctile_ref, meta_blk, words_blk, meth_out, cov_out,
                 acc_m, acc_c, sem_out, *, tile, rc, g_max):
    """Flat chunk-indexed grid: one step per packed row chunk.

    The tiled grid above runs (num_tiles x max_chunks) steps and skips the
    inactive ones — but with coverage spread thin (chunks/tile << pow2 max)
    most steps are pure prefetch+predicate overhead, which dominated the
    measured launch (BENCHMARKS.md round-3 roofline: ~0.8 ms of VPU work
    inside a 6.1 ms launch). Here the grid is exactly the chunk list,
    sorted by tile; the accumulator flushes whenever the next chunk belongs
    to a different tile (ctile is padded with a sentinel repeat so the
    lookahead is always in range). Tiles with no chunks are zeroed by the
    caller's `covered` mask.
    """
    c = pl.program_id(0)
    n_c = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        acc_m[...] = jnp.zeros_like(acc_m)
        acc_c[...] = jnp.zeros_like(acc_c)

    t = ctile_ref[c]
    counts = meta_blk[0, 0].reshape(rc, 1)
    dg = meta_blk[0, 1].reshape(rc)
    base_g = meta_blk[0, 1, rc - 1] - g_max  # stashed in the padding row

    words = words_blk[...]
    # (rc, SB) — codes pre-placed at their in-sub-block offsets
    work = _unpack_words(words, rc)
    observed = work != CODE_DOT
    meth_call = observed & (work != 0)  # codes 1 (C) and 2 (H)

    mv = jnp.where(meth_call, counts, 0).astype(jnp.float32)
    cv = jnp.where(observed, counts, 0).astype(jnp.float32)
    onehot = (
        dg[None, :] == jax.lax.broadcasted_iota(jnp.int32, (g_max, rc), 0)
    ).astype(jnp.float32)
    # Precision.HIGHEST: see _kernel — exactness past count 256
    strips_m = jnp.dot(onehot, mv, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    strips_c = jnp.dot(onehot, cv, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    off0 = base_g * SB - t * tile
    for g in range(g_max):  # unrolled: Mosaic can't slice strips dynamically
        off = off0 + g * SB
        ok = (off >= 0) & (off + SB <= tile)
        offc = pl.multiple_of(jnp.clip(off, 0, tile - SB), SB)
        acc_m[:, pl.ds(offc, SB)] += \
            jnp.where(ok, strips_m[g], 0.0).astype(jnp.int32)[None]
        acc_c[:, pl.ds(offc, SB)] += \
            jnp.where(ok, strips_c[g], 0.0).astype(jnp.int32)[None]

    flush = (c == n_c - 1) | (ctile_ref[c + 1] != t)

    @pl.when(flush)
    def _():
        cp_m = pltpu.make_async_copy(acc_m, meth_out.at[t], sem_out.at[0])
        cp_c = pltpu.make_async_copy(acc_c, cov_out.at[t], sem_out.at[1])
        cp_m.start()
        cp_c.start()
        cp_m.wait()
        cp_c.wait()
        acc_m[...] = jnp.zeros_like(acc_m)
        acc_c[...] = jnp.zeros_like(acc_c)


@functools.partial(
    jax.jit,
    static_argnames=("window_len", "tile", "rc", "g_max", "interpret"),
)
def _call_flat(ctile, covered, meta, words, window_len, tile, rc, g_max,
               interpret=False):
    num_tiles = (window_len + tile - 1) // tile
    n_chunks = meta.shape[0]

    def meta_idx(c, ctile_ref):
        return (c, 0, 0)

    def words_idx(c, ctile_ref):
        return (c, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 2, rc), meta_idx),
            pl.BlockSpec((rc, words.shape[1]), words_idx),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile), jnp.int32),
            pltpu.VMEM((1, tile), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel_flat, tile=tile, rc=rc, g_max=g_max)
    meth, cov = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 1, tile), jnp.int32),
            jax.ShapeDtypeStruct((num_tiles, 1, tile), jnp.int32),
        ],
        interpret=interpret,
    )(ctile, meta, words)
    # tiles with no chunks are never flushed (uninitialized HBM): mask them
    cvr = covered[:, None, None]
    meth = jnp.where(cvr, meth, 0)
    cov = jnp.where(cvr, cov, 0)
    return meth.reshape(-1)[:window_len], cov.reshape(-1)[:window_len]


def _flat_args(c0, c1, n_chunks):
    """(ctile, covered) for the flat grid, from the per-tile chunk ranges.

    ctile[c] = tile id of chunk c (chunks are already sorted by tile),
    padded past the real chunk count with a repeat of the last tile and one
    sentinel lookahead slot, so padding chunks (all-padding rows) fold into
    the final tile's accumulator as zeros and never trigger a flush early.
    """
    c0 = np.asarray(c0, dtype=np.int64)
    c1 = np.asarray(c1, dtype=np.int64)
    lens = c1 - c0
    real = np.repeat(np.arange(c0.shape[0], dtype=np.int32),
                     lens.astype(np.int64))
    ctile = np.empty(n_chunks + 1, dtype=np.int32)
    last = real[-1] if real.size else 0
    ctile[: real.size] = real
    ctile[real.size :] = last
    return ctile, (lens > 0)


def _kernel_flat_lc(ctile_ref, meta_blk, words_blk, cnts_blk, meth_out,
                    cov_out, acc_m, acc_c, sem_out, *, tile, rc, g_max,
                    fast_dot):
    """Flat grid with per-LANE repeat counts (count-agnostic row packing):
    identical to _kernel_flat except the (rc, 1) per-row count broadcast
    becomes a 4-way 8-bit unpack of the (rc, 32) count words — pieces of
    different counts share rows, so the chunk count (and the launch) shrink
    by the packing factor. Bit-exactness: same f32 one-hot matmul bound
    (per-site per-chunk count sums < 2^24)."""
    c = pl.program_id(0)
    n_c = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        acc_m[...] = jnp.zeros_like(acc_m)
        acc_c[...] = jnp.zeros_like(acc_c)

    t = ctile_ref[c]
    dg = meta_blk[0, 1].reshape(rc)
    base_g = meta_blk[0, 1, rc - 1] - g_max  # stashed in the padding row

    words = words_blk[...]
    # (rc, SB) — codes pre-placed at their in-sub-block offsets
    work = _unpack_words(words, rc)
    observed = work != CODE_DOT
    meth_call = observed & (work != 0)  # codes 1 (C) and 2 (H)

    cw = cnts_blk[...]
    cnts = jnp.concatenate(
        [(cw >> (8 * j)) & 255 for j in range(4)], axis=1)  # (rc, SB)

    mv = jnp.where(meth_call, cnts, 0).astype(jnp.float32)
    cv = jnp.where(observed, cnts, 0).astype(jnp.float32)
    onehot = (
        dg[None, :] == jax.lax.broadcasted_iota(jnp.int32, (g_max, rc), 0)
    ).astype(jnp.float32)
    # Unlike the classic kernels (whose per-row counts are unbounded and
    # need Precision.HIGHEST — see _kernel), EVERY dot input here is an
    # integer <= 255: stage_v3 gates the lane-count form off whenever any
    # count >= 256, cnts unpacks 8-bit fields, and onehot is 0/1. Integers
    # in [0, 256] are exactly representable in a single bf16 term and the
    # MXU accumulates in f32, so the DEFAULT single-pass dot is bit-exact
    # for this kernel (verified on-chip against pileup_xla on deep-overlap
    # count-255 workloads with strip sums past 2^16) at ~1/6 the MXU
    # passes of HIGHEST. WGBS_TPU_V3_LC_DOT=highest keeps the old form
    # for A/B.
    prec = (jax.lax.Precision.DEFAULT if fast_dot
            else jax.lax.Precision.HIGHEST)
    strips_m = jnp.dot(onehot, mv, preferred_element_type=jnp.float32,
                       precision=prec)
    strips_c = jnp.dot(onehot, cv, preferred_element_type=jnp.float32,
                       precision=prec)

    off0 = base_g * SB - t * tile
    for g in range(g_max):  # unrolled: Mosaic can't slice strips dynamically
        off = off0 + g * SB
        ok = (off >= 0) & (off + SB <= tile)
        offc = pl.multiple_of(jnp.clip(off, 0, tile - SB), SB)
        acc_m[:, pl.ds(offc, SB)] += \
            jnp.where(ok, strips_m[g], 0.0).astype(jnp.int32)[None]
        acc_c[:, pl.ds(offc, SB)] += \
            jnp.where(ok, strips_c[g], 0.0).astype(jnp.int32)[None]

    flush = (c == n_c - 1) | (ctile_ref[c + 1] != t)

    @pl.when(flush)
    def _():
        cp_m = pltpu.make_async_copy(acc_m, meth_out.at[t], sem_out.at[0])
        cp_c = pltpu.make_async_copy(acc_c, cov_out.at[t], sem_out.at[1])
        cp_m.start()
        cp_c.start()
        cp_m.wait()
        cp_c.wait()
        acc_m[...] = jnp.zeros_like(acc_m)
        acc_c[...] = jnp.zeros_like(acc_c)


def _kernel_flat_vals(ctile_ref, meta_blk, mv_blk, cv_blk, meth_out,
                      cov_out, acc_m, acc_c, sem_out, *, tile, rc, g_max):
    """Flat grid over pre-masked uint8 VALUE PLANES (round 5): the host
    ships the two dot operands directly — mv[lane] = count where the code
    is a methylation call, cv[lane] = count where observed, else 0 — so
    the per-step kernel work collapses to two block loads, two converts
    and two single-pass dots. The 16-way 2-bit code unpack, the 4-way
    count unpack, and the compare/select chain of _kernel_flat_lc all
    disappear (measured 2.5x: 415.6 -> 1046.9 M frags/s same-process A/B
    at the headline shape, bit-identical).

    Exactness: the value planes are uint8 (stage_v3 gates this form off at
    any count >= 256), so every dot input is an integer <= 255 — one exact
    bf16 term — and the MXU accumulates in f32: the DEFAULT-precision dot
    is bit-exact (same argument as _kernel_flat_lc's fast path; u8->bf16
    is not a Mosaic-supported cast, so the convert goes u8->i32->f32).
    Replaces the same reference hot loop, stdin2beta.cpp:59-93."""
    c = pl.program_id(0)
    n_c = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        acc_m[...] = jnp.zeros_like(acc_m)
        acc_c[...] = jnp.zeros_like(acc_c)

    t = ctile_ref[c]
    dg = meta_blk[0, 1].reshape(rc)
    base_g = meta_blk[0, 1, rc - 1] - g_max  # stashed in the padding row

    mv = mv_blk[...].astype(jnp.int32).astype(jnp.float32)
    cv = cv_blk[...].astype(jnp.int32).astype(jnp.float32)
    onehot = (
        dg[None, :] == jax.lax.broadcasted_iota(jnp.int32, (g_max, rc), 0)
    ).astype(jnp.float32)
    strips_m = jnp.dot(onehot, mv, preferred_element_type=jnp.float32)
    strips_c = jnp.dot(onehot, cv, preferred_element_type=jnp.float32)

    # 2D accumulator (tile_sb + g_max, SB): ONE dynamic sublane-offset
    # block add per plane instead of the per-g unrolled slice loop — at
    # value-plane rates those 2 * g_max tiny (1, SB) adds were the
    # dominant per-step cost (measured 2165 -> 3560 M frags/s on-chip).
    # Rows of strips beyond the chunk's real sub-blocks are structurally
    # ZERO (no dg selects them), so the g_max slack rows of the
    # accumulator absorb the overrun and the old per-g `ok` masking
    # disappears; the flush copies only the real tile_sb rows.
    tile_sb = tile // SB
    r0 = jnp.clip(base_g - t * tile_sb, 0, tile_sb)
    acc_m[pl.ds(r0, g_max), :] += strips_m.astype(jnp.int32)
    acc_c[pl.ds(r0, g_max), :] += strips_c.astype(jnp.int32)

    flush = (c == n_c - 1) | (ctile_ref[c + 1] != t)

    @pl.when(flush)
    def _():
        cp_m = pltpu.make_async_copy(acc_m.at[:tile_sb], meth_out.at[t],
                                     sem_out.at[0])
        cp_c = pltpu.make_async_copy(acc_c.at[:tile_sb], cov_out.at[t],
                                     sem_out.at[1])
        cp_m.start()
        cp_c.start()
        cp_m.wait()
        cp_c.wait()
        acc_m[...] = jnp.zeros_like(acc_m)
        acc_c[...] = jnp.zeros_like(acc_c)


def _kernel_flat_vals_fused(ctile_ref, meta_blk, mc_blk, meth_out, cov_out,
                            acc_m, acc_c, sem_out, *, tile, rc, g_max):
    """Fused-plane variant of _kernel_flat_vals: the two value planes are
    staged side by side in one (rc, 2*SB) uint8 block (mc[:, :SB] = mv,
    mc[:, SB:] = cv), so each step issues ONE load, ONE convert and ONE
    (g_max, rc) x (rc, 2*SB) dot instead of two of each; the strips split
    back at the 128-lane boundary for the two accumulator adds. Measured
    on-chip ~9% over the split-plane form at the headline shape (788 ->
    720 us/launch, K=64 burst), bit-identical. Same exactness argument as
    _kernel_flat_vals. Replaces stdin2beta.cpp:59-93."""
    c = pl.program_id(0)
    n_c = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        acc_m[...] = jnp.zeros_like(acc_m)
        acc_c[...] = jnp.zeros_like(acc_c)

    t = ctile_ref[c]
    dg = meta_blk[0, 1].reshape(rc)
    base_g = meta_blk[0, 1, rc - 1] - g_max  # stashed in the padding row

    mc = mc_blk[...].astype(jnp.int32).astype(jnp.float32)
    onehot = (
        dg[None, :] == jax.lax.broadcasted_iota(jnp.int32, (g_max, rc), 0)
    ).astype(jnp.float32)
    strips = jnp.dot(onehot, mc, preferred_element_type=jnp.float32)

    tile_sb = tile // SB
    r0 = jnp.clip(base_g - t * tile_sb, 0, tile_sb)
    acc_m[pl.ds(r0, g_max), :] += strips[:, :SB].astype(jnp.int32)
    acc_c[pl.ds(r0, g_max), :] += strips[:, SB:].astype(jnp.int32)

    flush = (c == n_c - 1) | (ctile_ref[c + 1] != t)

    @pl.when(flush)
    def _():
        cp_m = pltpu.make_async_copy(acc_m.at[:tile_sb], meth_out.at[t],
                                     sem_out.at[0])
        cp_c = pltpu.make_async_copy(acc_c.at[:tile_sb], cov_out.at[t],
                                     sem_out.at[1])
        cp_m.start()
        cp_c.start()
        cp_m.wait()
        cp_c.wait()
        acc_m[...] = jnp.zeros_like(acc_m)
        acc_c[...] = jnp.zeros_like(acc_c)


@functools.partial(
    jax.jit,
    static_argnames=("window_len", "tile", "rc", "g_max", "interpret"),
)
def _call_flat_vals(ctile, covered, meta, mv, cv, window_len, tile, rc,
                    g_max, interpret=False):
    """cv=None selects the fused-plane form: mv is then the single
    (n_chunks*rc, 2*SB) concatenated plane from stage_v3's fused
    assembly (the jit specializes on the None pytree structure)."""
    num_tiles = (window_len + tile - 1) // tile

    def meta_idx(c, ctile_ref):
        return (c, 0, 0)

    def rows_idx(c, ctile_ref):
        return (c, 0)

    tile_sb = tile // SB
    in_specs = [pl.BlockSpec((1, 2, rc), meta_idx),
                pl.BlockSpec((rc, mv.shape[1]), rows_idx)]
    operands = (ctile, meta, mv)
    if cv is None:
        kernel = functools.partial(_kernel_flat_vals_fused, tile=tile,
                                   rc=rc, g_max=g_max)
    else:
        in_specs.append(pl.BlockSpec((rc, cv.shape[1]), rows_idx))
        operands = operands + (cv,)
        kernel = functools.partial(_kernel_flat_vals, tile=tile, rc=rc,
                                   g_max=g_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(meta.shape[0],),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_sb + g_max, SB), jnp.int32),
            pltpu.VMEM((tile_sb + g_max, SB), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    meth, cov = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, tile_sb, SB), jnp.int32),
            jax.ShapeDtypeStruct((num_tiles, tile_sb, SB), jnp.int32),
        ],
        interpret=interpret,
    )(*operands)
    cvr = covered[:, None, None]
    meth = jnp.where(cvr, meth, 0)
    cov = jnp.where(cvr, cov, 0)
    return meth.reshape(-1)[:window_len], cov.reshape(-1)[:window_len]


@functools.partial(
    jax.jit,
    static_argnames=("window_len", "tile", "rc", "g_max", "interpret"),
    donate_argnums=(0,),
)
def pileup_vals_add(total, ctile, covered, meta, mv, cv, window_len,
                    tile, rc, g_max, interpret=False):
    """One dispatch: value-plane flat pileup + accumulate into the donated
    device-resident (window_len, 2) int32 running total. Fuses the
    kernel, the [meth, cov] stack and the add that the sharded per-device
    path otherwise issues as three separate launches — at value-plane
    kernel rates the extra dispatches cost as much as the kernel itself
    (BENCHMARKS.md round-5 sharded note)."""
    m, c = _call_flat_vals(ctile, covered, meta, mv, cv, window_len,
                           tile, rc, g_max, interpret)
    return total + jnp.stack([m, c], axis=1)


def _lc_fast_dot():
    """WGBS_TPU_V3_LC_DOT: 'fast' (default) runs the lane-count kernel's
    strip dots at DEFAULT precision (single MXU pass — exact because every
    input is an integer <= 255, see _kernel_flat_lc); 'highest' keeps the
    6-pass HIGHEST form for A/B."""
    return _os.environ.get("WGBS_TPU_V3_LC_DOT", "fast") != "highest"


@functools.partial(
    jax.jit,
    static_argnames=("window_len", "tile", "rc", "g_max", "interpret",
                     "fast_dot"),
)
def _call_flat_lc(ctile, covered, meta, words, cnts, window_len, tile, rc,
                  g_max, interpret=False, fast_dot=True):
    num_tiles = (window_len + tile - 1) // tile

    def meta_idx(c, ctile_ref):
        return (c, 0, 0)

    def words_idx(c, ctile_ref):
        return (c, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(meta.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 2, rc), meta_idx),
            pl.BlockSpec((rc, words.shape[1]), words_idx),
            pl.BlockSpec((rc, cnts.shape[1]), words_idx),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile), jnp.int32),
            pltpu.VMEM((1, tile), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel_flat_lc, tile=tile, rc=rc,
                               g_max=g_max, fast_dot=fast_dot)
    meth, cov = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 1, tile), jnp.int32),
            jax.ShapeDtypeStruct((num_tiles, 1, tile), jnp.int32),
        ],
        interpret=interpret,
    )(ctile, meta, words, cnts)
    cvr = covered[:, None, None]
    meth = jnp.where(cvr, meth, 0)
    cov = jnp.where(cvr, cov, 0)
    return meth.reshape(-1)[:window_len], cov.reshape(-1)[:window_len]


def call_staged(staged, window_len, interpret=False, grid="flat"):
    """Dispatch a staged tuple (from stage_v3 — carries its own geometry)
    to a kernel grid: 'flat' (default, one step per chunk) or 'tiled' (the
    original num_tiles x max_chunks form, kept for A/B benchmarking).
    (A double-buffered-flush variant was built and measured slower than
    the synchronous flush — 317 vs 510 M frags/s — and removed; the
    per-step cost is not the flush DMA wait.)"""
    if len(staged) == 10:  # value-plane form (flat grid only)
        c0, c1, meta, mvp, cvp, max_chunks, tile, rc, g_max, _tag = staged
        if grid == "tiled":
            raise ValueError("value-plane staging has no tiled-grid kernel; "
                             "unset WGBS_TPU_V3_VALS for tiled A/B")
        ctile, covered = _flat_args(c0, c1, meta.shape[0])
        return _call_flat_vals(jnp.asarray(ctile), jnp.asarray(covered),
                               jnp.asarray(meta), jnp.asarray(mvp),
                               None if cvp is None else jnp.asarray(cvp),
                               window_len, tile, rc, g_max, interpret)
    if len(staged) == 9:  # lane-count form (flat grid only)
        c0, c1, meta, words, cnts, max_chunks, tile, rc, g_max = staged
        if grid == "tiled":
            raise ValueError("lane-count staging has no tiled-grid kernel; "
                             "unset WGBS_TPU_V3_LANE_COUNTS for tiled A/B")
        ctile, covered = _flat_args(c0, c1, meta.shape[0])
        return _call_flat_lc(jnp.asarray(ctile), jnp.asarray(covered),
                             jnp.asarray(meta), jnp.asarray(words),
                             jnp.asarray(cnts), window_len, tile, rc,
                             g_max, interpret, _lc_fast_dot())
    c0, c1, meta, words, max_chunks, tile, rc, g_max = staged
    if grid == "tiled":
        return _call(jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(meta),
                     jnp.asarray(words), window_len, tile,
                     rc, g_max, max_chunks, interpret)
    ctile, covered = _flat_args(c0, c1, meta.shape[0])
    return _call_flat(jnp.asarray(ctile), jnp.asarray(covered),
                      jnp.asarray(meta), jnp.asarray(words), window_len,
                      tile, rc, g_max, interpret)


@functools.partial(
    jax.jit,
    static_argnames=("window_len", "tile", "rc", "g_max", "max_chunks",
                     "interpret"),
)
def _call(c0, c1, meta, words, window_len, tile, rc, g_max, max_chunks,
          interpret=False):
    num_tiles = (window_len + tile - 1) // tile
    n_chunks = meta.shape[0]

    def meta_idx(i, c, c0_ref, c1_ref):
        return (jnp.minimum(c0_ref[i] + c, n_chunks - 1), 0, 0)

    def words_idx(i, c, c0_ref, c1_ref):
        return (jnp.minimum(c0_ref[i] + c, n_chunks - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles, max_chunks),
        in_specs=[
            pl.BlockSpec((1, 2, rc), meta_idx),
            pl.BlockSpec((rc, words.shape[1]), words_idx),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile), jnp.int32),
            pltpu.VMEM((1, tile), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, tile=tile, rc=rc, g_max=g_max)
    meth, cov = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 1, tile), jnp.int32),
            jax.ShapeDtypeStruct((num_tiles, 1, tile), jnp.int32),
        ],
        interpret=interpret,
    )(c0, c1, meta, words)
    return meth.reshape(-1)[:window_len], cov.reshape(-1)[:window_len]


def _prep_window(start, length, count, codes, window_start, window_len):
    """Split long frags, clip to the window; returns (rel, length, count,
    codes) with rel in [0, window_len) and length <= SB."""
    codes = np.asarray(codes)
    start, length, count, codes = _split_long(start, length, count, codes)
    rel = (np.asarray(start) - window_start).astype(np.int64)
    keep = (rel + length > 0) & (rel < window_len)
    rel, length, count, codes = (rel[keep], length[keep], count[keep],
                                 codes[keep])
    neg = np.nonzero(rel < 0)[0]
    if neg.size:
        codes = codes.copy()
        width = codes.shape[1]
        for idx in neg:
            sh = int(-rel[idx])
            row = np.full(width, CODE_DOT, dtype=np.uint8)
            ln = max(int(length[idx]) - sh, 0)
            if ln > 0:
                row[:ln] = codes[idx, sh : sh + ln]
            codes[idx] = row
            length[idx] = ln
            rel[idx] = 0
        pos = length > 0
        rel, length, count, codes = (rel[pos], length[pos], count[pos],
                                     codes[pos])
    return rel, length, count, codes


def _env_lane_counts():
    """WGBS_TPU_V3_LANE_COUNTS (default ON): pack rows count-agnostically
    and carry per-LANE 8-bit repeat counts instead of one count per row.
    Pieces of different counts then share rows, cutting the row count
    (measured 1.36x at the headline workload: 504k -> 370k rows) at the
    price of an extra (rc, 32) count-word input (+128 B/row h2d) and a
    4-way 8-bit unpack in the kernel. Measured on-chip: 409.1 vs
    379.7 M frags/s for the classic form (both with the HIGHEST-precision
    strip dots). Only the flat grid implements it; counts >= 256 fall
    back to the classic per-count-row form automatically."""
    return _os.environ.get("WGBS_TPU_V3_LANE_COUNTS", "1") not in ("0", "")


def _env_vals():
    """WGBS_TPU_V3_VALS (default ON): stage pre-masked uint8 VALUE PLANES
    — mv[lane] = count where the code is a methylation call, cv[lane] =
    count where observed, else 0 — instead of packed 2-bit codes + packed
    8-bit counts. The kernel's per-step work collapses to two block loads
    + two single-pass dots; the whole unpack/compare/select chain
    disappears. Measured on-chip at the headline shape: 1046.9 vs 415.6 M
    frags/s (same-process A/B, bit-identical). Trade-off: 256 B/row h2d
    vs the packed form's 160 B/row (irrelevant for device-resident staged
    batches, visible on slow links — the tunnel e2e auto-policy picks the
    host kernel there anyway). Rides the lane-count gate: any count >=
    256 falls back to classic staging (values then stay one exact bf16
    term each, keeping the DEFAULT-precision dot bit-exact)."""
    return _os.environ.get("WGBS_TPU_V3_VALS", "1") not in ("0", "")


def _env_fused():
    """WGBS_TPU_V3_FUSED_PLANE (default ON): stage the two value planes
    side by side in one (rows, 2*SB) uint8 matrix so the kernel does one
    load/convert/dot per step instead of two (~9% on-chip, bit-identical;
    zero extra host cost — the class assembly scatter writes the halves
    of the wide plane instead of two narrow ones)."""
    return _os.environ.get("WGBS_TPU_V3_FUSED_PLANE", "1") not in ("0", "")


def stage_v3(start, length, count, codes, window_start, window_len,
             tile=None, rc=None, g_max=None, classes="auto",
             lane_counts=None, vals=None, fused=None):
    """Host staging: window prep, sub-block split, native row packing,
    code placement, chunking. Returns (c0, c1, meta, words, max_chunks,
    tile, rc, g_max) — the tuple carries its geometry so call_staged can
    never decode it with mismatched module defaults — or None when the
    native packer is unavailable.

    classes: optional ascending row-count classes, e.g. (64, 256). The
    per-step kernel compute scales with the static rc regardless of a
    chunk's actual row fill (BENCHMARKS.md geometry sweep), so chunks are
    then partitioned by row count into one staged tuple per class — short
    chunks dispatch on a small-rc grid — and the return value is a LIST of
    tuples whose kernel outputs sum exactly (disjoint chunk sets, integer
    adds). With classes the break bound is classes[-1]."""
    from ..native import pack_rows_native

    rel, length, count, codes = _prep_window(
        start, length, count, codes, window_start, window_len)
    F = rel.shape[0]
    W = codes.shape[1]

    # split at sub-block boundaries: each fragment (len <= SB) yields <= 2
    # pieces, each inside a single sub-block
    rr_all = (rel % SB).astype(np.int64)
    g_all = (rel // SB).astype(np.int64)
    len1 = np.minimum(length, SB - rr_all).astype(np.int64)
    len2 = (length - len1).astype(np.int64)
    has2 = len2 > 0

    p_g = np.concatenate([g_all, g_all[has2] + 1])
    p_rr = np.concatenate([rr_all, np.zeros(int(has2.sum()), np.int64)])
    p_len = np.concatenate([len1, len2[has2]])
    p_cnt = np.concatenate([count, count[has2]]).astype(np.int32)
    # piece code source: (frag index, column offset within the fragment)
    p_src = np.concatenate([np.arange(F), np.nonzero(has2)[0]])
    p_off = np.concatenate([np.zeros(F, np.int64), len1[has2]])

    order = np.argsort(p_g, kind="stable")
    p_g, p_rr, p_len, p_cnt = (p_g[order], p_rr[order], p_len[order],
                               p_cnt[order])
    p_src, p_off = p_src[order], p_off[order]

    if lane_counts is None:
        lane_counts = _env_lane_counts()
    lane_counts = bool(lane_counts and F
                       and int(p_cnt.max(initial=0)) < 256)
    if vals is None:
        vals = _env_vals()
    vals = bool(vals and lane_counts)
    if fused is None:
        fused = _env_fused()
    fused = bool(fused and vals)

    # geometry defaults are FORM-aware (resolved only now that the form is
    # known): packed forms are decode-bound per step -> small classed
    # chunks; value planes are load/dot-bound -> one big single-class grid
    if classes == "auto":
        classes = _env_classes(vals)
    if tile is None:
        tile = SB * _tile_sb(vals)
    if rc is None:
        rc = _row_chunk(vals)
    if g_max is None:
        g_max = _g_max(vals)
    if classes is not None:
        classes = tuple(sorted(int(c) for c in classes))
        if not classes or classes[0] < 8 or any(c % 8 for c in classes):
            raise ValueError(f"bad rc classes {classes}: each must be a "
                             "multiple of 8 (Mosaic block-dim constraint), "
                             ">= 8")
        rc = classes[-1]
    if tile % SB:
        raise ValueError(f"tile={tile} must be a multiple of SB={SB}")
    tile_sb = tile // SB

    if F:
        pk_cnt = np.ones_like(p_cnt) if lane_counts else p_cnt
        packed = pack_rows_native(p_g, pk_cnt, p_rr, p_len)
    else:
        packed = (np.zeros(0, np.int32),) * 3
    if packed is None:
        return None
    piece_row, row_g, row_count = packed
    R = row_g.shape[0]

    # value-plane staging: write the kernel's two dot operands directly
    # (one byte per lane); on any failure fall back to the packed-words
    # lane-count form below
    all_mv = all_cv = None
    if vals:
        from ..native import place_vals_native

        all_mv = np.zeros((max(R, 1), SB), dtype=np.uint8)
        all_cv = np.zeros((max(R, 1), SB), dtype=np.uint8)
        ok = (place_vals_native(codes, p_src, p_off, p_rr, p_len, p_cnt,
                                piece_row, all_mv, all_cv) if F else 0)
        if ok is None:
            vals = False
            all_mv = all_cv = None

    all_words = None
    if not vals:
        # place piece codes into per-row planar words: the fused native
        # pass writes the packed (R, 8) word matrix directly (one C loop
        # instead of the numpy rowmat scatter + planar_pack_cols —
        # together ~1.1 s per 2M fragments, the dominant host-staging
        # cost). Skipped entirely by the value-plane form above.
        from ..native import place_pack_native

        all_words = np.full((max(R, 1), SB // 16), -1, dtype=np.int32)
        placed = (place_pack_native(codes, p_src, p_off, p_rr, p_len,
                                    piece_row, all_words)
                  if F else 0)
        if placed is None and F:
            # numpy fallback: dense DOT-gapped (R, SB) matrix, then
            # bit-pack. PERF: one reused int32 (P, W) buffer, in-place
            # adds. Fresh large temps are dominated by first-touch page
            # faults on this host, and the (P,1)+(1,W) outer-broadcast
            # ufunc path is ~25x slower than materialize-then-add — both
            # avoided here.
            rowmat = np.full((max(R, 1), SB), CODE_DOT, dtype=np.uint8)
            P = p_g.shape[0]
            # int32 indices halve the hot buffer's footprint, but flat
            # offsets reach F*W / R*SB — switch to int64 before they
            # could wrap (a direct pileup_frags call on a
            # >=17M-fragment batch at W=128)
            idt = (np.int64 if max(int(F) * W, (R + 1) * SB) >= (1 << 31)
                   else np.int32)
            colw = np.arange(W, dtype=idt)
            m = colw[None, :] < p_len[:, None].astype(idt)
            buf = np.empty((P, W), dtype=idt)
            buf[:] = colw
            np.minimum(buf, (p_len - 1).astype(idt)[:, None], out=buf)
            buf += (p_src.astype(np.int64) * W + p_off).astype(
                idt)[:, None]
            pvals = codes.reshape(-1)[buf[m]]
            buf[:] = colw
            buf += (piece_row.astype(np.int64) * SB + p_rr).astype(
                idt)[:, None]
            rowmat.reshape(-1)[buf[m]] = pvals
            all_words = (planar_pack_cols(rowmat, SB // 16) if R else
                         np.zeros((0, SB // 16), dtype=np.int32))

    all_cnts = None
    if lane_counts and not vals:
        from ..native import place_counts_native

        all_cnts = np.zeros((max(R, 1), SB // 4), dtype=np.int32)
        if place_counts_native(p_cnt, p_rr, p_len, piece_row,
                               all_cnts) is None:
            return None  # rows were packed count-agnostically; no mixing

    # chunking over rows: bounded rows, sub-block span, single tile
    row_tile = row_g // tile_sb
    breaks = [0]
    cstart = 0
    while cstart < R:
        lim1 = cstart + rc - 1
        lim2 = int(np.searchsorted(row_g, row_g[cstart] + g_max, side="left"))
        lim3 = int(np.searchsorted(row_tile, row_tile[cstart] + 1,
                                   side="left"))
        nxt = max(min(lim1, lim2, lim3, R), cstart + 1)
        breaks.append(nxt)
        cstart = nxt
    bstarts = np.asarray(breaks[:-1], dtype=np.int64)
    bends = np.asarray(breaks[1:], dtype=np.int64)
    if not R:
        if vals:
            all_mv = np.zeros((0, SB), dtype=np.uint8)
            all_cv = np.zeros((0, SB), dtype=np.uint8)
        else:
            all_words = np.zeros((0, SB // 16), dtype=np.int32)
    planes = (all_mv, all_cv) if vals else None
    num_tiles = (window_len + tile - 1) // tile
    if classes is None:
        return _assemble_class(row_g, row_tile, row_count, all_words,
                               bstarts, bends, rc, g_max, tile, num_tiles,
                               R, all_cnts=all_cnts, planes=planes,
                               fused=fused)
    out = []
    lens_c = bends - bstarts
    lo = 0
    for rc_c in classes:
        # a class-rc_c chunk holds at most rc_c - 1 rows: row rc_c - 1 must
        # stay padding (it carries the base_g stash)
        sel = (lens_c > lo) & (lens_c <= rc_c - 1) if rc_c != classes[-1] \
            else (lens_c > lo)
        out.append(_assemble_class(
            row_g, row_tile, row_count, all_words, bstarts[sel], bends[sel],
            rc_c, g_max, tile, num_tiles, R, all_cnts=all_cnts,
            planes=planes, fused=fused))
        lo = rc_c - 1
    return out


def _assemble_class(row_g, row_tile, row_count, all_words, bstarts, bends,
                    rc, g_max, tile, num_tiles, R, all_cnts=None,
                    planes=None, fused=False):
    """Build one staged tuple from a (sorted, disjoint) subset of chunk row
    ranges. Shared by the single-class stage_v3 and stage_v3_classes.
    With all_cnts (lane-count mode) the tuple gains the (n_chunks*rc, 32)
    count-word matrix after `words` (9 fields instead of 8). With `planes`
    (value-plane mode, (all_mv, all_cv)) the tuple instead carries the two
    (n_chunks*rc, 128) uint8 value planes where words/cnts would sit, plus
    a trailing "vals" marker (10 fields) — zero-filled padding rows are
    "no contribution" by construction."""
    n_real = max(bstarts.shape[0], 1)
    gran = 1 << max(4, n_real.bit_length() - 3)
    n_chunks = (n_real + gran - 1) // gran * gran

    w_cols = SB // 16
    meta = np.zeros((n_chunks, 2, rc), dtype=np.int32)
    meta[:, 1, :] = g_max  # padding rows select no one-hot group
    if planes is not None:
        if fused:
            # one wide plane: [:, :SB] = mv, [:, SB:] = cv (the fused
            # kernel's single dot operand); cvp stays None in the tuple
            mvp = np.zeros((n_chunks * rc, 2 * SB), dtype=np.uint8)
            cvp = None
        else:
            mvp = np.zeros((n_chunks * rc, SB), dtype=np.uint8)
            cvp = np.zeros((n_chunks * rc, SB), dtype=np.uint8)
        words = cnts = None
    else:
        mvp = cvp = None
        words = np.full((n_chunks * rc, w_cols), -1,
                        dtype=np.int32)  # all '.'
        cnts = (np.zeros((n_chunks * rc, SB // 4), dtype=np.int32)
                if all_cnts is not None else None)
    if R and bstarts.shape[0]:
        lens_c = bends - bstarts
        ci_arr = np.repeat(np.arange(bstarts.shape[0]), lens_c)
        rows = np.repeat(bstarts, lens_c) + (
            np.arange(int(lens_c.sum())) -
            np.repeat(np.cumsum(lens_c) - lens_c, lens_c))
        pos_arr = rows - np.repeat(bstarts, lens_c)
        base_g = row_g[bstarts]
        meta[ci_arr, 0, pos_arr] = row_count[rows]
        meta[ci_arr, 1, pos_arr] = (row_g[rows] - base_g[ci_arr]).astype(
            np.int32)
        # base_g stashed in the guaranteed-padding row rc-1 (offset by g_max
        # so the padding default there still selects no group after decode)
        meta[: bstarts.shape[0], 1, rc - 1] = base_g + g_max
        if planes is not None:
            mvp[ci_arr * rc + pos_arr, :SB] = planes[0][rows]
            if fused:
                mvp[ci_arr * rc + pos_arr, SB:] = planes[1][rows]
            else:
                cvp[ci_arr * rc + pos_arr] = planes[1][rows]
        else:
            words[ci_arr * rc + pos_arr] = all_words[rows]
            if cnts is not None:
                cnts[ci_arr * rc + pos_arr] = all_cnts[rows]
        chunk_tile = row_tile[bstarts]
    else:
        chunk_tile = np.zeros(n_real, dtype=np.int64)

    if R and bstarts.shape[0]:
        c0 = np.searchsorted(chunk_tile, np.arange(num_tiles), side="left")
        c1 = np.searchsorted(chunk_tile, np.arange(num_tiles), side="right")
    else:
        c0 = np.zeros(num_tiles, dtype=np.int64)
        c1 = np.zeros(num_tiles, dtype=np.int64)
    max_chunks = max(int((c1 - c0).max(initial=1)), 1)
    max_chunks = 1 << (max_chunks - 1).bit_length()
    if planes is not None:
        return (c0.astype(np.int32), c1.astype(np.int32), meta, mvp,
                cvp, max_chunks, tile, rc, g_max, "vals")
    if cnts is not None:
        return (c0.astype(np.int32), c1.astype(np.int32), meta, words,
                cnts, max_chunks, tile, rc, g_max)
    return (c0.astype(np.int32), c1.astype(np.int32), meta, words,
            max_chunks, tile, rc, g_max)


def _env_classes(vals=False):
    """rc classes from WGBS_TPU_V3_CLASSES (e.g. '64,256'; 'none' disables).

    Packed-form default (16, 128): measured 397.9 vs 313.3 M frags/s for
    the single-class grid at the headline shape (round-4 class sweep) —
    per-step DECODE work scales with the static rc there, so routing
    short chunks to a small grid pays. Value-plane default: NO classes —
    per-step work is loads + dots, so one launch with full rc=1024 chunks
    wins (round-5 sweep: 1869 single-class vs 977 with (16, 128))."""
    raw = _os.environ.get("WGBS_TPU_V3_CLASSES")
    if raw is None:
        return None if vals else (16, 128)
    raw = raw.strip().lower()
    if not raw or raw in ("none", "0", "off"):
        return None
    return tuple(int(x) for x in raw.split(","))


def pileup_pallas_v3(start, length, count, codes, window_start, window_len,
                     interpret=None, packed=False, to_host=True):
    """Pileup over 1-based [window_start, window_start + window_len)."""
    from ..formats.pat import unpack_codes

    if packed:
        codes = unpack_codes(np.asarray(codes))
    grid = _os.environ.get("WGBS_TPU_PILEUP_V3_GRID", "flat")
    # lane-count/value-plane staging has flat-grid kernels only; geometry
    # (classes, tile, rc) resolves inside stage_v3 by the active form
    lane = _env_lane_counts() and grid == "flat"
    staged = stage_v3(start, length, count, codes, window_start, window_len,
                      lane_counts=lane)
    if staged is None:  # native packer unavailable: v2 does the same job
        from .pileup_tpu2 import pileup_pallas_v2

        return pileup_pallas_v2(start, length, count, codes, window_start,
                                window_len, interpret=interpret,
                                to_host=to_host)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not isinstance(staged, list):
        meth, cov = call_staged(staged, window_len, interpret, grid)
    else:
        # per-class grids over disjoint chunk sets: outputs sum exactly
        meth = cov = None
        for st in staged:
            m, c = call_staged(st, window_len, interpret, grid)
            meth = m if meth is None else meth + m
            cov = c if cov is None else cov + c
    if not to_host:
        return jnp.stack([meth, cov], axis=1)
    return np.stack([np.asarray(meth), np.asarray(cov)], axis=1)
