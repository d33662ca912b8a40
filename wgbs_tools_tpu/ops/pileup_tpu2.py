"""Sub-block grouped Pallas pileup kernel (v2).

The v1 kernel (ops/pileup_tpu.py) aligns every fragment across the full
tile+halo width (~1280 lanes) even though a fragment spans <= 128 sites, so
~90% of the barrel-roll work is wasted. Here each fragment is assigned to the
128-lane sub-block containing its start:

- rolls happen in a 2-sub-block (256-lane) window — 7 conditional
  `pltpu.roll` steps instead of 11 over 1280 lanes;
- per-chunk contributions reduce into (G_MAX, 256) strips with a one-hot MXU
  matmul over the fragment axis (the host packs chunks so they span at most
  G_MAX sub-blocks and never cross a tile boundary);
- strips add into the tile accumulator at 128-aligned dynamic lane offsets,
  and the tile's right halo carries to the next tile through scratch (the
  grid runs sequentially on the core).

Fragments must be sorted by start with length <= SB (128 sites); the host
splits longer fragments into <=128-site pieces first (piece pileups are
independent, so this is exact).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.pat import CODE_C, CODE_DOT, CODE_H

SB = 128          # sub-block width (lanes)
TILE_SB = 8       # sub-blocks per output tile -> tile = 1024 sites
FRAG_CHUNK = 256  # fragment rows per chunk (row fc-1 is always padding)
G_MAX = 8         # max distinct sub-blocks per chunk


def planar_pack128(codes):
    """uint8 (F, 128) codes -> int32 (F, 8) planar words (see pileup_tpu)."""
    return planar_pack_cols(codes, SB // 16)


def planar_pack_cols(codes, w_cols):
    """uint8 (F, L) codes -> int32 (F, w_cols) planar words.

    Site s lands in word column s % w_cols at bit 2*(s // w_cols); the kernel
    inverts this with 16 shift/mask steps. Columns beyond L unpack to code 0,
    which the kernel's validity mask hides — so only the real code columns
    are packed and shipped (words h2d drops 4x for typical <=32-site WGBS
    fragments vs the fixed 128-site layout)."""
    F, L = codes.shape
    assert L <= 16 * w_cols
    word = np.zeros((F, w_cols), dtype=np.uint32)
    for j in range((L + w_cols - 1) // w_cols):
        blk = codes[:, j * w_cols : (j + 1) * w_cols].astype(np.uint32)
        if blk.shape[1] < w_cols:
            blk = np.pad(blk, ((0, 0), (0, w_cols - blk.shape[1])))
        word |= blk << (2 * j)
    return word.view(np.int32)


def _kernel(c0_ref, c1_ref, meta_blk, words_blk, meth_out, cov_out,
            acc_m, acc_c, carry_m, carry_c, sem_out, *, tile, fc, g_max):
    W2 = 2 * SB
    acc_w = tile + 2 * SB
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        @pl.when(i == 0)
        def _():
            carry_m[...] = jnp.zeros_like(carry_m)
            carry_c[...] = jnp.zeros_like(carry_c)

        acc_m[...] = jnp.zeros_like(acc_m)
        acc_c[...] = jnp.zeros_like(acc_c)
        acc_m[:, :W2] = carry_m[...]
        acc_c[:, :W2] = carry_c[...]

    active = (c0_ref[i] + c) < c1_ref[i]

    @pl.when(active)
    def _():
        rel = meta_blk[0, 0].reshape(fc, 1)      # start relative to window
        lw = meta_blk[0, 1]                      # length | (sub-block - base) << 16
        lens = (lw & 0xFFFF).reshape(fc, 1)
        counts = meta_blk[0, 2].reshape(fc, 1)
        dg = (lw >> 16).reshape(fc)
        base_g = meta_blk[0, 0, fc - 1]          # stashed in the padding row

        words = words_blk[...]
        codes = jnp.concatenate(
            [(words >> (2 * j)) & 3 for j in range(16)], axis=1
        )  # (fc, 16 * w_cols)
        work = jnp.concatenate(
            [codes,
             jnp.full((fc, W2 - codes.shape[1]), CODE_DOT, dtype=jnp.int32)],
            axis=1,
        )  # (fc, W2)
        rr = jnp.remainder(rel, SB)
        for b in range(7):  # shifts < SB = 128
            bit = (rr >> b) & 1
            work = jnp.where(bit == 1, pltpu.roll(work, 1 << b, axis=1), work)

        p_col = jax.lax.broadcasted_iota(jnp.int32, (fc, W2), dimension=1)
        valid = (p_col >= rr) & (p_col < rr + lens)
        observed = valid & (work != CODE_DOT)
        meth_call = observed & ((work == CODE_C) | (work == CODE_H))

        mv = jnp.where(meth_call, counts, 0).astype(jnp.float32)
        cv = jnp.where(observed, counts, 0).astype(jnp.float32)
        onehot = (
            dg[None, :] == jax.lax.broadcasted_iota(jnp.int32, (g_max, fc), 0)
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
        # NOTE: unrolled on purpose — a fori_loop needs dynamic_slice on the
        # strips, which Mosaic does not lower
        for g in range(g_max):
            off = off0 + g * SB
            ok = (off >= 0) & (off + W2 <= acc_w)
            offc = pl.multiple_of(jnp.clip(off, 0, acc_w - W2), SB)
            add_m = jnp.where(ok, strips_m[g], 0.0).astype(jnp.int32)[None]
            add_c = jnp.where(ok, strips_c[g], 0.0).astype(jnp.int32)[None]
            acc_m[:, pl.ds(offc, W2)] += add_m
            acc_c[:, pl.ds(offc, W2)] += add_c

    @pl.when(c == n_c - 1)
    def _():
        carry_m[...] = acc_m[:, tile : tile + W2]
        carry_c[...] = acc_c[:, tile : tile + W2]
        cp_m = pltpu.make_async_copy(
            acc_m.at[:, pl.ds(0, tile)], meth_out.at[i], sem_out.at[0]
        )
        cp_c = pltpu.make_async_copy(
            acc_c.at[:, pl.ds(0, tile)], cov_out.at[i], sem_out.at[1]
        )
        cp_m.start()
        cp_c.start()
        cp_m.wait()
        cp_c.wait()


@functools.partial(
    jax.jit,
    static_argnames=("window_len", "tile", "fc", "g_max", "max_chunks",
                     "interpret"),
)
def _call(c0, c1, meta, words, window_len, tile, fc, g_max, max_chunks,
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
            pl.BlockSpec((1, 3, fc), meta_idx),
            pl.BlockSpec((fc, words.shape[1]), words_idx),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile + 2 * SB), jnp.int32),
            pltpu.VMEM((1, tile + 2 * SB), jnp.int32),
            pltpu.VMEM((1, 2 * SB), jnp.int32),
            pltpu.VMEM((1, 2 * SB), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, tile=tile, fc=fc, g_max=g_max)
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


def _split_long(start, length, count, codes, max_piece=SB):
    """Split fragments longer than max_piece into independent pieces."""
    start = np.asarray(start, dtype=np.int64)
    length = np.asarray(length, dtype=np.int32)
    count = np.asarray(count, dtype=np.int32)
    codes = np.asarray(codes)
    long = length > max_piece
    if not long.any():
        return start, length, count, codes[:, :max_piece]
    s_out = [start[~long]]
    l_out = [length[~long]]
    c_out = [count[~long]]
    code_out = [codes[~long][:, :max_piece]]
    for i in np.nonzero(long)[0]:
        L = int(length[i])
        for off in range(0, L, max_piece):
            ln = min(max_piece, L - off)
            row = np.full(max_piece, CODE_DOT, dtype=np.uint8)
            row[:ln] = codes[i, off : off + ln]
            s_out.append(np.array([start[i] + off]))
            l_out.append(np.array([ln], dtype=np.int32))
            c_out.append(np.array([count[i]], dtype=np.int32))
            code_out.append(row[None])
    start = np.concatenate(s_out)
    order = np.argsort(start, kind="stable")
    return (
        start[order],
        np.concatenate(l_out)[order],
        np.concatenate(c_out)[order],
        np.concatenate(code_out)[order],
    )


def stage_v2(start, length, count, codes, window_start, window_len,
             tile=SB * TILE_SB, fc=FRAG_CHUNK, g_max=G_MAX):
    """Host staging: split long frags, clip to the window, pack chunks
    bounded by (fc-1 rows, g_max sub-blocks, one tile), build meta/words and
    per-tile chunk ranges. Codes keep their natural width; the packed words
    use the narrowest pow2 column count that covers it."""
    codes = np.asarray(codes)
    start, length, count, codes = _split_long(start, length, count, codes)
    rel = (np.asarray(start) - window_start).astype(np.int64)
    keep = (rel + length > 0) & (rel < window_len)
    rel, length, count, codes = rel[keep], length[keep], count[keep], codes[keep]
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

    F = rel.shape[0]
    g = rel // SB
    tile_of = g // TILE_SB

    breaks = [0]
    cstart = 0
    while cstart < F:
        lim1 = cstart + fc - 1
        lim2 = int(np.searchsorted(g, g[cstart] + g_max, side="left"))
        lim3 = int(np.searchsorted(tile_of, tile_of[cstart] + 1, side="left"))
        nxt = max(min(lim1, lim2, lim3, F), cstart + 1)
        breaks.append(nxt)
        cstart = nxt
    n_real = max(len(breaks) - 1, 1)
    # Bucket the chunk count (keep 3 significant bits) so streamed batches of
    # slightly different sizes reuse one compiled kernel shape instead of
    # recompiling per batch; padded chunks sit past every tile's [c0, c1)
    # range and are never visited.
    gran = 1 << max(4, n_real.bit_length() - 3)
    n_chunks = (n_real + gran - 1) // gran * gran

    w_cols = 2
    while 16 * w_cols < min(codes.shape[1], SB):
        w_cols <<= 1
    meta = np.zeros((n_chunks, 3, fc), dtype=np.int32)
    meta[:, 1, :] = g_max << 16  # padded rows select no one-hot group
    words = np.zeros((n_chunks * fc, w_cols), dtype=np.int32)
    all_words = (planar_pack_cols(codes, w_cols) if F else
                 np.zeros((0, w_cols), dtype=np.int32))
    bstarts = np.asarray(breaks[:-1], dtype=np.int64)
    bends = np.asarray(breaks[1:], dtype=np.int64)
    if F:
        lens_c = bends - bstarts
        ci_arr = np.repeat(np.arange(n_real), lens_c)
        pos_arr = np.arange(F) - np.repeat(bstarts, lens_c)
        base_g = g[bstarts]
        meta[ci_arr, 0, pos_arr] = rel
        meta[ci_arr, 1, pos_arr] = (
            length | ((g - base_g[ci_arr]).astype(np.int32) << 16))
        meta[ci_arr, 2, pos_arr] = count
        meta[:n_real, 0, fc - 1] = base_g  # row fc-1 is guaranteed padding
        words[ci_arr * fc + pos_arr] = all_words
        chunk_tile = tile_of[bstarts]
    else:
        chunk_tile = np.zeros(n_real, dtype=np.int64)

    num_tiles = (window_len + tile - 1) // tile
    c0 = np.searchsorted(chunk_tile[: len(breaks) - 1] if F else chunk_tile,
                         np.arange(num_tiles), side="left")
    c1 = np.searchsorted(chunk_tile[: len(breaks) - 1] if F else chunk_tile,
                         np.arange(num_tiles), side="right")
    if F == 0:
        c0 = np.zeros(num_tiles, dtype=np.int64)
        c1 = np.zeros(num_tiles, dtype=np.int64)
    max_chunks = max(int((c1 - c0).max(initial=1)), 1)
    # pow2-bucket the grid's chunk axis too (inactive steps are guarded in
    # the kernel); with the n_chunks bucketing above, streamed batches hit
    # one compiled executable per (window, size-octave) instead of per batch
    max_chunks = 1 << (max_chunks - 1).bit_length()
    return (c0.astype(np.int32), c1.astype(np.int32), meta, words,
            max_chunks)


def pileup_pallas_v2(start, length, count, codes, window_start, window_len,
                     interpret=None, packed=False, to_host=True):
    """Pileup over 1-based [window_start, window_start + window_len)."""
    from ..formats.pat import unpack_codes

    if packed:
        codes = unpack_codes(np.asarray(codes))
    tile = SB * TILE_SB
    c0, c1, meta, words, max_chunks = stage_v2(
        start, length, count, codes, window_start, window_len, tile=tile
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    meth, cov = _call(
        jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(meta),
        jnp.asarray(words),
        window_len, tile, FRAG_CHUNK, G_MAX, max_chunks, interpret,
    )
    if not to_host:
        return jnp.stack([meth, cov], axis=1)
    return np.stack([np.asarray(meth), np.asarray(cov)], axis=1)
