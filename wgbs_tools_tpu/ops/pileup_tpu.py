"""Tiled Pallas TPU pileup kernel.

Exploits the pat invariant that fragments are sorted by start site: the CpG
axis is cut into TILE-site tiles; grid = (tiles, fragment-chunks). Only the
fragment chunks whose starts can reach a tile (found by host-side
searchsorted — the analogue of the reference's per-region tabix pulls) are
streamed through it, selected by scalar-prefetch-driven BlockSpec index maps
so Pallas double-buffers the HBM->VMEM fragment streams automatically.

Fragment call vectors are bit-packed 2 bits/call in "planar" int32 words
(word w of a fragment holds calls {j*W16 + w : j in 0..15}), so a chunk
unpacks with 16 shift-and-mask ops plus one lane-concat. Each fragment's
calls are aligned to absolute tile coordinates with a barrel shifter —
log2(W) conditional `pltpu.roll` steps — instead of a scatter, then reduced
over the fragment axis on the VPU. This replaces the reference's
text-streaming accumulator loop (ref: src/pat2beta/stdin2beta.cpp:59-93)
with a scatter-free data-parallel formulation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.pat import CODE_C, CODE_DOT, CODE_H

TILE = 1024       # sites per grid step (lanes)
FRAG_CHUNK = 256  # fragments per inner step (sublanes)
SENTINEL = np.int32(2**30)


def _roll_bits(width):
    bits = 1
    while (1 << bits) < width:
        bits += 1
    return bits


def planar_pack(codes: np.ndarray):
    """codes uint8 (F, L) with L % 16 == 0 -> int32 (F, L // 16) planar words:
    word[f, w] = sum_j codes[f, j*(L//16) + w] << (2*j)."""
    F, L = codes.shape
    W16 = L // 16
    planes = codes.reshape(F, 16, W16).astype(np.int64)
    word = np.zeros((F, W16), dtype=np.int64)
    for j in range(16):
        word |= planes[:, j, :] << (2 * j)
    return word.astype(np.uint32).view(np.int32)


def _pileup_kernel(lo_ref, hi_ref, meta_blk, words_blk, meth_out, cov_out,
                   acc_m, acc_c, sem_out, *, max_len, tile, fc):
    W = tile + 2 * max_len
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_c = pl.num_programs(1)
    base = i * tile - max_len

    @pl.when(c == 0)
    def _():
        acc_m[...] = jnp.zeros_like(acc_m)
        acc_c[...] = jnp.zeros_like(acc_c)

    chunk_id = lo_ref[i] // fc + c
    active = chunk_id * fc < hi_ref[i]

    @pl.when(active)
    def _():
        starts = meta_blk[0, 0].reshape(fc, 1)
        lens = meta_blk[0, 1].reshape(fc, 1)
        counts = meta_blk[0, 2].reshape(fc, 1)

        words = words_blk[...]
        codes = jnp.concatenate(
            [(words >> (2 * j)) & 3 for j in range(16)], axis=1
        )  # (fc, max_len), original call order
        work = jnp.concatenate(
            [codes, jnp.full((fc, W - max_len), CODE_DOT, dtype=jnp.int32)],
            axis=1,
        )
        # barrel-shift each row right by (start - base) mod W
        r = jnp.remainder(starts - base, W)
        for b in range(_roll_bits(W)):
            bit = (r >> b) & 1
            work = jnp.where(bit == 1, pltpu.roll(work, 1 << b, axis=1), work)

        site_col = base + jax.lax.broadcasted_iota(
            jnp.int32, (fc, W), dimension=1
        )
        valid = (site_col >= starts) & (site_col < starts + lens)
        observed = valid & (work != CODE_DOT)
        meth_call = observed & ((work == CODE_C) | (work == CODE_H))

        acc_m[...] += jnp.sum(jnp.where(meth_call, counts, 0), axis=0,
                              keepdims=True)
        acc_c[...] += jnp.sum(jnp.where(observed, counts, 0), axis=0,
                              keepdims=True)

    @pl.when(c == n_c - 1)
    def _():
        # outputs live in HBM (ANY): DMA the tile's accumulated counts out
        cp_m = pltpu.make_async_copy(
            acc_m.at[:, pl.ds(max_len, tile)], meth_out.at[i], sem_out.at[0]
        )
        cp_c = pltpu.make_async_copy(
            acc_c.at[:, pl.ds(max_len, tile)], cov_out.at[i], sem_out.at[1]
        )
        cp_m.start()
        cp_c.start()
        cp_m.wait()
        cp_c.wait()


@functools.partial(
    jax.jit,
    static_argnames=("window_len", "max_len", "tile", "fc", "max_chunks",
                     "interpret"),
)
def _pileup_pallas_call(lo, hi, meta, words, window_len, max_len, tile, fc,
                        max_chunks, interpret=False):
    num_tiles = (window_len + tile - 1) // tile
    W = tile + 2 * max_len
    w16 = max_len // 16

    def meta_idx(i, c, lo_ref, hi_ref):
        return (lo_ref[i] // fc + c, 0, 0)

    def words_idx(i, c, lo_ref, hi_ref):
        return (lo_ref[i] // fc + c, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles, max_chunks),
        in_specs=[
            pl.BlockSpec((1, 4, fc), meta_idx),
            pl.BlockSpec((fc, w16), words_idx),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_pileup_kernel, max_len=max_len, tile=tile, fc=fc)
    meth, cov = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 1, tile), jnp.int32),
            jax.ShapeDtypeStruct((num_tiles, 1, tile), jnp.int32),
        ],
        interpret=interpret,
    )(lo, hi, meta, words)
    return meth.reshape(-1)[:window_len], cov.reshape(-1)[:window_len]


def pileup_pallas(start, length, count, packed_or_codes, window_start,
                  window_len, tile=TILE, fc=FRAG_CHUNK, interpret=None,
                  packed=True, to_host=True):
    """Pileup over 1-based [window_start, window_start + window_len).

    start/length/count: int32[F] (sorted by start); packed_or_codes: the
    bit-packed uint8[F, L/4] call matrix (packed=True) or raw uint8 codes.
    Returns np.int32 (window_len, 2) [meth, cov].
    """
    from ..formats.pat import unpack_codes

    start = np.asarray(start, dtype=np.int64)
    codes = np.asarray(packed_or_codes)
    if packed:
        codes = unpack_codes(codes)
    F, L = codes.shape
    max_len = max(_round_up(L, 128), 128)
    if codes.shape[1] != max_len:
        codes = np.pad(
            codes, ((0, 0), (0, max_len - codes.shape[1])),
            constant_values=CODE_DOT,
        )

    rel = (start - window_start).astype(np.int32)
    Fp = _round_up(max(F, 1), fc)
    n_chunks = Fp // fc
    meta = np.zeros((n_chunks, 4, fc), dtype=np.int32)
    starts_p = np.full(Fp, SENTINEL, dtype=np.int32)
    lens_p = np.zeros(Fp, dtype=np.int32)
    counts_p = np.zeros(Fp, dtype=np.int32)
    starts_p[:F] = rel
    lens_p[:F] = np.asarray(length, dtype=np.int32)
    counts_p[:F] = np.asarray(count, dtype=np.int32)
    meta[:, 0, :] = starts_p.reshape(n_chunks, fc)
    meta[:, 1, :] = lens_p.reshape(n_chunks, fc)
    meta[:, 2, :] = counts_p.reshape(n_chunks, fc)

    codes_p = np.full((Fp, max_len), CODE_DOT, dtype=np.uint8)
    codes_p[:F] = codes
    words = planar_pack(codes_p)  # (Fp, max_len // 16)

    num_tiles = (window_len + tile - 1) // tile
    tile_bounds = np.arange(num_tiles, dtype=np.int64) * tile
    lo = np.searchsorted(rel, tile_bounds - max_len + 1, side="left")
    hi = np.searchsorted(rel, tile_bounds + tile, side="left")
    first_chunk = lo // fc
    chunks_per_tile = (hi + fc - 1) // fc - first_chunk
    max_chunks = max(int(chunks_per_tile.max(initial=1)), 1)
    # keep index maps in range even for tiles near the end of the array
    first_chunk = np.minimum(first_chunk, max(n_chunks - max_chunks, 0))
    lo_adj = first_chunk * fc
    hi = np.minimum(hi, lo_adj + max_chunks * fc)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    meth, cov = _pileup_pallas_call(
        jnp.asarray(lo_adj.astype(np.int32)),
        jnp.asarray(hi.astype(np.int32)),
        jnp.asarray(meta),
        jnp.asarray(words),
        window_len,
        max_len,
        tile,
        fc,
        max_chunks,
        interpret,
    )
    if not to_host:
        return jnp.stack([meth, cov], axis=1)
    return np.stack([np.asarray(meth), np.asarray(cov)], axis=1)


def _round_up(x, m):
    return (x + m - 1) // m * m
