"""Software IEEE-754 binary64 arithmetic on uint32 pairs (pure JAX).

Why this exists: the reference segmentor's DP accumulates likelihoods in
C `double` (ref: src/segment_betas/segmentor.cpp:60-159), and byte-identical
segmentation borders require reproducing every double rounding in that
chain. The TPU has no IEEE f64: enabling x64 on this backend yields
double-word (two-f32, ~49-bit) emulation whose add/mul are NOT IEEE-rounded
(measured: `(a+b)` differs from numpy float64 in the last bits — see
BENCHMARKS.md "exact segmentation on device"). Integer ops, however, are
exact on every backend. So the exact device DP represents doubles by their
64-bit patterns in (hi, lo) uint32 pairs and performs IEEE round-to-nearest-
even addition and ordering with pure integer arithmetic — bit-exact by
construction, on any backend, with x64 disabled.

Scope: finite values and +-inf ordering; the adder itself assumes finite
operands (the segmentation DP masks its -inf band cells before any
addition — `segmentor.cpp` only ever adds finite M[k] to finite row values).
NaNs never arise in the likelihood chain. Subnormal inputs/outputs are
handled (gradual underflow), though the DP's value range never reaches them.

Everything is elementwise and branch-free: usable inside jit/vmap/scan and
Pallas-free (plain XLA ops vectorize fine on the VPU).
"""

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
_M20 = 0xFFFFF          # low 20 bits (double mantissa high word)
_BIT52_HI = 0x100000    # implicit-one bit within the high word
_ABS_HI = 0x7FFFFFFF


def _u(x):
    return x.astype(U32)


# ---------------------------------------------------------------------------
# 64-bit integer helpers on (hi, lo) uint32 pairs
# ---------------------------------------------------------------------------


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = _u(lo < al)
    return ah + bh + carry, lo


def _sub64(ah, al, bh, bl):
    """(a - b) assuming a >= b."""
    lo = al - bl
    borrow = _u(al < bl)
    return ah - bh - borrow, lo


def _shl64(h, l, s):
    """(h:l) << s for scalar python int s in [0, 31]."""
    if s == 0:
        return h, l
    return (h << np.uint32(s)) | (l >> np.uint32(32 - s)), l << np.uint32(s)


def _shr64_sticky(h, l, s):
    """(h:l) >> s with sticky OR of every shifted-out bit; s is a uint32
    tensor, any value (>= 64 shifts everything into sticky)."""
    s = _u(jnp.minimum(s, 96))
    big = s >= 32
    huge = s >= 64
    s1 = _u(jnp.where(big, s - 32, s)) & np.uint32(31)
    inv = (np.uint32(32) - s1) & np.uint32(31)  # 0 when s1 == 0
    # small shift (s < 32)
    lo_sm = (l >> s1) | jnp.where(s1 == 0, np.uint32(0), h << inv)
    hi_sm = h >> s1
    st_sm = jnp.where(s1 == 0, np.uint32(0), l << inv)
    # big shift (32 <= s < 64): result = h >> (s - 32)
    lo_bg = h >> s1
    st_bg_l = l
    st_bg_h = jnp.where(s1 == 0, np.uint32(0), h << inv)
    hi_ = jnp.where(big, np.uint32(0), hi_sm)
    lo_ = jnp.where(big, lo_bg, lo_sm)
    sticky = jnp.where(big, (st_bg_l | st_bg_h) != 0, st_sm != 0)
    # huge shift (s >= 64): everything out
    hi_ = jnp.where(huge, np.uint32(0), hi_)
    lo_ = jnp.where(huge, np.uint32(0), lo_)
    sticky = jnp.where(huge, (h | l) != 0, sticky)
    return hi_, lo_, _u(sticky)


def _clz32(x):
    n = jnp.zeros_like(x)
    y = x
    for sh, step in ((16, 16), (24, 8), (28, 4), (30, 2)):
        c = (y >> np.uint32(sh)) == 0
        n = n + jnp.where(c, np.uint32(step), np.uint32(0))
        y = jnp.where(c, y << np.uint32(step), y)
    n = n + jnp.where((y >> np.uint32(31)) == 0, np.uint32(1), np.uint32(0))
    return jnp.where(x == 0, np.uint32(32), n)


def _clz64(h, l):
    return jnp.where(h != 0, _clz32(h), np.uint32(32) + _clz32(l))


def _shl64v(h, l, s):
    """(h:l) << s for a uint32 tensor s in [0, 63]."""
    s = _u(s)
    big = s >= 32
    s1 = _u(jnp.where(big, s - 32, s)) & np.uint32(31)
    inv = (np.uint32(32) - s1) & np.uint32(31)
    hi_sm = (h << s1) | jnp.where(s1 == 0, np.uint32(0), l >> inv)
    lo_sm = l << s1
    hi_ = jnp.where(big, l << s1, hi_sm)
    lo_ = jnp.where(big, np.uint32(0), lo_sm)
    return hi_, lo_


# ---------------------------------------------------------------------------
# pack / unpack / conversions
# ---------------------------------------------------------------------------


def from_f64_host(x):
    """numpy float64 array -> (hi, lo) uint32 numpy arrays."""
    b = np.asarray(x, dtype=np.float64).view(np.uint64)
    return (b >> 32).astype(np.uint32), (b & 0xFFFFFFFF).astype(np.uint32)


def to_f64_host(h, l):
    """(hi, lo) uint32 arrays -> numpy float64."""
    b = (np.asarray(h, dtype=np.uint64) << 32) | np.asarray(l, dtype=np.uint64)
    return b.view(np.float64)


def f64_from_f32(x):
    """Exact widening of float32 tensors to (hi, lo) double bit pairs.
    Handles +-0, subnormal f32, and +-inf (NaN maps to an inf-exponent
    pattern; NaNs never arise in the likelihood chain)."""
    b = jnp.asarray(x).view(jnp.uint32)
    s = b >> np.uint32(31)
    e = (b >> np.uint32(23)) & np.uint32(0xFF)
    m = b & np.uint32(0x7FFFFF)

    # normal: e' = e - 127 + 1023, mantissa << 29 into the 52-bit field
    eh_n = e + np.uint32(1023 - 127)
    # subnormal f32: normalize m (value = m * 2^-149)
    lz = _clz32(m)            # m < 2^23 -> lz >= 9
    sh = lz - np.uint32(8)    # left shift putting MSB at bit 23
    m_n = (m << (sh & np.uint32(31))) & np.uint32(0x7FFFFF)
    eh_s = np.uint32(1023 - 126) - sh  # biased double exponent

    is_zero = (e == 0) & (m == 0)
    is_sub = (e == 0) & (m != 0)
    is_inf = e == np.uint32(0xFF)

    eh = jnp.where(is_sub, eh_s, eh_n)
    mm = jnp.where(is_sub, m_n, m)
    eh = jnp.where(is_inf, np.uint32(0x7FF), eh)
    hi = (s << np.uint32(31)) | (eh << np.uint32(20)) | (mm >> np.uint32(3))
    lo = mm << np.uint32(29)
    hi = jnp.where(is_zero, s << np.uint32(31), hi)
    lo = jnp.where(is_zero | is_inf, np.uint32(0), lo)
    hi = jnp.where(is_inf, (s << np.uint32(31)) | np.uint32(0x7FF00000), hi)
    return hi, lo


def f64_from_f32_normal(x):
    """f64_from_f32 for values known to be normal-or-zero float32 (no
    subnormals, no inf/NaN) — the segmentation ll values qualify (|ll| is 0
    or >= ~5e-8). Saves the subnormal clz path on the hot cost build."""
    b = jnp.asarray(x).view(jnp.uint32)
    s = b & np.uint32(0x80000000)
    e = (b >> np.uint32(23)) & np.uint32(0xFF)
    m = b & np.uint32(0x7FFFFF)
    nz = e != 0
    hi = s | jnp.where(
        nz, ((e + np.uint32(1023 - 127)) << np.uint32(20))
        | (m >> np.uint32(3)), np.uint32(0))
    lo = jnp.where(nz, m << np.uint32(29), np.uint32(0))
    return hi, lo


def f64_sort_key(h, l):
    """Monotone (unsigned-lexicographic) key for double ordering: flips the
    pattern so kh:kl compares like the real number (-inf lowest)."""
    neg = (h >> np.uint32(31)) != 0
    kh = jnp.where(neg, ~h, h | np.uint32(0x80000000))
    kl = jnp.where(neg, ~l, l)
    return kh, kl


def f64_gt(ah, al, bh, bl):
    kah, kal = f64_sort_key(ah, al)
    kbh, kbl = f64_sort_key(bh, bl)
    return (kah > kbh) | ((kah == kbh) & (kal > kbl))


# ---------------------------------------------------------------------------
# IEEE round-to-nearest-even addition
# ---------------------------------------------------------------------------


def f64_add(ah, al, bh, bl):
    """IEEE-754 binary64 a + b, round-to-nearest-even. Finite operands
    (incl. subnormals and +-0); result may be +-0/subnormal/normal/+inf
    (overflow). Bit-exact vs hardware doubles (tests/test_softfloat.py
    checks millions of cases against numpy)."""
    ah, al, bh, bl = _u(ah), _u(al), _u(bh), _u(bl)
    # order by magnitude: IEEE magnitude order == unsigned bit order
    maga_h, magb_h = ah & np.uint32(_ABS_HI), bh & np.uint32(_ABS_HI)
    swap = (magb_h > maga_h) | ((magb_h == maga_h) & (bl > al))
    xh = jnp.where(swap, bh, ah)
    xl = jnp.where(swap, bl, al)
    yh = jnp.where(swap, ah, bh)
    yl = jnp.where(swap, al, bl)

    sx = xh >> np.uint32(31)
    sy = yh >> np.uint32(31)
    ex = (xh >> np.uint32(20)) & np.uint32(0x7FF)
    ey = (yh >> np.uint32(20)) & np.uint32(0x7FF)
    mxh = xh & np.uint32(_M20)
    myh = yh & np.uint32(_M20)
    # implicit bit for normals; effective exponent floor 1 for subnormals
    mxh = mxh | jnp.where(ex != 0, np.uint32(_BIT52_HI), np.uint32(0))
    myh = myh | jnp.where(ey != 0, np.uint32(_BIT52_HI), np.uint32(0))
    ex_eff = jnp.maximum(ex, np.uint32(1))
    ey_eff = jnp.maximum(ey, np.uint32(1))

    # pre-shift left 3 for guard/round/sticky bits -> 56-bit significands
    mxh, mxl = _shl64(mxh, xl, 3)
    myh, myl = _shl64(myh, yl, 3)

    d = ex_eff - ey_eff  # >= 0 by magnitude ordering
    myh, myl, st = _shr64_sticky(myh, myl, d)
    myl = myl | st  # sticky folds into bit0 (below R at bit1, G at bit2)

    sub = sx != sy
    sh_, sl_ = _sub64(mxh, mxl, myh, myl)
    th_, tl_ = _add64(mxh, mxl, myh, myl)
    rh = jnp.where(sub, sh_, th_)
    rl = jnp.where(sub, sl_, tl_)

    zero_res = (rh | rl) == 0
    # normalize so the leading 1 sits at bit 55; lz of a 56-bit value = 8
    lz = _clz64(rh, rl)
    shift = lz.astype(jnp.int32) - 8  # >0: left (cancellation), -1: carry
    ls = jnp.maximum(shift, 0)
    # left shift limited by exponent (can't go below e=1 -> subnormal)
    ls = jnp.minimum(ls, ex_eff.astype(jnp.int32) - 1)
    rs1 = _u(jnp.maximum(-shift, 0))  # 1 on carry-out
    rh, rl = _shl64v(rh, rl, _u(ls))
    rh2, rl2, st2 = _shr64_sticky(rh, rl, rs1)
    rh = jnp.where(rs1 > 0, rh2, rh)
    rl = jnp.where(rs1 > 0, rl2 | st2, rl)
    e_res = (ex_eff.astype(jnp.int32) - ls + rs1.astype(jnp.int32))

    # round to nearest even: keep bits [55..3]; G=bit2, RS=bits1..0
    g = (rl >> np.uint32(2)) & np.uint32(1)
    rs = rl & np.uint32(3)
    lsb = (rl >> np.uint32(3)) & np.uint32(1)
    inc = g & ((rs != 0) | (lsb != 0)).astype(U32)
    mh, ml = _shr64_sticky(rh, rl, jnp.full_like(rl, np.uint32(3)))[:2]
    mh, ml = _add64(mh, ml, jnp.zeros_like(mh), inc)
    # mantissa overflow on rounding (2^53): renormalize
    ovf = (mh >> np.uint32(21)) != 0
    mh2, ml2, _ = _shr64_sticky(mh, ml, jnp.where(ovf, np.uint32(1),
                                                  np.uint32(0)))
    mh = jnp.where(ovf, mh2, mh)
    ml = jnp.where(ovf, ml2, ml)
    e_res = e_res + ovf.astype(jnp.int32)

    # subnormal result: implicit bit absent -> exponent field 0
    is_norm = (mh >> np.uint32(20)) != 0
    e_field = _u(jnp.where(is_norm, e_res, 0))
    # overflow to inf
    inf = e_res >= 2047
    sign = jnp.where(zero_res, sx & sy, sx)

    hi = (sign << np.uint32(31)) | (e_field << np.uint32(20)) \
        | (mh & np.uint32(_M20))
    lo = ml
    hi = jnp.where(zero_res, sign << np.uint32(31), hi)
    lo = jnp.where(zero_res, np.uint32(0), lo)
    hi = jnp.where(inf, (sign << np.uint32(31)) | np.uint32(0x7FF00000), hi)
    lo = jnp.where(inf, np.uint32(0), lo)
    return hi, lo
