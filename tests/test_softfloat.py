"""Software IEEE-754 double emulation (ops/softfloat.py): bit-exact vs
numpy float64 across random, adversarial, and edge-case operand sets."""

import numpy as np
import pytest

from wgbs_tools_tpu.ops.softfloat import (f64_add, f64_from_f32, f64_gt,
                                          from_f64_host, to_f64_host)


def _add_check(a, b):
    ah, al = from_f64_host(a)
    bh, bl = from_f64_host(b)
    rh, rl = f64_add(ah, al, bh, bl)
    got = to_f64_host(np.asarray(rh), np.asarray(rl))
    want = a + b
    eq = got.view(np.uint64) == want.view(np.uint64)
    # -0 + +0 etc: numpy follows IEEE too, so bit equality is the bar
    if not eq.all():
        i = int(np.flatnonzero(~eq)[0])
        raise AssertionError(
            f"a={a[i]!r} ({a[i].hex()}) b={b[i]!r} ({b[i].hex()}) "
            f"got={got[i]!r} ({got[i].hex()}) want={want[i]!r} "
            f"({want[i].hex()})")


def test_add_random_uniform_exponents():
    rng = np.random.default_rng(11)
    n = 200_000
    a = ((rng.random(n) * 2 - 1) *
         np.exp2(rng.integers(-60, 60, n).astype(np.float64)))
    b = ((rng.random(n) * 2 - 1) *
         np.exp2(rng.integers(-60, 60, n).astype(np.float64)))
    _add_check(a, b)


def test_add_near_cancellation():
    rng = np.random.default_rng(12)
    n = 100_000
    a = (rng.random(n) * 2 - 1) * np.exp2(rng.integers(-20, 20, n))
    # b ~ -a with a few-ulp perturbation: exercises massive cancellation
    ulp = np.spacing(np.abs(a))
    b = -(a + ulp * rng.integers(-8, 9, n))
    _add_check(a, b)


def test_add_rounding_boundaries():
    rng = np.random.default_rng(13)
    n = 100_000
    # mantissas dense near all-ones / all-zeros, exponent gaps around 52-55
    bits_a = ((np.uint64(1023 + 0) << np.uint64(52))
              | rng.choice(np.array([0, 1, 2, (1 << 52) - 1, (1 << 52) - 2],
                                    dtype=np.uint64), n))
    ea = rng.integers(-3, 4, n).astype(np.int64)
    a = bits_a.view(np.float64) * np.exp2(ea.astype(np.float64))
    d = rng.integers(50, 57, n)  # half-ulp territory
    m = rng.choice(np.array([0, 1, 3, (1 << 52) - 1], dtype=np.uint64), n)
    bits_b = (np.uint64(1023) << np.uint64(52)) | m
    b = bits_b.view(np.float64) * np.exp2(-(d.astype(np.float64)))
    sb = rng.integers(0, 2, n) * 2 - 1
    _add_check(a, b * sb)


def test_add_zeros_and_tiny():
    z = np.array([0.0, -0.0, 0.0, -0.0, 1.5, -1.5, 5e-324, -5e-324,
                  2.2250738585072014e-308])
    for a in z:
        aa = np.full(z.shape[0], a)
        _add_check(aa, z.copy())


def test_add_exact_integer_sums():
    rng = np.random.default_rng(14)
    a = rng.integers(-1 << 40, 1 << 40, 50_000).astype(np.float64)
    b = rng.integers(-1 << 40, 1 << 40, 50_000).astype(np.float64)
    _add_check(a, b)


def test_add_f32_values_like_ll_chain():
    """The actual workload: sums of float32-representable likelihoods."""
    rng = np.random.default_rng(15)
    n = 100_000
    a32 = (rng.random(n, dtype=np.float32) *
           np.exp2(rng.integers(-20, 17, n)).astype(np.float32))
    b32 = -(rng.random(n, dtype=np.float32) *
            np.exp2(rng.integers(-20, 17, n)).astype(np.float32))
    # partial sums in double of f32 values (what the DP accumulates)
    a = a32.astype(np.float64) * 1.0000000001
    a = (a32.astype(np.float64) + b32.astype(np.float64))
    b = rng.permutation(a)
    _add_check(a, b)


def test_from_f32_exact():
    rng = np.random.default_rng(16)
    vals = np.concatenate([
        (rng.random(50_000, dtype=np.float32) - 0.5) *
        np.exp2(rng.integers(-40, 40, 50_000)).astype(np.float32),
        np.array([0.0, -0.0, np.inf, -np.inf, 1e-40, -1e-40,
                  np.float32(1.4e-45)], dtype=np.float32),
    ])
    h, l = f64_from_f32(vals)
    got = to_f64_host(np.asarray(h), np.asarray(l))
    want = vals.astype(np.float64)
    assert np.array_equal(got.view(np.uint64), want.view(np.uint64))


def test_gt_ordering():
    rng = np.random.default_rng(17)
    n = 100_000
    a = np.concatenate([
        (rng.random(n) - 0.5) * np.exp2(rng.integers(-300, 300, n)),
        np.array([np.inf, -np.inf, 0.0, -0.0]),
    ])
    b = rng.permutation(a)
    ah, al = from_f64_host(a)
    bh, bl = from_f64_host(b)
    got = np.asarray(f64_gt(ah, al, bh, bl))
    assert np.array_equal(got, a > b)


def test_sequential_accumulation_matches_double_chain():
    """End-to-end shape of the DP arithmetic: s += float64(f32) repeatedly,
    every intermediate double reproduced bit-exactly."""
    import jax

    rng = np.random.default_rng(18)
    v = (rng.random(4096, dtype=np.float32) - 0.5) * \
        np.exp2(rng.integers(-10, 14, 4096)).astype(np.float32)

    def emu(v):
        h, l = f64_from_f32(v)

        def step(carry, x):
            sh, sl = carry
            nh, nl = f64_add(sh, sl, x[0], x[1])
            return (nh, nl), (nh, nl)

        import jax.numpy as jnp

        z = jnp.zeros((), jnp.uint32)
        (_, _), (hs, ls) = jax.lax.scan(step, (z, z), (h, l))
        return hs, ls

    hs, ls = jax.jit(emu)(v)
    got = to_f64_host(np.asarray(hs), np.asarray(ls))
    s = np.float64(0.0)
    want = np.empty(v.shape[0])
    for i, x in enumerate(v):
        s = s + np.float64(x)
        want[i] = s
    assert np.array_equal(got.view(np.uint64), want.view(np.uint64))


def test_add_exhaustive_corner_cross_product():
    """Cross product of ~1.4k adversarial bit patterns (sign x exponent
    corners x mantissa corners, zeros, subnormals) — every pair's sum must
    be bit-identical to numpy float64."""
    exps = np.array([0, 1, 2, 510, 511, 512, 513, 970, 1020, 1021, 1022,
                     1023, 1024, 1025, 1026, 1074, 1075, 1076, 1535, 2040,
                     2044, 2045], dtype=np.uint64)
    mants = np.array([0, 1, 2, 3, (1 << 51), (1 << 51) + 1, (1 << 52) - 2,
                      (1 << 52) - 1, 0x5555555555555, 0xAAAAAAAAAAAAA,
                      (1 << 29) - 1, (1 << 29), (1 << 29) + 1],
                     dtype=np.uint64)
    vals = []
    for s in (0, 1):
        for e in exps:
            for m in mants:
                vals.append((np.uint64(s) << np.uint64(63))
                            | (e << np.uint64(52)) | m)
    # subnormals and zeros
    for s in (0, 1):
        for m in (0, 1, 2, (1 << 52) - 1, 1 << 51):
            vals.append((np.uint64(s) << np.uint64(63)) | np.uint64(m))
    vals = np.array(vals, dtype=np.uint64).view(np.float64)
    vals = vals[np.isfinite(vals)]
    n = vals.shape[0]
    a = np.repeat(vals, n)
    b = np.tile(vals, n)
    _add_check(a, b)
