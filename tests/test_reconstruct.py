"""CRT reconstruction: random centered integers X in (-M/2, M/2) with random
scale exponents must come back exactly rounded to the target dtype."""

import random
from fractions import Fraction

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _jit_rec(L, kind):
    from gemmul8_tpu.core import reconstruct as _r
    return jax.jit(lambda r, sa, sb: _r.reconstruct(r, sa, sb, L, kind))

from gemmul8_tpu import tables
from gemmul8_tpu.core import reconstruct as rec
from gemmul8_tpu.types import bits_to_f64


def _cases(L, n_cases, seed, max_scale):
    rng = random.Random(seed)
    mm = tables.big_m(L)
    xs, es = [], []
    for _ in range(n_cases):
        choice = rng.random()
        if choice < 0.15:
            x = rng.choice([0, 1, -1, mm // 2 - 1, -(mm // 2) + 1])
        elif choice < 0.3:
            lim = min(65536, mm // 2 - 1)
            x = rng.randrange(-lim, lim)  # small values
        else:
            x = rng.randrange(-(mm // 2) + 1, mm // 2)
        xs.append(x)
        es.append(rng.randrange(-max_scale, max_scale))
    return xs, es


@pytest.mark.parametrize("L", [2, 6, 8, 14, 20])
def test_reconstruct_f64_exact_rounding(L):
    xs, es = _cases(L, 64, seed=L, max_scale=200)
    n = len(xs)
    r = np.zeros((L, 1, n), np.int32)
    for i, x in enumerate(xs):
        for j in range(L):
            r[j, 0, i] = x % tables.MODULI[j]
    sft_a = np.zeros((1, 1), np.int32)
    sft_b = -np.asarray(es, np.int32).reshape(1, n)
    out = _jit_rec(L, "f64")(jnp.asarray(r), jnp.asarray(sft_a),
                             jnp.asarray(sft_b))
    got = bits_to_f64(out, to_numpy=True).ravel()
    for i, (x, e) in enumerate(zip(xs, es)):
        expect = float(Fraction(x) * Fraction(2) ** e)
        assert got[i] == expect or (np.isnan(got[i]) and np.isnan(expect)), \
            (i, x, e, got[i], expect)


@pytest.mark.parametrize("L", [6, 15])
def test_reconstruct_f32_exact_rounding(L):
    xs, es = _cases(L, 64, seed=100 + L, max_scale=120)
    n = len(xs)
    r = np.zeros((L, 1, n), np.int32)
    for i, x in enumerate(xs):
        for j in range(L):
            r[j, 0, i] = x % tables.MODULI[j]
    sft_a = np.zeros((1, 1), np.int32)
    sft_b = -np.asarray(es, np.int32).reshape(1, n)
    out = np.asarray(_jit_rec(L, "f32")(jnp.asarray(r), jnp.asarray(sft_a),
                                        jnp.asarray(sft_b))).ravel()
    for i, (x, e) in enumerate(zip(xs, es)):
        expect = np.float32(float(Fraction(x) * Fraction(2) ** e))
        assert out[i] == expect, (i, x, e, out[i], expect)


def test_reconstruct_rounding_tie_boundaries():
    """Halfway / sticky boundary vectors for the pre-shifted rounding
    funnel: exact ties (round-to-even both directions), ties broken by a
    far-away sticky bit, and exact powers straddling the mantissa width.
    Exact-Fraction comparison, both output dtypes."""
    L = 14
    vals64 = [
        (2 ** 53 + 1, 0),            # tie -> even (down)
        (2 ** 53 + 3, 0),            # tie -> even (up)
        ((2 ** 54 + 2) * 3, -1),     # tie at a deeper shift
        (2 ** 54 + 2 + 1, 0),        # tie + sticky one bit below -> up
        ((2 ** 53 + 1) * 2 ** 40 + 1, -40),  # sticky 40 bits below rbit
        (2 ** 53, 7), (2 ** 53 - 1, -9),     # exact, no rounding
        ((2 ** 53 + 1) * 2 ** 50, -1100),    # tie in the subnormal range
        (-(2 ** 53 + 1), 13),        # negative tie
    ]
    n = len(vals64)
    r = np.zeros((L, 1, n), np.int32)
    es = np.zeros(n, np.int32)
    for i, (x, e) in enumerate(vals64):
        es[i] = e
        for j in range(L):
            r[j, 0, i] = x % tables.MODULI[j]
    out = _jit_rec(L, "f64")(jnp.asarray(r), jnp.zeros((1, 1), jnp.int32),
                             jnp.asarray(-es.reshape(1, n)))
    got = bits_to_f64(out, to_numpy=True).ravel()
    for i, (x, e) in enumerate(vals64):
        expect = float(Fraction(x) * Fraction(2) ** e)
        assert got[i] == expect, (i, x, e, got[i].hex(), expect.hex())

    def f32_rne(frac):
        # correctly-rounded Fraction -> float32 (np.float32(float(frac))
        # double-rounds through f64 and misrounds e.g. 2^24 + 1 + 2^-30)
        if frac == 0:
            return np.float32(0.0)
        sign, f = (-1, -frac) if frac < 0 else (1, frac)
        e = 0
        while f >= 2:
            f /= 2
            e += 1
        while f < 1:
            f *= 2
            e -= 1
        e = max(e, -126)                      # subnormal: fixed scale
        m = (frac if sign > 0 else -frac) / Fraction(2) ** (e - 23)
        n0, rem = divmod(m.numerator, m.denominator)
        half = Fraction(rem, m.denominator) - Fraction(1, 2)
        if half > 0 or (half == 0 and n0 % 2 == 1):
            n0 += 1
        # n0 * 2^(e-23) is exactly representable (it IS the rounded f32);
        # the f64 product below is exact, so one final cast is safe
        return np.float32(sign * n0 * 2.0 ** (e - 23))

    vals32 = [(2 ** 24 + 1, 0), (2 ** 24 + 3, 0), (2 ** 25 + 2 + 1, 0),
              ((2 ** 24 + 1) * 2 ** 30 + 1, -30), (2 ** 24, -3),
              (-(2 ** 24 + 1), 5), ((2 ** 24 + 1), -160)]
    n = len(vals32)
    r = np.zeros((L, 1, n), np.int32)
    es = np.zeros(n, np.int32)
    for i, (x, e) in enumerate(vals32):
        es[i] = e
        for j in range(L):
            r[j, 0, i] = x % tables.MODULI[j]
    out = np.asarray(
        _jit_rec(L, "f32")(jnp.asarray(r), jnp.zeros((1, 1), jnp.int32),
                           jnp.asarray(-es.reshape(1, n)))).ravel()
    for i, (x, e) in enumerate(vals32):
        expect = f32_rne(Fraction(x) * Fraction(2) ** e)
        assert out[i] == expect, (i, x, e, out[i], expect)


def test_reconstruct_f64_subnormal_and_overflow():
    L = 8
    mm = tables.big_m(L)
    vals = [(3, -1080), (12345, -1100), (1, -1074), (1, -1075),
            (mm // 2 - 1, 1200), (7, 1020), (-5, -1076)]
    n = len(vals)
    r = np.zeros((L, 1, n), np.int32)
    es = np.zeros(n, np.int32)
    for i, (x, e) in enumerate(vals):
        es[i] = e
        for j in range(L):
            r[j, 0, i] = x % tables.MODULI[j]
    out = _jit_rec(L, "f64")(jnp.asarray(r), jnp.zeros((1, 1), jnp.int32),
                             jnp.asarray(-es.reshape(1, n)))
    got = bits_to_f64(out, to_numpy=True).ravel()
    for i, (x, e) in enumerate(vals):
        expect = float(Fraction(x) * Fraction(2) ** e) if abs(
            Fraction(x) * Fraction(2) ** e) < Fraction(2) ** 1024 else \
            float("inf") * (1 if x > 0 else -1)
        assert got[i] == expect, (i, x, e, got[i], expect)
