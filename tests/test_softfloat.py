"""Softfloat f64 add/mul must match native IEEE-754 bit-for-bit."""

import numpy as np
import pytest

import jax

from gemmul8_tpu.core import softfloat as sf
from gemmul8_tpu.types import bits_to_f64, f64_to_bits


def _cases(seed, n=4096):
    rng = np.random.default_rng(seed)
    a = (rng.random(n) - 0.5) * np.exp(rng.standard_normal(n) * 40)
    b = (rng.random(n) - 0.5) * np.exp(rng.standard_normal(n) * 40)
    # adversarial: close cancellation, subnormals, huge, tiny, zeros
    extra_a = np.array([1.0, 1.0, 1e308, 5e-324, 0.0, -0.0, 1e-310,
                        1.5, 2.0 ** 52 + 1, -3.0, 1e200])
    extra_b = np.array([-1.0, -(1.0 + 2.0 ** -52), 1e308, 5e-324, 0.0, -0.0,
                        -1e-310, -1.5, 1.0, 3.0, 1e200])
    return (np.concatenate([a, extra_a]), np.concatenate([b, extra_b]))


@pytest.mark.parametrize("op", ["add", "mul", "sub"])
def test_softfloat_bitexact(op):
    a, b = _cases(seed=hash(op) % 1000)
    fn = getattr(sf, op)
    got = bits_to_f64(jax.jit(fn)(f64_to_bits(a), f64_to_bits(b)),
                      to_numpy=True)
    expect = {"add": a + b, "mul": a * b, "sub": a - b}[op]
    ga = got.view(np.uint64)
    ea = expect.view(np.uint64)
    bad = np.nonzero(ga != ea)[0]
    assert len(bad) == 0, (bad[:5], a[bad[:3]], b[bad[:3]],
                           got[bad[:3]], expect[bad[:3]])


def test_softfloat_specials():
    a = np.array([np.inf, -np.inf, np.inf, 1.0, np.nan])
    b = np.array([1.0, np.inf, -np.inf, np.nan, np.nan])
    got_add = bits_to_f64(sf.add(f64_to_bits(a), f64_to_bits(b)),
                          to_numpy=True)
    expect_add = a + b
    for g, e in zip(got_add, expect_add):
        assert (np.isnan(g) and np.isnan(e)) or g == e, (g, e)
    got_mul = bits_to_f64(sf.mul(f64_to_bits(a), f64_to_bits(b)),
                          to_numpy=True)
    expect_mul = a * b
    for g, e in zip(got_mul, expect_mul):
        assert (np.isnan(g) and np.isnan(e)) or g == e, (g, e)
    # 0 * inf = nan
    z = bits_to_f64(sf.mul(f64_to_bits(np.array([0.0])),
                           f64_to_bits(np.array([np.inf]))), to_numpy=True)
    assert np.isnan(z[0])
