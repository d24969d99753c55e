"""Encode correctness: residues must equal the exact mathematical
trunc(x * 2^sft) mod m_j for the sft the encoder selected, and the selected
shifts must satisfy the CRT range guarantee."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gemmul8_tpu import tables
from gemmul8_tpu.core import encode as enc
from gemmul8_tpu.types import f64_to_bits
from gemmul8_tpu.bench.matrices import phi_matrix


def exact_residue(x: float, sft: int, m: int) -> int:
    """Centered residue of trunc(x * 2^sft) mod m via exact int math."""
    fr = math.frexp(x)
    mant, e = int(math.ldexp(fr[0], 53)), fr[1] - 53
    # x = mant * 2^e exactly
    shift = e + sft
    if shift >= 0:
        t = mant << shift
    else:
        t = (abs(mant) >> -shift) * (1 if mant >= 0 else -1)
        if mant < 0:
            t = -((-mant) >> -shift)
        else:
            t = mant >> -shift
    r = t % m
    if r >= (m + 1) // 2:
        r -= m
    return r


@pytest.mark.parametrize("dtype,L", [("f64", 6), ("f64", 14), ("f64", 20),
                                     ("f32", 6), ("f32", 15)])
def test_fast_encode_matches_exact(dtype, L):
    rng = np.random.default_rng(42)
    m, k = 5, 37
    x = phi_matrix(m, k, 2.0, seed=7)
    x[0, 0] = 0.0
    if dtype == "f32":
        x[1, :] = x[1, :] * 1e-30
        x[2, :] = x[2, :] * 1e30
        x = x.astype(np.float32).astype(np.float64)
        slices, sft = jax.jit(enc.encode_fast_f32, static_argnums=(1, 2))(
            jnp.asarray(x, jnp.float32), L, 1)
    else:
        x[1, :] = x[1, :] * 1e-200  # tiny row
        x[2, :] = x[2, :] * 1e200   # huge row
        slices, sft = jax.jit(enc.encode_fast_f64, static_argnums=(1, 2))(
            f64_to_bits(x), L, 1)
    slices = np.asarray(slices)
    sft = np.asarray(sft)
    for i in range(m):
        for t in range(k):
            for j in range(L):
                expect = exact_residue(float(x[i, t]), int(sft[i, 0]),
                                       tables.MODULI[j])
                got = int(slices[j, i, t])
                mj = tables.MODULI[j]
                assert (got - expect) % mj == 0, (i, t, j, got, expect)
                assert -128 <= got <= 127


@pytest.mark.parametrize("L", [2, 8, 14])
def test_fast_shift_range_guarantee(L):
    """||trunc(a 2^sftA)|| * ||trunc(b 2^sftB)|| <= (M-1)/2 must hold."""
    mm = tables.big_m(L)
    for seed, phi in [(0, 0.0), (1, 0.5), (2, 4.0)]:
        a = phi_matrix(8, 64, phi, seed=seed)
        b = phi_matrix(64, 8, phi, seed=seed + 100)
        sa = np.asarray(enc.encode_fast_f64(f64_to_bits(a), L, axis=1)[1])
        sb = np.asarray(enc.encode_fast_f64(f64_to_bits(b.T), L, axis=1)[1])
        ta = np.trunc(a * np.exp2(sa))            # rows scaled
        tb = np.trunc(b * np.exp2(sb.T))          # cols scaled
        prod_bound = np.linalg.norm(ta, axis=1)[:, None] * \
            np.linalg.norm(tb, axis=0)[None, :]
        assert np.all(prod_bound <= (mm - 1) / 2 + 1e-6)


def test_columnwise_encode_axis0():
    x = phi_matrix(16, 4, 1.0, seed=3)
    s1, sft1 = enc.encode_fast_f64(f64_to_bits(x), 8, axis=0)
    s2, sft2 = enc.encode_fast_f64(f64_to_bits(x.T.copy()), 8, axis=1)
    np.testing.assert_array_equal(np.asarray(s1),
                                  np.asarray(s2).transpose(0, 2, 1))
    np.testing.assert_array_equal(np.asarray(sft1).ravel(),
                                  np.asarray(sft2).ravel())


def test_mag7_roundup_bound():
    """mag7 must upper-bound |x| * 2^(5-ilogb(amax)) and fit in [0, 64]."""
    x = phi_matrix(6, 40, 3.0, seed=11)
    mag, emax = enc.mag7_f64(f64_to_bits(x), axis=1)
    mag = np.asarray(mag).astype(np.int32)
    emax = np.asarray(emax)
    for i in range(6):
        e = int(emax[i, 0]) - 1023
        scaled = np.abs(x[i]) * np.exp2(5 - e)
        assert np.all(mag[i] >= scaled - 1e-9)
        assert np.all(mag[i] <= np.ceil(scaled) + 1e-9)
        assert np.all(mag[i] <= 64)


def test_subnormal_inputs_exact():
    """Subnormal inputs (and subnormal outputs) round correctly: bit-exact
    vs the exact rational product rounded once to f64."""
    from fractions import Fraction

    import gemmul8_tpu as g8

    rng = np.random.default_rng(0)
    a = (rng.random((12, 24)) - 0.5) * 1e-160
    b = (rng.random((24, 10)) - 0.5) * 1e-160
    a[0, :] = rng.random(24) * 4.9e-324 * rng.integers(
        1, 1 << 40, 24).astype(float)
    m, k = a.shape
    n = b.shape[1]
    ref = np.zeros((m, n))
    af = [[Fraction(x) for x in row] for row in a]
    bf = [[Fraction(x) for x in row] for row in b]
    for i in range(m):
        for j in range(n):
            ref[i, j] = float(sum(af[i][t] * bf[t][j] for t in range(k)))
    for L in (16, 20):
        c = np.asarray(g8.gemm(a, b, num_moduli=L))
        assert np.array_equal(c.view(np.uint64), ref.view(np.uint64))


@pytest.mark.parametrize("L", [17, 19])
def test_f32_high_moduli_wide_shift(L):
    """f32 at 17-19 moduli exercises the widest left-shift path
    (q_max = T-1-23 up to 50, three value words). The emulated product of
    f32 inputs is exact at these moduli counts: compare bit-exactly vs
    the f64 product of the exact f32 values (k small enough that the
    true product fits 53 bits of headroom)."""
    import gemmul8_tpu as g8

    rng = np.random.default_rng(L)
    a = ((rng.random((24, 48)) - 0.5) *
         np.exp(rng.standard_normal((24, 48)) * 2)).astype(np.float32)
    b = ((rng.random((48, 16)) - 0.5) *
         np.exp(rng.standard_normal((48, 16)) * 2)).astype(np.float32)
    c = np.asarray(g8.gemm(a, b, num_moduli=L, out_dtype=np.float64))
    from gemmul8_tpu.bench.native import dd_gemm, relerr_vs_dd

    hi, lo = dd_gemm(a.astype(np.float64), b.astype(np.float64))
    mx, med = relerr_vs_dd(c, hi, lo)
    assert med < 1e-14, (L, mx, med)
