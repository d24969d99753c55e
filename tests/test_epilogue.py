"""Alpha/beta epilogue: jitted-vs-eager softfloat bit parity and the
power-of-two-alpha fold into the reconstruct exponent (VERDICT r4 item 6;
reference fuses 16 alpha/beta variants into inverse_scaling.hpp:269-820 —
here pow2 alpha folds into e_fix for free and the general case is ONE
traced softfloat graph)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gemmul8_tpu as g8
from gemmul8_tpu import api
from gemmul8_tpu.core import softfloat as sf
from gemmul8_tpu.types import F64Bits, bits_to_f64, f64_to_bits


def _rand(m, n, seed):
    r = np.random.default_rng(seed)
    return (r.random((m, n)) - 0.5) * np.exp(r.standard_normal((m, n)))


def _eager_epilogue_f64(raw: F64Bits, alpha, beta, c_np):
    """The pre-round-5 eager chain, kept as the parity reference."""
    out = sf.mul(raw, sf.const_f64(alpha, raw.hi.shape)) \
        if alpha != 1.0 else raw
    if beta != 0.0:
        cb = f64_to_bits(np.asarray(c_np, np.float64))
        out = sf.add(out, sf.mul(cb, sf.const_f64(beta, raw.hi.shape)))
    return out


@pytest.mark.parametrize("alpha,beta", [(1.7, 0.0), (1.0, -0.3),
                                        (-2.5, 0.37)])
def test_jitted_epilogue_bit_identical_f64(alpha, beta):
    a, b = _rand(24, 40, 1), _rand(40, 16, 2)
    c = _rand(24, 16, 3) if beta != 0.0 else None
    raw = np.asarray(g8.gemm(a, b, num_moduli=16))
    got = np.asarray(g8.gemm(a, b, alpha=alpha, beta=beta, c=c,
                             num_moduli=16))
    ref = bits_to_f64(_eager_epilogue_f64(f64_to_bits(raw), alpha, beta, c))
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_pow2_alpha_folds_exactly():
    """pow2 alpha with beta=0 rounds ONCE at the folded exponent; on
    normal-range data that equals the eager softfloat multiply bit for
    bit (scaling by an exact power of two commutes with rounding there)."""
    a, b = _rand(16, 64, 4), _rand(64, 24, 5)
    base = np.asarray(g8.gemm(a, b, num_moduli=16))
    for alpha in (0.25, 2.0, 1024.0, 2.0 ** -30):
        got = np.asarray(g8.gemm(a, b, alpha=alpha, num_moduli=16))
        np.testing.assert_array_equal(got, base * alpha)


def test_pow2_alpha_matches_general_path_f32():
    a = _rand(16, 64, 6).astype(np.float32)
    b = _rand(64, 24, 7).astype(np.float32)
    base = np.asarray(g8.gemm(a, b, num_moduli=8))
    got = np.asarray(g8.gemm(a, b, alpha=8.0, num_moduli=8))
    np.testing.assert_array_equal(got, base * np.float32(8.0))


def test_pow2_detection():
    assert api.pow2_exponent(1.0) == 0
    assert api.pow2_exponent(2.0) == 1
    assert api.pow2_exponent(0.25) == -2
    assert api.pow2_exponent(2.0 ** 511) == 511
    assert api.pow2_exponent(3.0) is None
    assert api.pow2_exponent(-2.0) is None
    assert api.pow2_exponent(0.0) is None
    assert api.pow2_exponent(float("inf")) is None
    assert api.pow2_exponent(2.0 ** -1030) is None  # outside fold budget
    assert api.pow2_exponent(1 + 2j) is None


def test_pow2_alpha_subnormal_single_rounding():
    """At the subnormal boundary the folded path is MORE accurate than
    scale-after-round: it rounds the exact product directly at the target
    exponent. Check against numpy's own single rounding of the exact
    (float128-free) product computed in python ints."""
    a = np.array([[3.0, 5.0]])
    b = np.array([[7.0], [11.0]])          # exact product 76
    alpha = 2.0 ** -1060                   # lands deep in subnormals
    got = np.asarray(g8.gemm(a, b, alpha=alpha, num_moduli=16))
    expect = np.float64(76.0) * np.float64(alpha)  # exact: 76*2^-1060
    np.testing.assert_array_equal(got, [[expect]])


@pytest.mark.parametrize("alpha,beta", [(2.0, 0.0), (1 + 2j, 0.0),
                                        (1.0, 0.5 - 1j)])
def test_jitted_epilogue_complex_c128(alpha, beta):
    r = np.random.default_rng(8)
    a = r.standard_normal((12, 20)) + 1j * r.standard_normal((12, 20))
    b = r.standard_normal((20, 10)) + 1j * r.standard_normal((20, 10))
    c = (r.standard_normal((12, 10)) + 1j * r.standard_normal((12, 10))) \
        if beta != 0 else None
    raw = np.asarray(g8.gemm(a, b, num_moduli=16))
    got = np.asarray(g8.gemm(a, b, alpha=alpha, beta=beta, c=c,
                             num_moduli=16))
    # eager reference via softfloat on the raw parts
    rre, rim = f64_to_bits(raw.real.copy()), f64_to_bits(raw.imag.copy())
    from gemmul8_tpu.core.complexgemm import _cscale
    if alpha != 1.0:
        if complex(alpha).imag == 0.0 and api.pow2_exponent(
                complex(alpha).real) is not None:
            # folded path: exact scaling
            rre = f64_to_bits(raw.real * complex(alpha).real)
            rim = f64_to_bits(raw.imag * complex(alpha).real)
        else:
            rre, rim = _cscale(rre, rim, alpha)
    if beta != 0:
        tre, tim = _cscale(f64_to_bits(c.real.copy()),
                           f64_to_bits(c.imag.copy()), beta)
        rre, rim = sf.add(rre, tre), sf.add(rim, tim)
    expect = np.asarray(bits_to_f64(rre)) + 1j * np.asarray(bits_to_f64(rim))
    np.testing.assert_array_equal(got, expect)


def test_jitted_epilogue_complex_c64():
    r = np.random.default_rng(9)
    a = (r.standard_normal((8, 16)) + 1j * r.standard_normal((8, 16))
         ).astype(np.complex64)
    b = (r.standard_normal((16, 8)) + 1j * r.standard_normal((16, 8))
         ).astype(np.complex64)
    c = (r.standard_normal((8, 8)) + 1j * r.standard_normal((8, 8))
         ).astype(np.complex64)
    alpha, beta = 1.5 - 0.5j, 0.25 + 2j
    raw = np.asarray(g8.gemm(a, b, num_moduli=8))
    got = np.asarray(g8.gemm(a, b, alpha=alpha, beta=beta, c=c,
                             num_moduli=8))
    ar_, ai_ = np.float32(alpha.real), np.float32(alpha.imag)
    br_, bi_ = np.float32(beta.real), np.float32(beta.imag)
    rre, rim = raw.real.astype(np.float32), raw.imag.astype(np.float32)
    ore = rre * ar_ - rim * ai_
    oim = rre * ai_ + rim * ar_
    cr, ci = c.real.astype(np.float32), c.imag.astype(np.float32)
    ore = ore + cr * br_ - ci * bi_
    oim = oim + cr * bi_ + ci * br_
    # f32 epilogue parity is to a few ulps, not bits: XLA may contract
    # mul+add into FMA inside the jitted graph (extra precision), which
    # numpy's separate ops don't. The f64 path is the bit-exact contract.
    np.testing.assert_allclose(got.real.astype(np.float32), ore, rtol=1e-6,
                               atol=1e-5)
    np.testing.assert_allclose(got.imag.astype(np.float32), oim, rtol=1e-6,
                               atol=1e-5)


def test_epilogue_dispatch_count_is_constant():
    """The f64 epilogue is ONE jitted callable (cached), i.e. O(1)
    dispatches per gemm call regardless of alpha/beta."""
    f1 = api._jit_epi_f64(1.7, 0.3)
    f2 = api._jit_epi_f64(1.7, 0.3)
    assert f1 is f2
    # and it is a jit-compiled function, not an eager chain
    assert hasattr(f1, "lower")


def test_pow2_alpha_with_n_panel_and_chunk():
    """The fold threads through the panel and moduli-chunk schedules."""
    a, b = _rand(16, 48, 10), _rand(48, 32, 11)
    base = np.asarray(g8.gemm(a, b, num_moduli=14))
    got_p = np.asarray(g8.gemm(a, b, alpha=0.5, num_moduli=14, n_panel=16))
    got_c = np.asarray(g8.gemm(a, b, alpha=0.5, num_moduli=14,
                               moduli_chunk=5))
    np.testing.assert_array_equal(got_p, base * 0.5)
    np.testing.assert_array_equal(got_c, base * 0.5)
