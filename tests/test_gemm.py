"""End-to-end emulated GEMM: exactness at high moduli counts, accuracy-vs-
num_moduli curves (the primary correctness target, BASELINE.md §3), fast vs
accurate mode, and mixed-precision combinations."""

import numpy as np
import pytest

import jax

import gemmul8_tpu as g8
from gemmul8_tpu.bench.evalref import dd_gemm_f64
from gemmul8_tpu.bench.matrices import exact_gemm_f64, phi_matrix, relerr_stats


def _gemm(a, b, **kw):
    out = g8.gemm(a, b, **kw)
    return np.asarray(out)


def test_dgemm_exact_at_20_moduli():
    """With 20 moduli and small k, every slice retains the full 53-bit
    significand, so the emulated product must be the exactly-rounded true
    product — bit-identical to big-int ground truth."""
    a = phi_matrix(8, 16, 1.0, seed=1)
    b = phi_matrix(16, 6, 1.0, seed=2)
    got = _gemm(a, b, num_moduli=20, fastmode=True)
    expect = exact_gemm_f64(a, b)
    np.testing.assert_array_equal(got, expect)


def test_dgemm_exact_at_20_moduli_accurate():
    a = phi_matrix(8, 16, 2.0, seed=3)
    b = phi_matrix(16, 6, 2.0, seed=4)
    got = _gemm(a, b, num_moduli=20, fastmode=False)
    expect = exact_gemm_f64(a, b)
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("fastmode", [True, False])
def test_dgemm_accuracy_curve(fastmode):
    """Accuracy must fall monotonically with num_moduli and reach
    f64-grade by 14-15 moduli (BASELINE.md §3 shape, scaled to k=512)."""
    a = phi_matrix(32, 512, 0.5, seed=10)
    b = phi_matrix(512, 32, 0.5, seed=11)
    ref = dd_gemm_f64(a, b)
    errs = {}
    for L in [8, 10, 12, 14, 16]:
        c = _gemm(a, b, num_moduli=L, fastmode=fastmode)
        errs[L] = relerr_stats(c, ref)[0]
    # monotone decreasing (with floor at ~1e-16)
    for l1, l2 in zip([8, 10, 12, 14], [10, 12, 14, 16]):
        assert errs[l2] <= errs[l1] * 1.5 + 1e-15, errs
    assert errs[14] < 5e-7 if fastmode else errs[14] < 5e-8, errs
    assert errs[16] < 5e-10, errs


def test_accurate_mode_tightens():
    a = phi_matrix(32, 512, 0.5, seed=20)
    b = phi_matrix(512, 32, 0.5, seed=21)
    ref = dd_gemm_f64(a, b)
    e_fast = relerr_stats(_gemm(a, b, num_moduli=12, fastmode=True), ref)[0]
    e_accu = relerr_stats(_gemm(a, b, num_moduli=12, fastmode=False), ref)[0]
    assert e_accu < e_fast, (e_fast, e_accu)


@pytest.mark.parametrize("fastmode", [True, False])
def test_sgemm_accuracy(fastmode):
    """FP32-out emulation: ~1e-7-grade by 8 moduli (BASELINE.md §2/§3)."""
    a = phi_matrix(32, 512, 0.5, seed=30).astype(np.float32)
    b = phi_matrix(512, 32, 0.5, seed=31).astype(np.float32)
    ref = dd_gemm_f64(a.astype(np.float64), b.astype(np.float64))
    c = _gemm(a, b, num_moduli=8, fastmode=fastmode)
    assert c.dtype == np.float32
    mx, med = relerr_stats(c, ref)
    assert med < 2e-7, (mx, med)
    c6 = _gemm(a, b, num_moduli=6, fastmode=fastmode)
    mx6, med6 = relerr_stats(c6, ref)
    assert med6 < 5e-4, (mx6, med6)


def test_mixed_precision_combos():
    """FP64 x FP32 -> FP64/FP32 and FP32 x FP32 -> FP64 (reference
    README-documented combos; gemm_mixed at gemmul8.cu:433-577)."""
    a64 = phi_matrix(24, 256, 0.5, seed=40)
    b32 = phi_matrix(256, 24, 0.5, seed=41).astype(np.float32)
    ref = dd_gemm_f64(a64, b32.astype(np.float64))
    c_dd = _gemm(a64, b32, num_moduli=12, out_dtype=np.float64)
    assert c_dd.dtype == np.float64
    assert relerr_stats(c_dd, ref)[0] < 1e-5
    c_df = _gemm(a64, b32, num_moduli=12, out_dtype=np.float32)
    assert c_df.dtype == np.float32
    assert relerr_stats(c_df, ref)[0] < 1e-5
    a32 = b32.T.copy()
    ref2 = dd_gemm_f64(a32.astype(np.float64), b32.astype(np.float64))
    c_ffd = _gemm(a32, b32, num_moduli=10, out_dtype=np.float64)
    assert c_ffd.dtype == np.float64
    assert relerr_stats(c_ffd, ref2)[0] < 1e-7


def test_alpha_beta_f32():
    a = phi_matrix(16, 64, 0.5, seed=50).astype(np.float32)
    b = phi_matrix(64, 16, 0.5, seed=51).astype(np.float32)
    c0 = phi_matrix(16, 16, 0.5, seed=52).astype(np.float32)
    out = _gemm(a, b, alpha=2.5, beta=-1.5, c=c0, num_moduli=10)
    ref = 2.5 * (a.astype(np.float64) @ b.astype(np.float64)) - 1.5 * c0
    assert relerr_stats(out, ref)[0] < 1e-5


def test_k_bound_enforced():
    a = np.zeros((2, 2 ** 17 + 128), np.float32)
    b = np.zeros((2 ** 17 + 128, 2), np.float32)
    with pytest.raises(ValueError, match="2\\^17"):
        g8.gemm(a, b, num_moduli=4)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_random_configs(seed):
    """Property sweep: random shapes / phi / moduli / modes / dtypes must
    stay within the accuracy the moduli count implies (vs the dd oracle)."""
    from gemmul8_tpu.bench.native import dd_gemm, relerr_vs_dd

    rng = np.random.default_rng(1000 + seed)
    m = int(rng.integers(3, 70))
    k = int(rng.integers(3, 300))
    n = int(rng.integers(3, 70))
    phi = float(rng.uniform(0, 3))
    L = int(rng.integers(10, 21))
    fast = bool(rng.integers(0, 2))
    f32in = bool(rng.integers(0, 2))
    a = phi_matrix(m, k, phi, seed=2000 + seed)
    b = phi_matrix(k, n, phi, seed=3000 + seed)
    if f32in:
        a = a.astype(np.float32)
        b = b.astype(np.float32)
        if L > 19:
            L = 19
    c = np.asarray(_gemm(a, b, num_moduli=L, fastmode=fast,
                         out_dtype=np.float64))
    hi, lo = dd_gemm(np.asarray(a, np.float64), np.asarray(b, np.float64))
    mx, med = relerr_vs_dd(c, hi, lo)
    # 14+ moduli: better than 1e-6 median even at phi=3 difficulty;
    # 10-13: grows with fewer moduli — generous band, catches blowups
    band = 1e-6 if L >= 14 else 1e-2
    assert med < band, (m, k, n, phi, L, fast, f32in, mx, med)
