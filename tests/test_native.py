"""Native C++ dd-GEMM oracle (native/ddgemm.cpp) vs the numpy dd reference.

The hi word must agree bit-exactly (both are error-free transforms of the
same sum); lo differs only at the ~1e-26 level from accumulation-order
effects, far below every tolerance the oracle is used at.
"""

import numpy as np
import pytest

from gemmul8_tpu.bench import evalref, native


pytestmark = pytest.mark.skipif(not native.have_native(),
                                reason="native library not built")


def test_native_matches_numpy_dd():
    rng = np.random.default_rng(42)
    a = (rng.random((64, 96)) - 0.5) * np.exp(rng.standard_normal((64, 96)) * 3)
    b = (rng.random((96, 48)) - 0.5) * np.exp(rng.standard_normal((96, 48)) * 3)
    hi_n, lo_n = native.dd_gemm(a, b)
    hi_p, lo_p = evalref.dd_gemm(a, b)
    assert np.array_equal(hi_n, hi_p)
    denom = np.maximum(np.abs(hi_p), 1e-300)
    assert np.max(np.abs(lo_n - lo_p) / denom) < 1e-24


def test_native_relerr_metrics():
    rng = np.random.default_rng(7)
    a = rng.random((32, 32)) - 0.5
    b = rng.random((32, 32)) - 0.5
    hi, lo = native.dd_gemm(a, b)
    mx, med = native.relerr_vs_dd(a @ b, hi, lo)
    # near-cancelled sums make max relerr unbounded; median is the robust one
    assert 0 <= med < 1e-14 and med <= mx
    mx2, _ = native.relerr_vs_dd(hi, hi, lo)
    assert mx2 < 1.2e-16  # hi alone vs dd: only the sub-ulp lo word remains
