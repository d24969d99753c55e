"""Opt-in reference-scale accuracy band assertions.

The reference's accuracy protocol is m=n=1024, k up to 8192, phi 0.5
(GEMMul8/testing/test_double.cu:19-23); its committed GH200 curve at
k=8192 (BASELINE.md §3) is the primary correctness target. These tests
assert our curves sit AT OR INSIDE those bands at the reference scale.

Slow (~minutes): run with GEMMUL8_SCALE_TESTS=1, e.g.
    GEMMUL8_SCALE_TESTS=1 python -m pytest tests/test_scale_bands.py -q
The quick CI-scale band checks live in tests/test_gemm.py.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("GEMMUL8_SCALE_TESTS"),
    reason="reference-scale sweep: set GEMMUL8_SCALE_TESTS=1 (slow)")

# BASELINE.md §3: max relerr at k=8192, phi=0.5 (GH200 CSV, device-
# independent — same seed/data on all 4 reference GPUs)
REF_FAST = {8: 1.43e-01, 10: 2.33e-03, 12: 4.95e-06, 13: 2.41e-07,
            14: 3.47e-08, 15: 7.13e-10, 16: 3.92e-11, 18: 3.59e-14,
            20: 1.83e-15}
REF_ACCU = {8: 7.69e-02, 10: 3.51e-04, 12: 9.78e-07, 13: 3.21e-08,
            14: 4.50e-09, 15: 2.16e-10, 16: 1.87e-11, 18: 1.83e-15,
            20: 5.61e-16}


@pytest.fixture(scope="module")
def operands():
    from gemmul8_tpu.bench.matrices import phi_matrix
    from gemmul8_tpu.bench.native import dd_gemm

    m, k = 1024, 8192
    a = phi_matrix(m, k, 0.5, seed=123456)
    b = phi_matrix(k, m, 0.5, seed=123457)
    ref_hi, ref_lo = dd_gemm(a, b)
    return a, b, ref_hi, ref_lo


@pytest.mark.parametrize("fast", [True, False])
def test_dgemm_bands_at_reference_scale(operands, fast):
    from gemmul8_tpu import gemm
    from gemmul8_tpu.bench.native import relerr_vs_dd
    from gemmul8_tpu.types import as_numpy

    a, b, ref_hi, ref_lo = operands
    bands = REF_FAST if fast else REF_ACCU
    got = {}
    for L, band in bands.items():
        c = as_numpy(gemm(a, b, num_moduli=L, fastmode=fast))
        mx, med = relerr_vs_dd(c.astype(np.float64), ref_hi, ref_lo)
        got[L] = mx
        # "at or inside" the reference band: the band value is a SINGLE
        # seed's max over 10^6 outputs — a heavy-tailed max-statistic.
        # MEASURED seed spread (scripts/band_seed_sweep.py, 3 seeds at
        # this exact protocol, results_committed/band_seed_sweep_cpu.csv):
        # 2.4x-8.1x per (mode, L) above the exactness floor — the 4x
        # slack is not generosity, it is BELOW the observed spread of the
        # statistic being compared (and at fast-14 all three seeds land
        # inside the raw band with no slack at all). Absolute floor: once the CRT is
        # exact enough that the result is the correctly-rounded f64
        # product (18+ moduli), max relerr is set by output cancellation
        # (measured 1.6e-14 at this seed), not by the moduli count —
        # bands below that floor only compare two seeds' cancellation
        # luck. The median — the stable statistic — must additionally
        # sit inside the max band (same floor, in median terms ~1e-16).
        assert mx <= max(band * 4.0, 5e-14), (
            f"{'fast' if fast else 'accu'}-{L}: {mx:.3e} vs band {band:.3e}")
        assert med <= max(band, 5e-16), (
            f"{'fast' if fast else 'accu'}-{L}: median {med:.3e} vs "
            f"band {band:.3e}")
    # monotone in num_moduli (down to float64 noise floor)
    ls = sorted(got)
    for l0, l1 in zip(ls, ls[1:]):
        assert got[l1] <= max(got[l0] * 1.5, 5e-16), (l0, l1, got)


# SGEMM emulation at phi=0, k=8192 (the reference's f32 protocol:
# test_float.cu adds phi=0; GH200 CSV 'OS2-fast (k=8192)' row of
# oz2_results_f_accuracy_NVIDIA_GH200_480GB_2025-04-09_01-42-47.csv).
# At phi=0 the MAX relerr is a near-zero-output cancellation lottery —
# the reference's own native-SGEMM line is 0.97 and its fast plateau
# wanders 8e-6..1.3e-4 with L — so max-vs-max band comparison compares
# two seeds' minimum |output|, not the algorithms (this seed: our native
# line is 0.41, same pathology). The stable reference statistics are:
# the curve crosses below native SGEMM by moduli 8 (BASELINE.md §3 —
# whose prose misattributes 5.33e-01 to moduli 6; the CSV header places
# it at 7) and the fast-8 MEDIAN is ~1.03e-07 (§2 time row, phi=0.5).
REF_F_FAST8_MED = 1.03e-07


def test_sgemm_bands_at_reference_scale():
    from gemmul8_tpu import gemm
    from gemmul8_tpu.bench.matrices import phi_matrix
    from gemmul8_tpu.bench.native import dd_gemm, relerr_vs_dd
    from gemmul8_tpu.types import as_numpy

    m, k = 1024, 8192
    a = phi_matrix(m, k, 0.0, seed=123456).astype(np.float32)
    b = phi_matrix(k, m, 0.0, seed=123457).astype(np.float32)
    ref_hi, ref_lo = dd_gemm(a.astype(np.float64), b.astype(np.float64))
    native = a @ b
    mx_native, _ = relerr_vs_dd(native.astype(np.float64), ref_hi, ref_lo)
    got = {}
    for L in (5, 6, 7, 8, 10, 12, 14):
        c = as_numpy(gemm(a, b, num_moduli=L))
        got[L] = relerr_vs_dd(c.astype(np.float64), ref_hi, ref_lo)
    # monotone max-relerr decrease until the f32-rounding plateau
    for l0, l1 in ((5, 6), (6, 7), (7, 8), (8, 10)):
        assert got[l1][0] <= got[l0][0] * 1.5, (l0, l1, got)
    # crosses below the native SGEMM line by moduli 8 (reference claim)
    assert got[8][0] < mx_native, (got[8], mx_native)
    # fast-8 median at or inside the reference's (2x slack; measured
    # 5.2e-08 at this seed vs the reference's 1.03e-07)
    assert got[8][1] <= REF_F_FAST8_MED * 2.0, got[8]
    # 10+ moduli: the exact-CRT result rounds once to f32, so even the
    # max sits below the native f32-arithmetic line by orders of
    # magnitude (measured 8.4e-06 at 10, 6.0e-08 at 12-14)
    for L in (10, 12, 14):
        assert got[L][0] < mx_native * 1e-3, (L, got[L])


@pytest.mark.parametrize("fast", [True, False])
def test_mixed_double_bands_at_reference_scale(operands, fast):
    """FP64 x FP32 -> FP64 (the reference's test_mixed_double protocol,
    gemm<double,float,double>) at m=n=1024, k=8192. The reference ships
    no mixed-result CSV, so the asserted bands are the DGEMM ones: the
    moduli arithmetic is identical and the ground truth is the dd product
    of the CAST operands, so the curve tracks the d curve until the
    correctly-rounded-product floor (committed evidence:
    results_committed/oz2_results_md_accuracy_cpu_*.csv)."""
    from gemmul8_tpu import gemm
    from gemmul8_tpu.bench.native import dd_gemm, relerr_vs_dd
    from gemmul8_tpu.types import as_numpy

    a, b64, _, _ = operands
    b = b64.astype(np.float32)
    ref_hi, ref_lo = dd_gemm(a, b.astype(np.float64))
    bands = REF_FAST if fast else REF_ACCU
    for L in (10, 14, 18, 20):
        band = bands[L]
        c = as_numpy(gemm(a, b, num_moduli=L, fastmode=fast,
                          out_dtype=np.float64))
        mx, _ = relerr_vs_dd(c.astype(np.float64), ref_hi, ref_lo)
        assert mx <= max(band * 4.0, 5e-14), (
            f"md {'fast' if fast else 'accu'}-{L}: {mx:.3e} "
            f"vs band {band:.3e}")
