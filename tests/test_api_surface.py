"""API-surface conformance: op_a/op_b transposes, the alpha/beta epilogue
matrix, and the strided-batch entry point.

Reference parity targets: the N/T op arguments of every gemm
specialization (include/gemmul8.hpp:29-287), the 16 inverse-scaling
epilogue specializations alpha in {1,a} x beta in {0,1,b}
(src/inverse_scaling.hpp:269-820), and cuMpSGEMM's gemm_stridedBatch
(include/cumpsgemm/cumpsgemm.hpp:10-92).
"""

import numpy as np
import pytest

import gemmul8_tpu as g8
from gemmul8_tpu.bench.matrices import phi_matrix


def _g(a, b, **kw):
    return np.asarray(g8.gemm(a, b, **kw))


@pytest.mark.parametrize("op_a", ["N", "T"])
@pytest.mark.parametrize("op_b", ["N", "T"])
def test_real_ops_bitexact(op_a, op_b):
    """gemm(A, B, op_a, op_b) must be bit-identical to gemm on the
    pre-transposed operands (the ops only change the view)."""
    m, k, n = 48, 96, 32
    a = phi_matrix(m, k, 0.5, seed=60)
    b = phi_matrix(k, n, 0.5, seed=61)
    ref = _g(a, b, num_moduli=12)
    aa = a.T.copy() if op_a == "T" else a
    bb = b.T.copy() if op_b == "T" else b
    got = _g(aa, bb, num_moduli=12, op_a=op_a, op_b=op_b)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("op_a,op_b", [("T", "N"), ("C", "C")])
def test_complex_ops(op_a, op_b):
    rng = np.random.default_rng(62)
    m, k, n = 24, 64, 16
    a = (rng.standard_normal((m, k)) + 1j * rng.standard_normal((m, k)))
    b = (rng.standard_normal((k, n)) + 1j * rng.standard_normal((k, n)))
    ref = _g(a, b, num_moduli=14)

    def op(x, o):
        return {"N": x, "T": x.T.copy(), "C": x.conj().T.copy()}[o]

    got = _g(op(a, op_a), op(b, op_b), num_moduli=14, op_a=op_a, op_b=op_b)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("alpha", [1.0, 2.5])
@pytest.mark.parametrize("beta", [0.0, 1.0, -1.5])
def test_alpha_beta_epilogue_matrix_f64(alpha, beta):
    """The reference specializes 16 inverse-scaling epilogues over
    alpha in {1,a} x beta in {0,1,b}; here one softfloat epilogue covers
    them all — check every cell against f64 reference arithmetic."""
    m, k, n = 32, 128, 24
    a = phi_matrix(m, k, 0.5, seed=63)
    b = phi_matrix(k, n, 0.5, seed=64)
    c0 = phi_matrix(m, n, 0.5, seed=65)
    prod = _g(a, b, num_moduli=14)  # the emulated product, alpha=1 beta=0
    got = _g(a, b, alpha=alpha, beta=beta, c=c0, num_moduli=14)
    ref = alpha * prod + beta * c0
    # epilogue applied in round-to-nearest f64: one rounding per term
    err = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-300)
    assert err.max() < 4e-16, f"alpha={alpha} beta={beta}: {err.max()}"
    if alpha == 1.0 and beta == 0.0:
        np.testing.assert_array_equal(got, prod)


def test_beta_requires_c():
    a = np.ones((8, 32), np.float32)
    b = np.ones((32, 8), np.float32)
    with pytest.raises((ValueError, TypeError)):
        g8.gemm(a, b, beta=1.0, num_moduli=6)


def test_gemm_batched_matches_loop():
    rng = np.random.default_rng(66)
    B, m, k, n = 3, 24, 64, 16
    a = rng.standard_normal((B, m, k))
    b = rng.standard_normal((B, k, n))
    got = np.asarray(g8.gemm_batched(a, b, num_moduli=14))
    assert got.shape == (B, m, n)
    for i in range(B):
        np.testing.assert_array_equal(got[i], _g(a[i], b[i], num_moduli=14))


def test_gemm_batched_shape_errors():
    with pytest.raises(ValueError, match="3D"):
        g8.gemm_batched(np.ones((4, 8)), np.ones((8, 4)))
    with pytest.raises(ValueError, match="mismatch"):
        g8.gemm_batched(np.ones((2, 4, 8)), np.ones((3, 8, 4)))
