"""Test-matrix generation and error metrics.

phi-difficulty model matching the reference harness
(/root/reference/GEMMul8/testing/make_matrix.hpp:8-35): elements
(uniform - 0.5) * exp(normal * phi); phi sweeps the exponent spread
(phi = 0.5 ~ HPL difficulty). Metrics: max and median elementwise relative
error vs an exact reference product (testing/eval.hpp:317-381) — here the
ground truth is numpy float64 (exact enough when compared against emulation
targets) or exact big-int GEMM for small sizes.
"""

from __future__ import annotations

import numpy as np
from fractions import Fraction


def phi_matrix(m: int, n: int, phi: float, seed: int,
               dtype=np.float64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    u = rng.random((m, n))
    g = rng.standard_normal((m, n))
    return ((u - 0.5) * np.exp(g * phi)).astype(dtype)


def exact_gemm_f64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact A@B for float64 inputs via python big-int arithmetic on scaled
    significands, rounded once to f64. Ground-truth for accuracy tests
    (plays the role of the reference's dd-GEMM, testing/eval.hpp:265-308).
    O(m*n*k) python — small sizes only."""
    m, k = a.shape
    k2, n = b.shape
    af = [[Fraction(float(x)) for x in row] for row in a]
    bf = [[Fraction(float(x)) for x in row] for row in b]
    out = np.zeros((m, n), np.float64)
    for i in range(m):
        for j in range(n):
            s = Fraction(0)
            for t in range(k):
                s += af[i][t] * bf[t][j]
            out[i, j] = float(s)
    return out


def relerr_stats(c: np.ndarray, ref: np.ndarray):
    """(max, median) elementwise relative error (reference eval.hpp:317-358)."""
    denom = np.abs(ref)
    denom = np.where(denom == 0, 1.0, denom)
    e = np.abs(c.astype(np.float64) - ref) / denom
    return float(np.max(e)), float(np.median(e))


def latms_matrix(m: int, n: int, cond: float, seed: int,
                 dtype=np.float64) -> np.ndarray:
    """Random matrix with prescribed 2-norm condition number — the
    capability of LAPACK latms-style generators in ozIMMU's vendored
    mateval (/root/reference/ozIMMU_EF/test/mateval): orthogonal factors
    around a log-spaced singular spectrum from 1 down to 1/cond."""
    rng = np.random.default_rng(seed)
    k = min(m, n)
    u, _ = np.linalg.qr(rng.standard_normal((m, k)))
    v, _ = np.linalg.qr(rng.standard_normal((n, k)))
    s = np.logspace(0.0, -np.log10(cond), k)
    return ((u * s) @ v.T).astype(dtype)
