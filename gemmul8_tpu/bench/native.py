"""ctypes bindings for the native C++ oracle (native/libddgemm.so).

The dd ground-truth GEMM is the hot path of every accuracy sweep (the
emulated result is compared elementwise against it at up to 8192^2 outputs
— reference protocol, testing/test_double.cu:66-199). The vectorized numpy
dd-GEMM in evalref.py is ~50x slower than the OpenMP C++ kernel, so the
harness prefers the native library and falls back transparently.

Build: `make -C native`. If g++ or the .so is unavailable the loaders
return the numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _NATIVE_DIR / "libddgemm.so"
    if not so.exists() and (_NATIVE_DIR / "Makefile").exists():
        try:  # build on demand; quiet failure -> numpy fallback
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    lib.ddgemm.argtypes = [dp, dp, dp, dp, ctypes.c_int64, ctypes.c_int64,
                           ctypes.c_int64]
    lib.relerr_metrics.argtypes = [dp, dp, dp, ctypes.c_int64, dp]
    lib.phi_matrix.argtypes = [dp, ctypes.c_int64, ctypes.c_double,
                               ctypes.c_uint64]
    _LIB = lib
    return lib


def have_native() -> bool:
    return _load() is not None


def dd_gemm(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """A @ B in double-double; native C++ when available, numpy otherwise."""
    lib = _load()
    if lib is None:
        from . import evalref

        return evalref.dd_gemm(a, b)
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    hi = np.empty((m, n), np.float64)
    lo = np.empty((m, n), np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.ddgemm(a.ctypes.data_as(dp), b.ctypes.data_as(dp),
               hi.ctypes.data_as(dp), lo.ctypes.data_as(dp), m, n, k)
    return hi, lo


def relerr_vs_dd(got: np.ndarray, ref_hi: np.ndarray,
                 ref_lo: np.ndarray) -> tuple[float, float]:
    """(max, median) relative error of `got` against a dd reference,
    with the difference itself evaluated in dd (eval.hpp:317-358)."""
    lib = _load()
    got = np.ascontiguousarray(got, np.float64)
    if lib is None:
        d = np.abs((got - ref_hi) - ref_lo)
        r = np.abs(ref_hi)
        e = np.where(r > 0, d / np.where(r > 0, r, 1.0),
                     np.where(d > 0, np.inf, 0.0))
        return float(np.max(e)), float(np.median(e))
    out = np.empty(2, np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.relerr_metrics(got.ctypes.data_as(dp),
                       np.ascontiguousarray(ref_hi).ctypes.data_as(dp),
                       np.ascontiguousarray(ref_lo).ctypes.data_as(dp),
                       got.size, out.ctypes.data_as(dp))
    return float(out[0]), float(out[1])
