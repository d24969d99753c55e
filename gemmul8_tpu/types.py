"""Public types for the TPU-native Ozaki-II GEMM emulation engine.

Mirrors the capability surface of the reference public header
(/root/reference/GEMMul8/include/gemmul8.hpp:7-22: computeType_t, workSize,
gemm<TA,TB,TC>), re-expressed for JAX.

TPU specifics: TPU has no native float64 — XLA stores f64 arrays exactly but
*computes* on them in double-float (2xf32) emulation, which is not exact.
This framework therefore carries FP64 data as explicit bit patterns
(`F64Bits`: hi/lo uint32 arrays) through the whole compute path; all encode /
reconstruct arithmetic is exact int32 work on the VPU.  On CPU backends,
native float64 arrays are accepted and converted for convenience.
"""

from __future__ import annotations

import enum
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ComputeType(enum.Enum):
    """Complex-multiplication strategy (real inputs ignore this).

    Parity with reference include/gemmul8.hpp:7-12."""

    REAL_DEFAULT = 0
    COMPLEX_BIG_MATRIX_ENCODE = 1   # one doubled-size int8 GEMM per modulus
    COMPLEX_CLASSIC_MULT = 2        # four int8 GEMMs per modulus
    COMPLEX_KARATSUBA_MULT = 3      # three int8 GEMMs per modulus


class F64Bits(NamedTuple):
    """An FP64 array as raw IEEE-754 bit patterns: hi word (sign|exp|mant-hi),
    lo word (mant-lo). Both uint32, same shape."""

    hi: jax.Array
    lo: jax.Array

    @property
    def shape(self):
        return self.hi.shape

    @property
    def ndim(self):
        return self.hi.ndim

    def transpose(self, *axes) -> "F64Bits":
        return F64Bits(self.hi.transpose(*axes), self.lo.transpose(*axes))

    @property
    def T(self) -> "F64Bits":
        return F64Bits(self.hi.T, self.lo.T)

    def __getitem__(self, idx) -> "F64Bits":  # type: ignore[override]
        return F64Bits(self.hi[idx], self.lo[idx])


class C64Bits(NamedTuple):
    """A complex128 array as two F64Bits (real, imag)."""

    re: F64Bits
    im: F64Bits

    @property
    def shape(self):
        return self.re.hi.shape


def f64_to_bits(x) -> F64Bits:
    """Convert an f64 array (numpy or jax-on-a-native-f64-backend) to F64Bits.

    numpy input: free view. jax input: uses bitcast_convert_type, which
    requires a backend with native f64 bit layout exposure (CPU). On TPU, pass
    F64Bits directly (or convert on host)."""
    if isinstance(x, F64Bits):
        return x
    if isinstance(x, np.ndarray):
        u = np.ascontiguousarray(x, dtype=np.float64).view(np.uint32)
        u = u.reshape(x.shape + (2,))
        # little-endian: word 0 = low, word 1 = high
        return F64Bits(jnp.asarray(u[..., 1]), jnp.asarray(u[..., 0]))
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float64), jnp.uint32)
    return F64Bits(u[..., 1], u[..., 0])


def as_numpy(x) -> np.ndarray:
    """Result of gemm() as a host ndarray regardless of domain: F64Bits
    becomes float64 (np.asarray on the NamedTuple would silently stack the
    raw hi/lo words into a (2, m, n) uint32 array); everything else passes
    through np.asarray."""
    if isinstance(x, F64Bits):
        return bits_to_f64(x, to_numpy=True)
    return np.asarray(x)


def bits_to_f64(b: F64Bits, to_numpy: bool = False):
    """Inverse of f64_to_bits. Without x64 enabled (e.g. on TPU) a device
    bitcast would silently truncate to f32, so the conversion happens on
    host and returns numpy in that case."""
    if to_numpy or not jax.config.jax_enable_x64:
        hi = np.asarray(b.hi, dtype=np.uint32)
        lo = np.asarray(b.lo, dtype=np.uint32)
        u = np.stack([lo, hi], axis=-1)
        return np.ascontiguousarray(u).view(np.float64).reshape(hi.shape)
    u = jnp.stack([b.lo, b.hi], axis=-1)
    return jax.lax.bitcast_convert_type(u, jnp.float64)


def f32_to_bits(x) -> jax.Array:
    """f32 array -> uint32 bit patterns (exact on all backends)."""
    return jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32), jnp.uint32)


def bits_to_f32(u) -> jax.Array:
    return jax.lax.bitcast_convert_type(u.astype(jnp.uint32), jnp.float32)


def assemble_c64_host(re, im) -> np.ndarray:
    """(re, im) f32 device planes -> numpy complex64, with the interleave
    done ON DEVICE (one packed (..., 2) f32 tensor) and only a zero-copy
    reinterpret view on the host. TPU runtimes here cannot hold complex64
    device arrays (transfers raise UNIMPLEMENTED), so this is the minimal
    host step possible: one contiguous transfer, no host arithmetic."""
    packed = jnp.stack([jnp.asarray(re, jnp.float32),
                        jnp.asarray(im, jnp.float32)], axis=-1)
    return np.ascontiguousarray(np.asarray(packed)).view(np.complex64)[..., 0]
