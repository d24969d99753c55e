"""GEMM-emulation orchestrator: encode -> slice int8 GEMMs -> mod-reduce ->
CRT reconstruct, for every real input/output dtype combination.

This is the TPU-native counterpart of the reference's gemm template
specializations (/root/reference/GEMMul8/src/gemmul8.cu:149-577): one
jittable function of the operands, composed of the four phases the reference
times separately. Mixed precision falls out of per-operand encode dispatch
(the reference templates the scaling kernels per operand type the same way,
gemmul8.cu:538-540).

Operands are canonical internal forms:
  - F64Bits (hi/lo uint32 arrays) for FP64 data
  - jnp.float32 arrays for FP32 data
Output: F64Bits ('f64' target) or float32 array ('f32' target).
"""

from __future__ import annotations

from functools import partial
from typing import Union

import jax
import jax.numpy as jnp

from .. import tables
from ..types import F64Bits
from . import encode as enc
from . import reconstruct as rec
from . import slicegemm as sg

Operand = Union[F64Bits, jax.Array]


def _is_f64(x: Operand) -> bool:
    return isinstance(x, F64Bits)


def _check_shapes(a: Operand, b: Operand):
    m, ka = a.shape
    kb, n = b.shape
    if ka != kb:
        raise ValueError(f"inner dims mismatch: {a.shape} x {b.shape}")
    if ka > tables.MAX_K:
        raise ValueError(
            f"k={ka} exceeds the int32-exactness bound 2^17"
            " — shard k (see gemmul8_tpu.parallel) or chunk the call")
    return m, ka, n


def encode_operand_fast(x: Operand, num_moduli: int, axis: int):
    if _is_f64(x):
        return enc.encode_fast_f64(x, num_moduli, axis)
    return enc.encode_fast_f32(x, num_moduli, axis)


def encode_operand_accurate(a: Operand, b: Operand, num_moduli: int):
    """Accurate-mode ('int8tc') joint shift selection: 7-bit round-up
    magnitudes, one extra int8 GEMM |A|x|B|, then per-row/col shifts from the
    product-magnitude estimate (reference scaling.hpp:3053-3136)."""
    if _is_f64(a):
        mag_a, emax_a = enc.mag7_f64(a, axis=1)
    else:
        mag_a, emax_a = enc.mag7_f32(a, axis=1)
    if _is_f64(b):
        mag_b, emax_b = enc.mag7_f64(b, axis=0)
    else:
        mag_b, emax_b = enc.mag7_f32(b, axis=0)
    s = jax.lax.dot_general(mag_a, mag_b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    smax_a = jnp.max(s, axis=1, keepdims=True)
    smax_b = jnp.max(s, axis=0, keepdims=True)
    sft_a = enc.accurate_sft(smax_a, emax_a, num_moduli,
                             53 if _is_f64(a) else 24)
    sft_b = enc.accurate_sft(smax_b, emax_b, num_moduli,
                             53 if _is_f64(b) else 24)
    if _is_f64(a):
        a8 = enc.encode_accurate_f64(a, sft_a, num_moduli)
    else:
        a8 = enc.encode_accurate_f32(a, sft_a, num_moduli)
    if _is_f64(b):
        b8 = enc.encode_accurate_f64(b, sft_b, num_moduli)
    else:
        b8 = enc.encode_accurate_f32(b, sft_b, num_moduli)
    return a8, sft_a, b8, sft_b


def gemm_core(a: Operand, b: Operand, num_moduli: int, fastmode: bool,
              out_dtype: str):
    """C = A @ B emulated. a: (m,k); b: (k,n). Returns F64Bits or f32."""
    _check_shapes(a, b)
    if fastmode:
        a8, sft_a = encode_operand_fast(a, num_moduli, axis=1)
        b8, sft_b = encode_operand_fast(b, num_moduli, axis=0)
    else:
        a8, sft_a, b8, sft_b = encode_operand_accurate(a, b, num_moduli)
    c32 = sg.slice_products(a8, b8)
    r = sg.mod_reduce(c32, num_moduli)
    return rec.reconstruct(r, sft_a, sft_b, num_moduli, out_dtype)


def gemm_phases(a: Operand, b: Operand, num_moduli: int, fastmode: bool,
                out_dtype: str):
    """Staged variant returning per-phase callables for sync-based timing
    (parity with the reference's 4-part breakdown, gemmul8.cu:10-18):
    encode / int8 GEMMs / mod-reduce / reconstruct."""
    _check_shapes(a, b)

    @jax.jit
    def phase_encode(a, b):
        if fastmode:
            a8, sft_a = encode_operand_fast(a, num_moduli, axis=1)
            b8, sft_b = encode_operand_fast(b, num_moduli, axis=0)
        else:
            a8, sft_a, b8, sft_b = encode_operand_accurate(a, b, num_moduli)
        return a8, sft_a, b8, sft_b

    @jax.jit
    def phase_matmul(a8, b8):
        return sg.slice_products(a8, b8)

    @jax.jit
    def phase_mod(c32):
        return sg.mod_reduce(c32, num_moduli)

    @partial(jax.jit, static_argnames=())
    def phase_reconstruct(r, sft_a, sft_b):
        return rec.reconstruct(r, sft_a, sft_b, num_moduli, out_dtype)

    return phase_encode, phase_matmul, phase_mod, phase_reconstruct
