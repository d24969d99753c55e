"""Pallas kernels (interpret mode on CPU) vs the plain-jnp reference path.

The TPU execution path of gemm_core is: fast_sft_pallas -> encode_slices_
pallas -> matmul_mod_u8_pallas -> reconstruct_pallas. Each kernel runs the
same integer math as the jnp implementation, so outputs must be BIT-EXACT,
not approximately equal. These tests force use_pallas=True on the CPU
backend (kernels run through the Pallas interpreter).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gemmul8_tpu.core import encode as enc
from gemmul8_tpu.core import gemm as gg
from gemmul8_tpu.core import reconstruct as rec
from gemmul8_tpu.core import slicegemm as sg
from gemmul8_tpu.pallas import kernels as pk
from gemmul8_tpu.pallas import matmul as pm
from gemmul8_tpu.types import F64Bits, f64_to_bits


def _mk(shape, phi, seed=0):
    rng = np.random.default_rng(seed)
    a = (rng.random(shape) - 0.5) * np.exp(rng.standard_normal(shape) * phi)
    a.ravel()[::13] = 0.0  # exercise zero handling
    return a


@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("L", [6, 14, 20])
def test_fast_sft_parity(axis, L):
    a = _mk((96, 160), 2.0)
    A = f64_to_bits(a)
    ref = np.asarray(gg._fast_sft_only(A, L, axis=axis))
    got = np.asarray(pk.fast_sft_pallas(A, L, axis=axis, block=(64, 128)))
    assert np.array_equal(ref, got)
    # f32 operand
    af = jnp.asarray(a, jnp.float32)
    ref = np.asarray(gg._fast_sft_only(af, L, axis=axis))
    got = np.asarray(pk.fast_sft_pallas(af, L, axis=axis, block=(64, 128)))
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("L", [6, 14])
def test_encode_parity(L):
    a = _mk((80, 144), 1.0)
    A = f64_to_bits(a)
    sft = gg._fast_sft_only(A, L, axis=1)
    ref = np.asarray(enc.encode_accurate_f64(A, sft, L))
    got = np.asarray(pk.encode_slices_pallas(A, sft, L, axis=1,
                                             block=(64, 128)))
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("L", [6, 14])
def test_matmul_mod_parity(L):
    rng = np.random.default_rng(1)
    a8 = jnp.asarray(rng.integers(-128, 128, (L, 72, 168), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-128, 128, (L, 168, 88), dtype=np.int8))
    c32 = sg.slice_products(a8, b8)
    ref = np.asarray(sg.mod_reduce(c32, L)).astype(np.uint8)
    got = np.asarray(pm.matmul_mod_u8_pallas(a8, b8, L,
                                             block=(128, 128, 128)))
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("out_kind", ["f64", "f32"])
def test_reconstruct_parity(out_kind):
    L = 14
    rng = np.random.default_rng(2)
    # plausible residues + shifts
    r = jnp.asarray(np.stack([
        rng.integers(0, int(m), (48, 64)) for m in
        [256, 255, 253, 251, 247, 241, 239, 233, 229, 227, 223, 217, 211,
         199]]).astype(np.int32))
    sft_a = jnp.asarray(rng.integers(-40, 40, (48, 1)).astype(np.int32))
    sft_b = jnp.asarray(rng.integers(-40, 40, (1, 64)).astype(np.int32))
    ref = rec.reconstruct(r, sft_a, sft_b, L, out_kind)
    got = pk.reconstruct_pallas(r, sft_a, sft_b, L, out_kind, block=(16, 64))
    if out_kind == "f64":
        assert np.array_equal(np.asarray(ref.hi), np.asarray(got.hi))
        assert np.array_equal(np.asarray(ref.lo), np.asarray(got.lo))
    else:
        assert np.array_equal(
            np.asarray(ref).view(np.uint32), np.asarray(got).view(np.uint32))


@pytest.mark.parametrize("L", [8, 14])
def test_gemm_core_pallas_end_to_end(L):
    a = _mk((72, 200), 0.5, seed=3)
    b = _mk((200, 56), 0.5, seed=4)
    A, B = f64_to_bits(a), f64_to_bits(b)
    ref = gg.gemm_core(A, B, L, True, "f64", use_pallas=False)
    got = gg.gemm_core(A, B, L, True, "f64", use_pallas=True)
    assert np.array_equal(np.asarray(ref.hi), np.asarray(got.hi))
    assert np.array_equal(np.asarray(ref.lo), np.asarray(got.lo))


@pytest.mark.parametrize("L", [8, 14])
def test_matmul_crt_limbs_parity(L):
    """Fused CRT-limb matmul == mod_reduce + accumulate_weighted, and the
    limb-input reconstruct closes the loop bit-exactly."""
    rng = np.random.default_rng(9)
    a8 = jnp.asarray(rng.integers(-128, 128, (L, 48, 136), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-128, 128, (L, 136, 72), dtype=np.int8))
    c32 = sg.slice_products(a8, b8)
    r = sg.mod_reduce(c32, L)
    ref = rec.accumulate_weighted(r, L)
    got = pm.matmul_crt_pallas(a8, b8, L, block=(128, 128, 128))
    for i, refl in enumerate(ref):
        assert np.array_equal(np.asarray(refl), np.asarray(got[i])), i
    sft_a = jnp.zeros((48, 1), jnp.int32)
    sft_b = jnp.zeros((1, 72), jnp.int32)
    want = rec.reconstruct(r, sft_a, sft_b, L, "f64")
    have = pk.reconstruct_pallas(got, sft_a, sft_b, L, "f64",
                                 block=(16, 72), input_kind="limbs")
    assert np.array_equal(np.asarray(want.hi), np.asarray(have.hi))
    assert np.array_equal(np.asarray(want.lo), np.asarray(have.lo))
