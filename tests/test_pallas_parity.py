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


def _boundary_frac(x, axis, L):
    """Per-row/col distance of the shift formula from its floor boundary
    (jnp stats), via the helper shared with sft_from_stats — see
    enc.sft_floor_frac for why shifts may legally differ by 1 there."""
    if isinstance(x, F64Bits):
        parts = [enc._f64_fields(x.hi, x.lo)]
        mant_bits = 53
    else:
        bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32),
                                            jnp.uint32)
        parts = [enc._f32_fields(bits)]
        mant_bits = 24
    emax, nrm2, af, k = enc._fast_stats_multi(parts, axis, mant_bits)
    return np.asarray(enc.sft_floor_frac(nrm2, k, L))


def _assert_sft_parity(ref, got, frac):
    """Bit-equal except at documented floor-boundary rows (ADVICE r1:
    the invariant is probabilistic there; both shifts are valid)."""
    diff = ref != got
    if not diff.any():
        return
    assert np.abs(ref[diff] - got[diff]).max() <= 1
    assert frac.reshape(ref.shape)[diff].max() < 1e-4, \
        "shift mismatch away from a floor boundary: real parity bug"


@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("L", [6, 14, 20])
def test_fast_sft_parity(axis, L):
    a = _mk((96, 160), 2.0)
    A = f64_to_bits(a)
    ref = np.asarray(gg._fast_sft_only(A, L, axis=axis))
    got = np.asarray(pk.fast_sft_pallas(A, L, axis=axis, block=(64, 128)))
    _assert_sft_parity(ref, got, _boundary_frac(A, axis, L))
    # f32 operand
    af = jnp.asarray(a, jnp.float32)
    ref = np.asarray(gg._fast_sft_only(af, L, axis=axis))
    got = np.asarray(pk.fast_sft_pallas(af, L, axis=axis, block=(64, 128)))
    _assert_sft_parity(ref, got, _boundary_frac(af, axis, L))


@pytest.mark.parametrize("axis", [0, 1])
def test_fast_sft_parity_single_block_exact(axis):
    """With the contraction axis in ONE kernel block the summation orders
    match structurally: equality must be bit-exact, no boundary escape."""
    a = _mk((96, 120), 2.0)
    A = f64_to_bits(a)
    blk = (64, 128) if axis == 1 else (64, 128)
    ref = np.asarray(gg._fast_sft_only(A, 14, axis=axis))
    got = np.asarray(pk.fast_sft_pallas(A, 14, axis=axis, block=blk))
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


@pytest.mark.parametrize("out_kind", ["f64", "f32"])
@pytest.mark.parametrize("L", [2, 8, 14])
def test_megakernel_parity(out_kind, L):
    """Fused matmul+reconstruct megakernel == matmul_mod + reconstruct,
    bit-exact, including multi-tile grids and padded edges."""
    from gemmul8_tpu.pallas import megakernel as mk

    rng = np.random.default_rng(11)
    m, k, n = 200, 136, 280  # not multiples of the 128-tile: exercises pad
    a8 = jnp.asarray(rng.integers(-128, 128, (L, m, k), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-128, 128, (L, k, n), dtype=np.int8))
    sft_a = jnp.asarray(rng.integers(-40, 40, (m, 1)).astype(np.int32))
    sft_b = jnp.asarray(rng.integers(-40, 40, (1, n)).astype(np.int32))
    r8 = pm.matmul_mod_u8_pallas(a8, b8, L, block=(128, 128, 128))
    want = pk.reconstruct_pallas(r8.astype(jnp.int32), sft_a, sft_b, L,
                                 out_kind, block=(16, 128))
    got = mk.matmul_reconstruct_pallas(a8, b8, sft_a, sft_b, L, out_kind,
                                       block=(128, 128))
    if out_kind == "f64":
        assert np.array_equal(np.asarray(want.hi), np.asarray(got.hi))
        assert np.array_equal(np.asarray(want.lo), np.asarray(got.lo))
    else:
        assert np.array_equal(np.asarray(want).view(np.uint32),
                              np.asarray(got).view(np.uint32))


def test_megakernel_single_tile():
    from gemmul8_tpu.pallas import megakernel as mk

    L = 6
    rng = np.random.default_rng(12)
    a8 = jnp.asarray(rng.integers(-128, 128, (L, 64, 96), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-128, 128, (L, 96, 72), dtype=np.int8))
    sft_a = jnp.asarray(rng.integers(-10, 10, (64, 1)).astype(np.int32))
    sft_b = jnp.asarray(rng.integers(-10, 10, (1, 72)).astype(np.int32))
    r8 = pm.matmul_mod_u8_pallas(a8, b8, L, block=(128, 128, 128))
    want = pk.reconstruct_pallas(r8.astype(jnp.int32), sft_a, sft_b, L,
                                 "f64", block=(16, 128))
    got = mk.matmul_reconstruct_pallas(a8, b8, sft_a, sft_b, L, "f64")
    assert np.array_equal(np.asarray(want.hi), np.asarray(got.hi))
    assert np.array_equal(np.asarray(want.lo), np.asarray(got.lo))


@pytest.mark.parametrize("f64", [True, False])
def test_accurate_sfts_pallas_parity(f64):
    """Accurate-mode Pallas shift selection (emax + mag7 + magmax matmul
    kernels) is bit-exact vs the jnp path: every reduction is a max."""
    a = _mk((88, 272), 1.5, seed=5)
    b = _mk((272, 104), 1.5, seed=6)
    if f64:
        A, B = f64_to_bits(a), f64_to_bits(b)
    else:
        A, B = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    for L in (8, 14 if f64 else 12):
        ref_a, ref_b = gg.accurate_sfts(A, B, L, use_pallas=False)
        got_a, got_b = gg.accurate_sfts(A, B, L, use_pallas=True)
        assert np.array_equal(np.asarray(ref_a), np.asarray(got_a))
        assert np.array_equal(np.asarray(ref_b), np.asarray(got_b))


def test_gemm_core_accurate_pallas_end_to_end():
    a = _mk((72, 200), 1.0, seed=13)
    b = _mk((200, 56), 1.0, seed=14)
    A, B = f64_to_bits(a), f64_to_bits(b)
    ref = gg.gemm_core(A, B, 14, False, "f64", use_pallas=False)
    got = gg.gemm_core(A, B, 14, False, "f64", use_pallas=True)
    assert np.array_equal(np.asarray(ref.hi), np.asarray(got.hi))
    assert np.array_equal(np.asarray(ref.lo), np.asarray(got.lo))


@pytest.mark.parametrize("bk", [128, 256])
def test_megakernel_kchunk_parity(bk):
    """k-chunked grid (KK >= 2): accumulate-across-kk + rider slot
    schedule must stay bit-exact."""
    from gemmul8_tpu.pallas import megakernel as mk

    L = 14
    rng = np.random.default_rng(21)
    m, k, n = 160, 520, 200
    a8 = jnp.asarray(rng.integers(-128, 128, (L, m, k), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-128, 128, (L, k, n), dtype=np.int8))
    sft_a = jnp.asarray(rng.integers(-40, 40, (m, 1)).astype(np.int32))
    sft_b = jnp.asarray(rng.integers(-40, 40, (1, n)).astype(np.int32))
    r8 = pm.matmul_mod_u8_pallas(a8, b8, L, block=(128, 128, 128))
    want = pk.reconstruct_pallas(r8.astype(jnp.int32), sft_a, sft_b, L,
                                 "f64", block=(16, 128))
    got = mk.matmul_reconstruct_pallas(a8, b8, sft_a, sft_b, L, "f64",
                                       block=(128, 128, bk))
    assert np.array_equal(np.asarray(want.hi), np.asarray(got.hi))
    assert np.array_equal(np.asarray(want.lo), np.asarray(got.lo))


@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("L", [6, 14])
def test_fused_encode_parity(axis, L):
    """fast_encode_fused_pallas == (fast_sft_pallas -> encode_slices_pallas)
    for both its outputs. The fused kernel replicates the two-kernel
    pipeline's chunked online-rescale stats merge, so the sft (and
    therefore the slices) must be bit-identical to the Pallas pipeline."""
    a = _mk((96, 160) if axis == 1 else (160, 96), 2.0, seed=7)
    for x in (f64_to_bits(a), jnp.asarray(a, jnp.float32)):
        sft_ref = pk.fast_sft_pallas(x, L, axis=axis)
        sl_ref = np.asarray(pk.encode_slices_pallas(x, sft_ref, L,
                                                    axis=axis))
        sl, sft = pk.fast_encode_fused_pallas(x, L, axis=axis)
        assert np.array_equal(np.asarray(sft_ref), np.asarray(sft))
        assert np.array_equal(sl_ref, np.asarray(sl))


def test_fused_encode_padding_and_zero_rows():
    """Non-multiple shapes and all-zero rows: the fused kernel's row
    padding must not perturb stats, and zero rows encode to zero slices."""
    a = _mk((70, 130), 1.0, seed=8)
    a[3, :] = 0.0
    A = f64_to_bits(a)
    sft_ref = pk.fast_sft_pallas(A, 10, axis=1)
    sl_ref = np.asarray(pk.encode_slices_pallas(A, sft_ref, 10, axis=1))
    sl, sft = pk.fast_encode_fused_pallas(A, 10, axis=1)
    assert np.array_equal(np.asarray(sft_ref), np.asarray(sft))
    assert np.array_equal(sl_ref, np.asarray(sl))
    assert (sl_ref[:, 3, :] == 0).all()


@pytest.mark.parametrize("gate", [None, "GEMMUL8_FUSED_ENCODE",
                                  "GEMMUL8_FUSED_RECONSTRUCT",
                                  "GEMMUL8_MM_PIPELINE"])
def test_gemm_core_fast_end_to_end(monkeypatch, gate):
    """gemm_core(use_pallas=True) must stay bit-identical to the jnp path
    under every env-gated variant (the fused-encode, fused-reconstruct
    megakernel, and software-pipelined matmul branches are opt-in via env
    and would otherwise never be wired through gemm_core in the suite)."""
    if gate:
        monkeypatch.setenv(gate, "1")
    a = _mk((64, 256), 1.0, seed=9)
    b = _mk((256, 48), 1.0, seed=10)
    A, B = f64_to_bits(a), f64_to_bits(b)
    ref = gg.gemm_core(A, B, 14, True, "f64", use_pallas=False)
    got = gg.gemm_core(A, B, 14, True, "f64", use_pallas=True)
    assert np.array_equal(np.asarray(ref.hi), np.asarray(got.hi))
    assert np.array_equal(np.asarray(ref.lo), np.asarray(got.lo))


@pytest.mark.parametrize("shape", [(72, 168, 88), (64, 256, 128)])
def test_matmul_mod_pipelined_parity(shape):
    """Software-pipelined epilogue kernel == the k-tiled kernel, including
    the last n-tile (flushed by the extra grid step) and padding."""
    m, k, n = shape
    L = 14
    rng = np.random.default_rng(3)
    a8 = jnp.asarray(rng.integers(-128, 128, (L, m, k), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-128, 128, (L, k, n), dtype=np.int8))
    ref = np.asarray(pm.matmul_mod_u8_pallas(a8, b8, L,
                                             block=(128, 128, 128)))
    got = np.asarray(pm.matmul_mod_u8_pipelined(a8, b8, L,
                                                block=(128, 128)))
    assert np.array_equal(ref, got)


def test_magmax_matmul_multitile():
    """Multi-tile grid for the magnitude-GEMM max epilogue: the row maxes
    fold into per-tile lanes and the col maxes into a kernel-resident
    buffer — regression for the (bm, 1) block shape the TPU lowering
    rejects and the revisit-flush hazard (r2 time sweep crash)."""
    rng = np.random.default_rng(5)
    a8 = jnp.asarray(rng.integers(0, 65, (384, 256), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(0, 65, (256, 384), dtype=np.int8))
    s = np.asarray(jax.lax.dot_general(
        a8.astype(jnp.int32), b8.astype(jnp.int32),
        (((1,), (0,)), ((), ()))))
    ref_row = s.max(axis=1, keepdims=True)
    ref_col = s.max(axis=0, keepdims=True)
    got_row, got_col = pm.magmax_matmul_pallas(a8, b8,
                                               block=(128, 128, 128))
    assert np.array_equal(ref_row, np.asarray(got_row))
    assert np.array_equal(ref_col, np.asarray(got_col))


@pytest.mark.parametrize("out_kind", ["f64", "f32"])
def test_reconstruct_mxu_crt_parity(out_kind):
    """MXU-CRT reconstruct (W' int8 contraction) vs the VPU accumulate:
    BIT-identical for the uint8-residue input the TPU path produces AND
    for int32 raw slice products (the Barrett-first branch)."""
    L = 14
    rng = np.random.default_rng(5)
    moduli = [256, 255, 253, 251, 247, 241, 239, 233, 229, 227, 223, 217,
              211, 199]
    r_u8 = jnp.asarray(np.stack([
        rng.integers(0, m, (80, 96)) for m in moduli]).astype(np.uint8))
    sft_a = jnp.asarray(rng.integers(-40, 40, (80, 1)).astype(np.int32))
    sft_b = jnp.asarray(rng.integers(-40, 40, (1, 96)).astype(np.int32))

    def cmp(ref, got):
        if out_kind == "f64":
            assert np.array_equal(np.asarray(ref.hi), np.asarray(got.hi))
            assert np.array_equal(np.asarray(ref.lo), np.asarray(got.lo))
        else:
            assert np.array_equal(np.asarray(ref).view(np.uint32),
                                  np.asarray(got).view(np.uint32))

    ref = pk.reconstruct_pallas(r_u8, sft_a, sft_b, L, out_kind,
                                block=(16, 64), mxu=False)
    got = pk.reconstruct_pallas(r_u8, sft_a, sft_b, L, out_kind,
                                block=(16, 64), mxu=True)
    cmp(ref, got)
    # block-size independence of the MXU path (different W' shapes)
    got8 = pk.reconstruct_pallas(r_u8, sft_a, sft_b, L, out_kind,
                                 block=(8, 128), mxu=True)
    cmp(ref, got8)
    # column-strip tail (register-resident finalize): same math
    gotc = pk.reconstruct_pallas(r_u8, sft_a, sft_b, L, out_kind,
                                 block=(16, 64), mxu=True, tail_chunk=32)
    cmp(ref, gotc)
    # int32 raw products: Barrett-reduce first, then the MXU contraction
    raw = (r_u8.astype(jnp.int32)
           + jnp.asarray(np.array(moduli, np.int32))[:, None, None] * 977)
    ref32 = pk.reconstruct_pallas(raw, sft_a, sft_b, L, out_kind,
                                  block=(16, 64), mxu=False)
    got32 = pk.reconstruct_pallas(raw, sft_a, sft_b, L, out_kind,
                                  block=(16, 64), mxu=True)
    cmp(ref32, got32)


def test_crt_mxu_consts_exact():
    """The W' contraction algebra reproduces sum_j w_j * r_j exactly for
    adversarial residues (all-zero, all-max, mixed) at several L."""
    from gemmul8_tpu import tables
    from gemmul8_tpu.core import limbs as lb

    for L in (2, 8, 14, 20):
        nl = tables.num_limbs(L)
        bm = 8
        wp, cl = pk._crt_mxu_consts(L, bm)
        assert wp.shape == ((2 * nl + 1) * bm, L * bm)
        rng = np.random.default_rng(L)
        mods = np.asarray(tables.MODULI[:L], np.int64)
        r = rng.integers(0, mods[:, None, None], (L, bm, 128)).astype(np.uint8)
        r[:, 0, 0] = 0
        r[:, 0, 1] = (mods - 1).astype(np.uint8)
        rc2 = jnp.asarray((r.astype(np.int32) - 128).astype(np.int8)
                          .reshape(L * bm, 128))
        x = pk._crt_accumulate_mxu(rc2, jnp.asarray(wp), L, cl, bm, 128)
        # exact big-int check against the weights
        w = np.asarray(tables.crt_weight_limbs(L), dtype=object)
        wfull = sum(w[:, l] * (1 << (16 * l)) for l in range(nl))
        want = sum(wfull[j] * r[j].astype(object) for j in range(L))
        got = sum(np.asarray(x[l]).astype(object) << (16 * l)
                  for l in range(nl))
        assert (got == want).all()


@pytest.mark.parametrize("dtype", ["f64", "f32"])
@pytest.mark.parametrize("axis", [1, 0])
def test_encode_mxu_parity(dtype, axis):
    """MXU-encode (byte-plane W'' contraction) vs the chunk-dot VPU body:
    bit-identical int8 slices, both axes, both dtypes, incl. a chunked
    moduli subrange."""
    L = 14
    x = _mk((88, 144), 2.0, seed=9)
    X = f64_to_bits(x) if dtype == "f64" else jnp.asarray(x, jnp.float32)
    sft = pk.fast_sft_pallas(X, L, axis=axis)
    ref = pk.encode_slices_pallas(X, sft, L, axis=axis, mxu=False)
    got = pk.encode_slices_pallas(X, sft, L, axis=axis, mxu=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    idx = (0, 5, 13)
    ref_c = pk.encode_slices_pallas(X, sft, L, axis=axis, moduli_idx=idx,
                                    mxu=False)
    got_c = pk.encode_slices_pallas(X, sft, L, axis=axis, moduli_idx=idx,
                                    mxu=True)
    assert np.array_equal(np.asarray(ref_c), np.asarray(got_c))


def test_encode_mxu_zero_fixup_barrett_exhaustive():
    """The MXU encode's round-nearest Barrett claims q == round(raw/m)
    with ZERO fixups for every reachable accumulator value. Check it
    exhaustively in f32 emulation for every odd modulus and every
    raw in [0, (nb_max+1)*255*(m-1)] (the static bound; nb_max = 10)."""
    from gemmul8_tpu import tables

    nb_max = 10
    for m in [int(v) for v in tables.MODULI if int(v) != 256]:
        hi = (nb_max + 1) * 255 * (m - 1)
        raw = np.arange(hi + 1, dtype=np.int64)
        qf = (raw.astype(np.float32) * np.float32(1.0 / m)
              + np.float32(0.5 - 2.0 ** -10)).astype(np.int64)
        want = (raw + m // 2) // m          # round(raw/m), no ties (odd m)
        assert np.array_equal(qf, want), f"m={m}"
        r = raw - qf * m
        assert r.min() >= -(m - 1) // 2 and r.max() <= (m - 1) // 2


def test_encode_mxu_tiny_negative_truncation():
    """Negative values whose truncated shifted magnitude is exactly 0
    must encode to all-zero residues: the sign-folded MXU path's neg
    plane has no two's-complement wraparound there (regression: the neg
    plane once fired on the sign bit alone, injecting -2^(8nb) mod m)."""
    L = 14
    vals = np.zeros((16, 128))
    vals[0, :6] = [-8.4e-06, -2.4e-05, -1e-300, -4.9e-324, 1.0, -1.0]
    vals[1, :] = np.linspace(1.0, 2.0, 128)      # keeps the row shift sane
    X = f64_to_bits(vals)
    sft = pk.fast_sft_pallas(X, L, axis=1)
    ref = pk.encode_slices_pallas(X, sft, L, axis=1, mxu=False)
    got = pk.encode_slices_pallas(X, sft, L, axis=1, mxu=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_matmul_centered_residues_parity():
    """centered=True emits exactly (r - 128) int8, and the reconstruct
    consumes it bit-identically to the uint8 path (the default wiring
    when the MXU-CRT reconstruct is on)."""
    L = 14
    rng = np.random.default_rng(11)
    a8 = jnp.asarray(rng.integers(-128, 128, (L, 72, 168), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-128, 128, (L, 168, 88), dtype=np.int8))
    r_u8 = pm.matmul_mod_u8_pallas(a8, b8, L, block=(128, 128, 128))
    r_i8 = pm.matmul_mod_u8_pallas(a8, b8, L, block=(128, 128, 128),
                                   centered=True)
    assert r_i8.dtype == jnp.int8
    assert np.array_equal(np.asarray(r_u8).astype(np.int32) - 128,
                          np.asarray(r_i8).astype(np.int32))
    sft_a = jnp.asarray(rng.integers(-30, 30, (72, 1)).astype(np.int32))
    sft_b = jnp.asarray(rng.integers(-30, 30, (1, 88)).astype(np.int32))
    for mxu in (True, False):
        ref = pk.reconstruct_pallas(r_u8, sft_a, sft_b, L, "f64",
                                    block=(8, 88), mxu=mxu)
        got = pk.reconstruct_pallas(r_i8, sft_a, sft_b, L, "f64",
                                    block=(8, 88), mxu=mxu)
        assert np.array_equal(np.asarray(ref.hi), np.asarray(got.hi))
        assert np.array_equal(np.asarray(ref.lo), np.asarray(got.lo))
