"""Pallas TPU kernels for the non-matmul phases.

The encode and reconstruct phases are long chains of int32 ops; under plain
XLA each intermediate round-trips HBM, which dominated wall-time (measured
~50 ms of the 65 ms 4096^3 call). These kernels run the identical math —
the jnp bit-manipulation bodies from core.encode / core.reconstruct are
reused verbatim inside the kernel — but blocked into VMEM so the whole
chain stays on-chip: one HBM read of the operand, one HBM write of the
slices / the output bits.

Kernels:
  encode_slices_pallas    (hi,lo | f32bits) + per-row/col sft -> int8 slices
  reconstruct_pallas      (L, m, n) int32 products + sfts -> f64 bits / f32

The int8 slice GEMMs stay on XLA dot_general (native MXU int8).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables
from ..core import encode as enc
from ..core import limbs as lb
from ..core import reconstruct as rec
from ..core.modmath import mod_i32
from ..types import F64Bits

_I32 = jnp.int32


def _ceil_to(x, a):
    return (x + a - 1) // a * a


def _interpret() -> bool:
    # pallas compiles natively on TPU; CPU (tests/CI) uses interpreter mode
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Fast-mode shift-statistics kernel: per-row/col max exponent + online-
# rescaled squared norm -> shift, one VMEM pass over the operand.
# (XLA materializes the chunk-extraction intermediates of the jnp stats
# pass to HBM — measured 50 ms at 8192^2 f64 vs ~3 ms for this kernel.)
# ---------------------------------------------------------------------------

def fast_sft_pallas(x, num_moduli: int, axis: int, block=None,
                    return_stats: bool = False):
    """Fast-mode ('vecnorm') shift selection. x: F64Bits or f32 array (2D).
    axis=1: per-row shifts (m,1); axis=0: per-column shifts (1,k).

    return_stats=True returns the raw (emax, nrm2, anyfinite) triplet
    instead of the shift — the distributed path combines shard-local stats
    over the k-sharded mesh axis (pmax / rescaled psum) before computing
    one globally-consistent shift (see parallel.distributed).

    Online rescaling: block-local squared norms are kept relative to the
    running max exponent and rescaled by exact powers of two when a new
    block raises the max (same merge rule as online softmax). Terms that
    underflow f32 at rescale are < 2^-150 relative — far below the
    (1 + k*2^-23) round-up guard already applied to the norm.
    """
    is64 = isinstance(x, F64Bits)
    mant_bits = 53 if is64 else 24
    bias = 1023 if is64 else 127
    d0, d1 = x.shape
    if axis == 1:
        rows, kdim = d0, d1
    else:
        rows, kdim = d1, d0
    if block is None:
        # NOTE: the reduction-chunk width (launch.STATS_CHUNK, along the
        # contraction) is part of the shift's bit contract (block-wise
        # online merge) — fast_encode_fused_pallas's stat_chunk must match
        # it per axis and every launch profile pins it. The ROW count is
        # pure tuning, keyed on device kind (launch.py; v5e bests measured
        # round 4: ax1 1.65 ms @ 512 vs 1.96 @ 1024; ax0 1.74 ms @ 1024
        # vs 2.12 @ 512; bit-exact across row blocks by construction).
        from . import launch

        block = launch.get("stats_ax1" if axis == 1 else "stats_ax0")
    br, bk = block
    t_f = tables.threshold_fast(num_moduli)
    rp, kp = _ceil_to(rows, br), _ceil_to(kdim, bk)
    grid = (rp // br, kp // bk)
    # reduction runs along `axis` in the block directly (no host transpose:
    # that would materialize a full copy of the operand)
    red = axis
    stat_shape = (br, 1) if axis == 1 else (1, br)

    def prep(arr):
        pad = ((0, rp - rows), (0, kp - kdim)) if axis == 1 \
            else ((0, kp - kdim), (0, rp - rows))
        return jnp.pad(arr, pad)

    if is64:
        inputs = (prep(x.hi), prep(x.lo))
    else:
        bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
        inputs = (prep(bits),)

    def kern(*refs):
        in_refs = refs[:len(inputs)]
        if return_stats:
            out_ref = refs[len(inputs):len(inputs) + 3]
        else:
            out_ref = refs[len(inputs)]
        e_acc, s_acc, af_acc = refs[-3:]
        kk = pl.program_id(1)
        klast = pl.num_programs(1) - 1
        if is64:
            chunks, exp, sign, normal = enc._f64_fields(in_refs[0][:],
                                                        in_refs[1][:])
        else:
            chunks, exp, sign, normal = enc._f32_fields(in_refs[0][:])
        e_blk = jnp.max(jnp.where(normal, exp, _I32(0)), axis=red,
                        keepdims=True)
        xs = enc._scaled_abs_f32(chunks, exp, e_blk, normal, mant_bits)
        s_blk = jnp.sum(xs * xs, axis=red, keepdims=True, dtype=jnp.float32)
        af_blk = jnp.any(normal, axis=red, keepdims=True).astype(_I32)

        @pl.when(kk == 0)
        def _():
            e_acc[:] = e_blk
            s_acc[:] = s_blk
            af_acc[:] = af_blk

        @pl.when(kk > 0)
        def _():
            e_new = jnp.maximum(e_acc[:], e_blk)
            scale_old = jnp.exp2((2 * (e_acc[:] - e_new)).astype(jnp.float32))
            scale_blk = jnp.exp2((2 * (e_blk - e_new)).astype(jnp.float32))
            s_acc[:] = s_acc[:] * scale_old + s_blk * scale_blk
            e_acc[:] = e_new
            af_acc[:] = af_acc[:] | af_blk

        @pl.when(kk == klast)
        def _():
            if return_stats:
                out_ref[0][:] = e_acc[:]
                out_ref[1][:] = s_acc[:]
                out_ref[2][:] = af_acc[:]
            else:
                # the single shared shift formula (bit-exact parity with
                # the jnp path is an invariant; don't re-implement it here)
                out_ref[:] = enc.sft_from_stats(
                    e_acc[:], s_acc[:], af_acc[:], kdim, num_moduli,
                    mant_bits)

    if axis == 1:
        data_spec = pl.BlockSpec((br, bk), lambda i, kk: (i, kk),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((br, 1), lambda i, kk: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((rp, 1), jnp.int32)
    else:
        data_spec = pl.BlockSpec((bk, br), lambda i, kk: (kk, i),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, br), lambda i, kk: (0, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((1, rp), jnp.int32)
    if return_stats:
        oshape = out_shape.shape
        out_specs = (out_spec, out_spec, out_spec)
        out_shapes = (jax.ShapeDtypeStruct(oshape, jnp.int32),
                      jax.ShapeDtypeStruct(oshape, jnp.float32),
                      jax.ShapeDtypeStruct(oshape, jnp.int32))
    else:
        out_specs = out_spec
        out_shapes = out_shape
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[data_spec] * len(inputs),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM(stat_shape, jnp.int32),
                        pltpu.VMEM(stat_shape, jnp.float32),
                        pltpu.VMEM(stat_shape, jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*inputs)
    def trim(o):
        return o[:rows] if axis == 1 else o[:, :rows]
    if return_stats:
        return tuple(trim(o) for o in out)
    return trim(out)


# ---------------------------------------------------------------------------
# Fused fast-mode stats + encode: one kernel, one HBM read of the operand.
# The separate stats pass costs a full extra read of the source plus a
# kernel dispatch (~1 ms device each per operand at 8192^2); with the whole
# contraction extent resident in VMEM the shift can be derived and applied
# in the same pass. The statistics are computed with the SAME chunked
# online-rescale merge (and the same chunk widths) as fast_sft_pallas, so
# the derived shifts are bit-identical to the two-kernel pipeline.
# ---------------------------------------------------------------------------

def fast_encode_fused_pallas(x, num_moduli: int, axis: int, moduli_idx=None,
                             block_rows: int | None = None):
    """Fast-mode shift selection AND residue encode in one VMEM pass.

    x: F64Bits or f32 array (2D). axis=1: per-row shifts for A (m, k);
    axis=0: per-column shifts for B (k, n). The full contraction extent of
    each row/column block is resident, so this requires
    rows_block * kdim * 8 bytes of VMEM (fine up to k ~ 2^17 at the
    default blocks). Returns (slices (L, d0, d1) int8, sft keepdims i32).
    """
    is64 = isinstance(x, F64Bits)
    mant_bits = 53 if is64 else 24
    d0, d1 = x.shape
    rows, kdim = (d0, d1) if axis == 1 else (d1, d0)
    if block_rows is None:
        block_rows = 64 if axis == 1 else 128
    br = min(block_rows, rows)
    # mirror the fast_sft_pallas merge chunking exactly (bit-parity)
    stat_chunk = 2048
    rp, kp = _ceil_to(rows, br), _ceil_to(kdim, stat_chunk)
    grid = (rp // br,)
    n_out = num_moduli if moduli_idx is None else len(moduli_idx)
    nseg = kp // stat_chunk

    def prep(arr):
        pad = ((0, rp - rows), (0, kp - kdim)) if axis == 1 \
            else ((0, kp - kdim), (0, rp - rows))
        return jnp.pad(arr, pad)

    if is64:
        inputs = (prep(x.hi), prep(x.lo))
    else:
        bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
        inputs = (prep(bits),)

    def kern(*refs):
        in_refs = refs[:len(inputs)]
        out_ref, sft_ref = refs[len(inputs):]
        if is64:
            chunks, exp, sign, normal = enc._f64_fields(in_refs[0][:],
                                                        in_refs[1][:])
        else:
            chunks, exp, sign, normal = enc._f32_fields(in_refs[0][:])

        def seg(t, s):
            # slice segment s of tensor t along the contraction axis
            if axis == 1:
                return t[:, s * stat_chunk:(s + 1) * stat_chunk]
            return t[s * stat_chunk:(s + 1) * stat_chunk, :]

        e_acc = s_acc = af_acc = None
        for s in range(nseg):
            ch_s = [seg(c, s) for c in chunks]
            exp_s, nrm_s = seg(exp, s), seg(normal, s)
            e_blk = jnp.max(jnp.where(nrm_s, exp_s, _I32(0)), axis=axis,
                            keepdims=True)
            xs = enc._scaled_abs_f32(ch_s, exp_s, e_blk, nrm_s, mant_bits)
            s_blk = jnp.sum(xs * xs, axis=axis, keepdims=True,
                            dtype=jnp.float32)
            af_blk = jnp.any(nrm_s, axis=axis, keepdims=True).astype(_I32)
            if e_acc is None:
                e_acc, s_acc, af_acc = e_blk, s_blk, af_blk
            else:
                # identical merge rule (and per-block scale reference) as
                # fast_sft_pallas: squares are formed at the block's own
                # e_blk and the SUMS are rescaled — same underflow
                # behavior, bit-identical accumulator sequence
                e_new = jnp.maximum(e_acc, e_blk)
                scale_old = jnp.exp2(
                    (2 * (e_acc - e_new)).astype(jnp.float32))
                scale_blk = jnp.exp2(
                    (2 * (e_blk - e_new)).astype(jnp.float32))
                s_acc = s_acc * scale_old + s_blk * scale_blk
                e_acc = e_new
                af_acc = af_acc | af_blk
        sft = enc.sft_from_stats(e_acc, s_acc, af_acc, kdim, num_moduli,
                                 mant_bits)
        sft_ref[:] = sft
        out_ref[:] = enc._encode_with_sft(chunks, exp, sign, normal, sft,
                                          num_moduli, mant_bits, moduli_idx)

    if axis == 1:
        data_spec = pl.BlockSpec((br, kp), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((n_out, br, kp), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        sft_spec = pl.BlockSpec((br, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (jax.ShapeDtypeStruct((n_out, rp, kp), jnp.int8),
                     jax.ShapeDtypeStruct((rp, 1), jnp.int32))
    else:
        data_spec = pl.BlockSpec((kp, br), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((n_out, kp, br), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        sft_spec = pl.BlockSpec((1, br), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        out_shape = (jax.ShapeDtypeStruct((n_out, kp, rp), jnp.int8),
                     jax.ShapeDtypeStruct((1, rp), jnp.int32))
    slices, sft = pl.pallas_call(
        kern, grid=grid,
        in_specs=[data_spec] * len(inputs),
        out_specs=(out_spec, sft_spec),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*inputs)
    if axis == 1:
        return slices[:, :rows, :kdim], sft[:rows]
    return slices[:, :kdim, :rows], sft[:, :rows]


# ---------------------------------------------------------------------------
# Accurate-mode ('int8tc') kernels: per-row/col max exponent + 7-bit
# round-up magnitude extraction. The jnp mag7 path materializes the chunk
# intermediates to HBM (the ~50 ms/operand pattern the encode kernel was
# written to kill); these two kernels keep the whole extraction in VMEM.
# Reference: extract_A8i_cmpt_sftA_kernel, scaling.hpp:1508-1524.
# Both reductions are order-independent (max), so parity with the jnp
# accurate path is bit-exact, not probabilistic.
# ---------------------------------------------------------------------------

def emax_pallas(x, axis: int, block=None):
    """Per-row (axis=1) / per-col (axis=0) max biased exponent of a
    F64Bits / f32 operand, keepdims int32."""
    is64 = isinstance(x, F64Bits)
    d0, d1 = x.shape
    rows, kdim = (d0, d1) if axis == 1 else (d1, d0)
    if block is None:
        block = (512, 2048)   # max merge is order-independent: block
        # choice is pure tuning here (unlike fast_sft_pallas)
    br, bk = block
    rp, kp = _ceil_to(rows, br), _ceil_to(kdim, bk)
    grid = (rp // br, kp // bk)
    red = axis
    stat_shape = (br, 1) if axis == 1 else (1, br)

    def prep(arr):
        pad = ((0, rp - rows), (0, kp - kdim)) if axis == 1 \
            else ((0, kp - kdim), (0, rp - rows))
        return jnp.pad(arr, pad)

    if is64:
        inputs = (prep(x.hi), prep(x.lo))
    else:
        bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
        inputs = (prep(bits),)

    def kern(*refs):
        in_refs = refs[:len(inputs)]
        out_ref = refs[len(inputs)]
        e_acc = refs[-1]
        kk = pl.program_id(1)
        if is64:
            _, exp, _, normal = enc._f64_fields(in_refs[0][:], in_refs[1][:])
        else:
            _, exp, _, normal = enc._f32_fields(in_refs[0][:])
        e_blk = jnp.max(jnp.where(normal, exp, _I32(0)), axis=red,
                        keepdims=True)

        @pl.when(kk == 0)
        def _():
            e_acc[:] = e_blk

        @pl.when(kk > 0)
        def _():
            e_acc[:] = jnp.maximum(e_acc[:], e_blk)

        @pl.when(kk == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = e_acc[:]

    if axis == 1:
        data_spec = pl.BlockSpec((br, bk), lambda i, kk: (i, kk),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((br, 1), lambda i, kk: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((rp, 1), jnp.int32)
    else:
        data_spec = pl.BlockSpec((bk, br), lambda i, kk: (kk, i),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, br), lambda i, kk: (0, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((1, rp), jnp.int32)
    out = pl.pallas_call(
        kern, grid=grid,
        in_specs=[data_spec] * len(inputs),
        out_specs=out_spec, out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM(stat_shape, jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*inputs)
    return out[:rows] if axis == 1 else out[:, :rows]


def mag7_pallas(x, emax, axis: int, mag_shift: int = 5, block=None):
    """Round-up 7-bit magnitudes given the row/col emax: elementwise VMEM
    kernel over the operand, (m, k) int8 output (enc._extract_mag7)."""
    is64 = isinstance(x, F64Bits)
    mant_bits = 53 if is64 else 24
    m, k = x.shape
    if block is None:
        from . import launch

        block = launch.get("mag7")
    bm, bk = block
    mp, kp = _ceil_to(m, bm), _ceil_to(k, bk)
    grid = (mp // bm, kp // bk)

    def pad2(a):
        return jnp.pad(a, ((0, mp - m), (0, kp - k)))

    if axis == 1:
        emax_p = jnp.pad(emax, ((0, mp - m), (0, 0)))
        emax_spec = pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM)
    else:
        emax_p = jnp.pad(emax, ((0, 0), (0, kp - k)))
        emax_spec = pl.BlockSpec((1, bk), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM)

    if is64:
        inputs = (pad2(x.hi), pad2(x.lo), emax_p)

        def kern(hi_ref, lo_ref, e_ref, out_ref):
            chunks, exp, sign, normal = enc._f64_fields(hi_ref[:], lo_ref[:])
            out_ref[:] = enc._extract_mag7(chunks, exp, normal, e_ref[:],
                                           mant_bits, mag_shift)
    else:
        bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32),
                                            jnp.uint32)
        inputs = (pad2(bits), emax_p)

        def kern(bits_ref, e_ref, out_ref):
            chunks, exp, sign, normal = enc._f32_fields(bits_ref[:])
            out_ref[:] = enc._extract_mag7(chunks, exp, normal, e_ref[:],
                                           mant_bits, mag_shift)

    data_spec = pl.BlockSpec((bm, bk), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=grid,
        in_specs=[data_spec] * (len(inputs) - 1) + [emax_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((mp, kp), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*inputs)
    return out[:m, :k]


def mag7_fused_pallas(x, axis: int, mag_shift: int = 5,
                      block_rows: int | None = None):
    """Accurate-mode max-exponent AND 7-bit magnitude extraction in ONE
    kernel pass (full contraction extent resident; max is order-
    independent so blocking is bit-exact).

    MEASURED A WASH on v5e (8192^2: ax1 5.14 vs 4.62 ms two-kernel at
    br=128, ax0 4.59 vs 4.62; br<=64 fails Mosaic lowering) — the wide
    resident block costs the extraction what the saved read gains, the
    same mechanism that killed the fast-mode stats+encode fusion
    (PERF_NOTES.md). Kept opt-in via GEMMUL8_FUSED_MAG7=1.

    Returns (mag (d0,d1) int8, emax keepdims int32)."""
    is64 = isinstance(x, F64Bits)
    mant_bits = 53 if is64 else 24
    d0, d1 = x.shape
    rows, kdim = (d0, d1) if axis == 1 else (d1, d0)
    if block_rows is None:
        block_rows = 128    # smaller row blocks fail Mosaic lowering
    br = min(block_rows, rows)
    rp, kp = _ceil_to(rows, br), _ceil_to(kdim, 128)
    grid = (rp // br,)

    def prep(arr):
        pad = ((0, rp - rows), (0, kp - kdim)) if axis == 1 \
            else ((0, kp - kdim), (0, rp - rows))
        return jnp.pad(arr, pad)

    if is64:
        inputs = (prep(x.hi), prep(x.lo))
    else:
        bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
        inputs = (prep(bits),)

    def kern(*refs):
        in_refs = refs[:len(inputs)]
        mag_ref, e_ref = refs[len(inputs):]
        if is64:
            chunks, exp, sign, normal = enc._f64_fields(in_refs[0][:],
                                                        in_refs[1][:])
        else:
            chunks, exp, sign, normal = enc._f32_fields(in_refs[0][:])
        emax = jnp.max(jnp.where(normal, exp, _I32(0)), axis=axis,
                       keepdims=True)
        e_ref[:] = emax
        mag_ref[:] = enc._extract_mag7(chunks, exp, normal, emax,
                                       mant_bits, mag_shift)

    if axis == 1:
        data_spec = pl.BlockSpec((br, kp), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        e_spec = pl.BlockSpec((br, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        out_shape = (jax.ShapeDtypeStruct((rp, kp), jnp.int8),
                     jax.ShapeDtypeStruct((rp, 1), jnp.int32))
    else:
        data_spec = pl.BlockSpec((kp, br), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        e_spec = pl.BlockSpec((1, br), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        out_shape = (jax.ShapeDtypeStruct((kp, rp), jnp.int8),
                     jax.ShapeDtypeStruct((1, rp), jnp.int32))
    mag, emax = pl.pallas_call(
        kern, grid=grid,
        in_specs=[data_spec] * len(inputs),
        out_specs=(data_spec, e_spec),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*inputs)
    if axis == 1:
        return mag[:rows, :kdim], emax[:rows]
    return mag[:kdim, :rows], emax[:, :rows]


def mag7_operand_pallas(x, axis: int, mag_shift: int = 5):
    """(magnitudes int8, emax keepdims) for one operand — the Pallas
    counterpart of enc.mag7_f64 / enc.mag7_f32 (bit-exact). Two-kernel
    pair by default; GEMMUL8_FUSED_MAG7=1 opts into the measured-wash
    fused variant (see mag7_fused_pallas)."""
    if os.environ.get("GEMMUL8_FUSED_MAG7", "0") == "1":
        return mag7_fused_pallas(x, axis, mag_shift)
    emax = emax_pallas(x, axis)
    return mag7_pallas(x, emax, axis, mag_shift), emax


# ---------------------------------------------------------------------------
# Encode kernel
#
# The per-modulus residue dots sum_i chunk_i * (2^16i mod m_j) cost
# ~10 VPU ops x L per element. The MXU variant (GEMMUL8_MXU_ENC, default
# on) computes ALL of them as one int8 contraction per block — the mirror
# of the MXU-CRT reconstruct trick, on the input side:
#
#     Y ((L+1)*bm, bk) = W'' ((L+1)*bm, nb*bm) @ B (nb*bm, bk)
#
# B stacks the nb centered byte planes of the shifted significand along
# sublanes; W'' is block-diagonal of (2^(8i) mod m_j - 128) with a ones
# block row for the zero-point sum. raw_j = Y[j] + 128*S + C[j] then runs
# the same Barrett/center/sign tail, so residues are bit-identical to the
# chunk-dot path (the canonical residue is unique and both accs are
# exact).
# ---------------------------------------------------------------------------

# Tuned v5e default block (scripts/tune_kernels.py). Shared with the panel
# pipeline's B-split schedule, whose col_tiles units must match block[1]
# (that path pins this constant rather than the launch table).
ENC_BLOCK = (64, 512)
# MXU-path v5e block: minimal sublanes (the W'' redundancy prices at bm x),
# wide second dim (amortizes per-step overhead) — same shape logic as
# REC_MXU_BLOCK. Default dispatch goes through launch.get (device-keyed).
ENC_MXU_BLOCK = (8, 4096)


def mxu_enc_default() -> bool:
    """Whether encode_slices_pallas routes the residue dots through the
    MXU (GEMMUL8_MXU_ENC, default on). Read at trace time."""
    return os.environ.get("GEMMUL8_MXU_ENC", "1") == "1"


def _enc_mxu_consts(moduli_idx, nb: int, bm: int):
    """(W'' ((L+1)*bm, (nb+1)*bm) int8, C per-modulus int tuple) for the
    byte-plane residue contraction.

    Input planes are the nb bytes of the 8*nb-bit TWO'S COMPLEMENT of the
    signed shifted value (sign folded into the planes), plus a neg plane
    (0/1) whose weight cancels the 2^(8*nb) wraparound:
        v ≡ sum_i b_i*2^(8i) - neg*2^(8*nb)  (mod m).
    All planes centered by 128; the ones OUTPUT row yields
    S = sum_i (b_i - 128) for the zero-point correction
    C[j] = 128*sum_i wc[i,j] + 128^2*(nb+1)."""
    L = len(moduli_idx)
    npl = nb + 1
    wc = np.zeros((L + 1, npl), np.int64)
    for jj, j in enumerate(moduli_idx):
        m = int(tables.MODULI[j])
        for i in range(nb):
            wc[jj, i] = pow(2, 8 * i, m) - 128
        wc[jj, nb] = (m - pow(2, 8 * nb, m)) % m - 128   # neg-plane weight
    wc[L] = 1                    # ones row -> S = sum_i (b_i - 128)
    wp = np.kron(wc, np.eye(bm, dtype=np.int64)).astype(np.int8)
    c = tuple(int(128 * wc[jj].sum() + 128 * 128 * npl) for jj in range(L))
    return wp, c


def _encode_tile_mxu(chunks, exp, sign, normal, sft, w, num_moduli: int,
                     mant_bits: int, moduli_idx, consts, nb: int):
    """MXU counterpart of enc._encode_with_sft for one (bm, bk) tile:
    identical shifted-word construction, then two's-complement byte
    planes (sign folded in) contracted on the MXU, then a ZERO-FIXUP
    round-nearest Barrett straight to the centered residue. Residues are
    bit-identical to the VPU body (the centered representative mod an odd
    m is unique; exact integer algebra throughout).

    Zero-fixup proof (odd m <= 255, raw < 2^20):
      raw = v mod' m-ish accumulator <= (nb+1)*255*(m-1) < 2^20, so
      f32(raw) is EXACT. With rinv = fl(1/m) and c = 0.5 - 2^-10:
      t = raw/m <= (nb+1)*255 < 2^12, so the product and sum roundings
      total < 5.1e-4 < 2^-10, and 2^-10 + 5.1e-4 < 1/(2m) (>= 1/510).
      t + 0.5 is never closer than 1/(2m) to an integer (no ties for odd
      m), hence floor(fl(fl(raw*rinv) + c)) == round(raw/m) ALWAYS:
      r = raw - q*m lands centered in [-(m-1)/2, (m-1)/2] with no fixups.
    """
    mant_shift = 1075 if mant_bits == 53 else 150
    q = exp - _I32(mant_shift) + sft
    t_a = tables.threshold_accurate(num_moduli)
    q_max_static = max(t_a - 1 - (mant_bits - 1), 0)
    words = enc._shifted_value_words(chunks, q, mant_bits, q_max_static)
    bm, bk = q.shape
    neg = (sign == 1)
    # two's complement of the magnitude words where neg (carry ripples
    # only while lower words are zero); the low 8*nb bits equal
    # (2^(8*nb) - |v|) mod 2^(8*nb) regardless of word count
    _U = jnp.uint32
    nwords = []
    zlow = None
    for wv in words:
        if zlow is None:
            nwords.append(~wv + _U(1))
            zlow = wv == 0
        else:
            nwords.append(~wv + zlow.astype(_U))
            zlow = zlow & (wv == 0)
    # zlow now == "all words zero": a negative input whose truncated
    # magnitude is 0 (e.g. tiny values truncated away by the shift) has
    # NO two's-complement wraparound — its neg plane must stay 0
    neg_eff = neg & ~zlow
    words = [jnp.where(neg, nv, wv) for nv, wv in zip(nwords, words)]
    # centered byte planes along sublanes: ((nb+1)*bm, bk) int8. The int8
    # cast truncates to the low byte, so no & 0xFF is needed; ^ 0x80 is
    # the (b - 128) bit pattern. Last plane: neg as 0/1.
    planes = []
    for i in range(nb):
        w32 = words[i // 4]
        b = (w32 >> jnp.uint32(8 * (i % 4))) if i % 4 else w32
        planes.append((b ^ jnp.uint32(0x80)).astype(jnp.int8))
    planes.append((neg_eff.astype(_U) ^ jnp.uint32(0x80)).astype(jnp.int8))
    rc2 = jnp.concatenate(planes, axis=0)
    y = jax.lax.dot_general(w, rc2, (((1,), (0,)), ((), ())),
                            preferred_element_type=_I32)
    L = len(moduli_idx)
    y3 = y.reshape(L + 1, bm, bk)
    s128 = y3[L] * _I32(128)
    # No per-modulus `normal` masking: a zero input (the only ~normal
    # case; inf/nan are UB) has all-zero words and neg_eff false, so every
    # plane byte is 0, raw collapses to exactly 0 (the constants cancel by
    # construction), and both the 256 path and the round-nearest Barrett
    # map raw = 0 to the centered residue 0.
    out = []
    for jj, j in enumerate(moduli_idx):
        m = int(tables.MODULI[j])
        raw = y3[jj] + s128 + _I32(consts[jj])   # exact, ≡ v (mod m), >= 0
        if m == 256:
            # two's-complement wraparound: raw IS the signed value's low
            # byte (2^8i mod 256 == 0 for i >= 1, neg weight == 0)
            rc = (raw ^ _I32(0x80)) - _I32(0x80)
        else:
            qf = (raw.astype(jnp.float32) * jnp.float32(1.0 / m)
                  + jnp.float32(0.5 - 2.0 ** -10)).astype(_I32)
            rc = raw - qf * _I32(m)              # centered, no fixups
        out.append(rc.astype(jnp.int8))
    return jnp.stack(out, axis=0)


def encode_slices_pallas(x, sft, num_moduli: int, axis: int,
                         moduli_idx=None, block=None, col_tiles=None,
                         mxu: bool | None = None):
    """Residue slices via a fused VMEM kernel. x: F64Bits or f32 array
    (2D); sft: keepdims shift from the stats pass ((m,1) for axis=1,
    (1,k) for axis=0). Returns (L, m, k) int8.

    col_tiles: optional (j0, j1) tile range (units of block[1]) along x's
    second dim — the grid covers only those column tiles but the output
    keeps the FULL (L, m, k) shape, leaving the other columns
    uninitialized. Used by the panel pipeline's B-split schedule
    (pallas/pipelined.py), which fills the remainder through an aliased
    rider write inside the first panel's matmul (and whose tile units
    assume ENC_BLOCK, so col_tiles forces the VPU path).

    mxu (default: GEMMUL8_MXU_ENC env, on) runs the per-modulus residue
    dots as one int8 MXU contraction per block (bit-identical output)."""
    is64 = isinstance(x, F64Bits)
    m, k = x.shape
    if mxu is None:
        mxu = mxu_enc_default()
    mxu = mxu and col_tiles is None
    if block is None:
        if col_tiles is not None:
            block = ENC_BLOCK   # pipelined B-split tile-unit contract
        else:
            from . import launch

            block = launch.get("enc_mxu" if mxu else "enc_vpu")
    bm, bk = block
    bm, bk = min(bm, _ceil_to(m, 8)), min(bk, _ceil_to(k, 128))
    mp, kp = _ceil_to(m, bm), _ceil_to(k, bk)
    j0 = 0 if col_tiles is None else col_tiles[0]
    grid = (mp // bm,
            kp // bk if col_tiles is None else col_tiles[1] - col_tiles[0])
    n_out = num_moduli if moduli_idx is None else len(moduli_idx)
    mant_bits = 53 if is64 else 24
    if mxu:
        assert bm % 8 == 0, "sublane concat needs bm % 8 == 0"
        idx = tuple(range(num_moduli)) if moduli_idx is None \
            else tuple(moduli_idx)
        q_max_static = max(
            tables.threshold_accurate(num_moduli) - 1 - (mant_bits - 1), 0)
        nb = (mant_bits + 1 + q_max_static + 7) // 8
        wp, consts = _enc_mxu_consts(idx, nb, bm)

    def body(fields, sft_v, w_v=None):
        chunks, exp, sign, normal = fields
        if mxu:
            return _encode_tile_mxu(chunks, exp, sign, normal, sft_v, w_v,
                                    num_moduli, mant_bits, idx, consts, nb)
        return enc._encode_with_sft(chunks, exp, sign, normal, sft_v,
                                    num_moduli, mant_bits, moduli_idx)

    def pad2(a):
        return jnp.pad(a, ((0, mp - m), (0, kp - k)))

    if axis == 1:  # row shifts (m, 1)
        sft_p = jnp.pad(sft, ((0, mp - m), (0, 0)))
        sft_spec = pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)
    else:          # column shifts (1, k)
        sft_p = jnp.pad(sft, ((0, 0), (0, kp - k)))
        sft_spec = pl.BlockSpec((1, bk), lambda i, j: (0, j + j0),
                                memory_space=pltpu.VMEM)

    if is64:
        inputs = (pad2(x.hi), pad2(x.lo), sft_p)

        if mxu:
            def kern(hi_ref, lo_ref, sft_ref, w_ref, out_ref):
                out_ref[:] = body(enc._f64_fields(hi_ref[:], lo_ref[:]),
                                  sft_ref[:], w_ref[:])
        else:
            def kern(hi_ref, lo_ref, sft_ref, out_ref):
                out_ref[:] = body(enc._f64_fields(hi_ref[:], lo_ref[:]),
                                  sft_ref[:])
    else:
        bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32),
                                            jnp.uint32)
        inputs = (pad2(bits), sft_p)

        if mxu:
            def kern(bits_ref, sft_ref, w_ref, out_ref):
                out_ref[:] = body(enc._f32_fields(bits_ref[:]), sft_ref[:],
                                  w_ref[:])
        else:
            def kern(bits_ref, sft_ref, out_ref):
                out_ref[:] = body(enc._f32_fields(bits_ref[:]), sft_ref[:])

    data_spec = pl.BlockSpec((bm, bk), lambda i, j: (i, j + j0),
                             memory_space=pltpu.VMEM)
    in_specs = [data_spec] * (len(inputs) - 1) + [sft_spec]
    if mxu:
        in_specs = in_specs + [pl.BlockSpec(wp.shape, lambda i, j: (0, 0),
                                            memory_space=pltpu.VMEM)]
        inputs = inputs + (jnp.asarray(wp),)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_out, bm, bk), lambda i, j: (0, i, j + j0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, mp, kp), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*inputs)
    return out[:, :m, :k]


# ---------------------------------------------------------------------------
# Reconstruct kernel: mod-reduce + CRT limb accumulate + mod-M + rounding,
# all fused.
#
# The CRT weighted accumulation X = sum_j w_j * r_j costs ~2*L*nl int32
# VPU ops per output element (~196 at 14 moduli) — measured ~11 of the
# ~14.8 ms reconstruct phase at 8192^2 (PERF_NOTES.md). The MXU variant
# (GEMMUL8_MXU_CRT, default on) computes it as ONE int8 MXU contraction
# per block instead:
#
#     Y ((nd+1)*bm, bn) = W' ((nd+1)*bm, L*bm) @ R (L*bm, bn)
#
# R is the residue block (L, bm, bn) centered to int8 (r - 128) and
# collapsed along sublanes (free when bm % 8 == 0: each modulus slice is
# whole (8, 128) tiles, so the collapse is a layout no-op). W' is a
# compile-time block-diagonal matrix whose (d, j) block is
# (byte d of w_j - 128) * I_bm, plus a ones block row that yields
# S = sum_j (r_j - 128) for the zero-point fixup:
#
#     X[d] = sum_j r_j * wbyte[j, d] = Y[d] + 128 * S + C[d]
#
# with C[d] = 128 * sum_j (wbyte[j,d] - 128) + 128^2 * L a python-int
# constant. 16-bit limbs then assemble from byte-digit pairs:
# x[l] = Y[2l] + (Y[2l+1] << 8) + 32896 * S + CL[l] — ~5 VPU ops per limb
# instead of ~2L. The identity-block redundancy prices the contraction at
# (nd+1)*L*bm MACs per element (~30 G at bm=8, 8192^2, 14 moduli):
# noise for the MXU. Exact integer math throughout, so the canonical
# limb list is BIT-IDENTICAL to accumulate_weighted's.
# ---------------------------------------------------------------------------

def _crt_mxu_consts(num_moduli: int, bm: int):
    """(W' ((nd+1)*bm, L*bm) int8 ndarray, CL limb-correction tuple[int]).

    W' rows d*bm..(d+1)*bm-1 select byte-digit d of the weighted sum; the
    last block row (all-ones diagonal) yields S. See the block comment
    above for the algebra."""
    w16 = np.asarray(tables.crt_weight_limbs(num_moduli), dtype=np.int64)
    L, nl = w16.shape
    nd = 2 * nl
    wb = np.zeros((nd + 1, L), np.int64)
    for l in range(nl):
        wb[2 * l] = w16[:, l] & 0xFF
        wb[2 * l + 1] = (w16[:, l] >> 8) & 0xFF
    wc = wb - 128
    wc[nd] = 1                      # ones row: S, no zero-point semantics
    wp = np.kron(wc, np.eye(bm, dtype=np.int64)).astype(np.int8)
    c = 128 * wc[:nd].sum(axis=1) + 128 * 128 * L
    cl = tuple(int(c[2 * l] + (c[2 * l + 1] << 8)) for l in range(nl))
    return wp, cl


def _crt_accumulate_mxu(rc2, w, num_moduli: int, cl, bm: int, bn: int):
    """Canonical 16-bit limbs of X = sum_j w_j * r_j from the centered
    residue matrix rc2 (L*bm, bn) int8 via the W' contraction. Exact:
    bit-identical to rec.accumulate_weighted."""
    nl = len(cl)
    nd = 2 * nl
    y = jax.lax.dot_general(w, rc2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y3 = y.reshape(nd + 1, bm, bn)
    t = y3[nd] * _I32(32896)        # 128*(1+256)*S, shared by every limb
    # |Y[d]| <= L*128^2, X parts < 2^28, t < 2^27, consts < 2^27: limb
    # sums fit int32 (< 2^29 each). Returned REDUNDANT (no carry pass):
    # rec._mod_m_centered's quotient estimate tolerates limbs < 2^29
    # (see its budget comment) and its scale_const_sub pass canonicalizes
    # anyway — skipping carry_propagate here saves a full limb pass.
    return [y3[2 * l] + (y3[2 * l + 1] << 8) + t + _I32(cl[l])
            for l in range(nl)]


def _centered_residues(c32, num_moduli: int):
    """(L*bm, bn) int8 centered canonical residues from a (L, bm, bn)
    block of int8 pre-centered residues (the matmul's centered=True
    epilogue: pure reshape), uint8 canonical residues (bit trick), or
    int32 raw slice products (Barrett-reduce first, as the VPU body
    does)."""
    L, bm, bn = c32.shape
    if c32.dtype == jnp.int8:
        return c32.reshape(L * bm, bn)
    if c32.dtype == jnp.uint8:
        rc = jax.lax.bitcast_convert_type(c32 ^ jnp.uint8(0x80), jnp.int8)
        return rc.reshape(L * bm, bn)
    parts = []
    for j in range(num_moduli):
        mj = int(tables.MODULI[j])
        rj = (c32[j] & _I32(255)) if mj == 256 else mod_i32(c32[j], mj)
        parts.append((rj - 128).astype(jnp.int8))
    return jnp.concatenate(parts, axis=0)


def mxu_crt_default() -> bool:
    """Whether reconstruct_pallas routes the CRT accumulation through the
    MXU (GEMMUL8_MXU_CRT, default on). Read at trace time."""
    return os.environ.get("GEMMUL8_MXU_CRT", "1") == "1"


def _rec_body(c32, sft_a, sft_b, num_moduli, out_kind, input_kind="residues",
              e_extra: int = 0):
    if input_kind == "limbs":
        # canonical 16-bit limbs of the weighted CRT sum, straight from the
        # fused matmul epilogue (matmul_crt_pallas) — skip accumulation
        x = [c32[i] for i in range(c32.shape[0])]
        return _finalize_tile(x, sft_a, sft_b, num_moduli, out_kind,
                              e_extra=e_extra)
    if c32.dtype == jnp.int8:
        # pre-centered residues (matmul centered=True epilogue)
        r = [c32[j].astype(_I32) + _I32(128) for j in range(num_moduli)]
    elif c32.dtype == jnp.uint8:
        # canonical residues from the fused-matmul epilogue
        r = [c32[j].astype(_I32) for j in range(num_moduli)]
    else:
        r = []
        for j in range(num_moduli):
            mj = int(tables.MODULI[j])
            if mj == 256:
                r.append(c32[j] & _I32(255))
            else:
                r.append(mod_i32(c32[j], mj))
    x = rec.accumulate_weighted(jnp.stack(r, 0), num_moduli)
    return _finalize_tile(x, sft_a, sft_b, num_moduli, out_kind,
                          e_extra=e_extra)


def _finalize_tile(x, sft_a, sft_b, num_moduli, out_kind, e_fix=None,
                   e_extra: int = 0):
    """mod-M centering + inverse scaling + IEEE rounding from canonical
    weighted-sum limbs (the tail every reconstruct body shares).
    e_fix overrides the -(sft_a + sft_b) exponent (the column-strip tail
    passes a pre-broadcast slice: Mosaic rejects lane-offset slices of a
    (1, bn) operand inside a broadcast add). e_extra is the static
    power-of-two-alpha exponent folded into the inverse scaling (see
    rec.reconstruct)."""
    if e_fix is None:
        e_fix = _I32(e_extra) - (sft_a + sft_b)
    elif e_extra:
        e_fix = e_fix + _I32(e_extra)
    mag, negf = rec._mod_m_centered(x, num_moduli)
    if out_kind == "f64":
        eb, mant = rec._round_to_float(mag, negf, e_fix, 53)
        out = rec._assemble_f64(negf, eb, mant)
        return out.hi, out.lo
    eb, mant = rec._round_to_float(mag, negf, e_fix, 24)
    return (rec._assemble_f32(negf, eb, mant),)


# Tuned MXU-path block (scripts/tune_kernels.py recon, v5e 8192^2/14):
# the W' contraction prices redundancy at bm x, so the minimal sublane
# block wins; a wide bn amortizes the per-step overhead. Measured 7.7-9.1
# ms vs 11.4-14.8 for the best VPU blocks (run-to-run spread ~±1 ms).
# Powers of two only: a bn that does not divide n pads the grid (e.g.
# 3072 at n=8192 re-ran 14.7 ms purely from the +12% padded columns).
REC_MXU_BLOCK = (8, 4096)


def reconstruct_pallas(c32, sft_a, sft_b, num_moduli: int, out_kind: str,
                       block=None, input_kind: str = "residues",
                       mxu: bool | None = None, tail_chunk: int = 0,
                       e_extra: int = 0):
    """Fused mod-reduce + CRT + inverse scaling. c32: (L, m, n) int32 slice
    products / uint8 residues, or (num_limbs, m, n) canonical limbs when
    input_kind="limbs"; sft_a (m,1), sft_b (1,n). Returns F64Bits or f32.

    mxu (default: GEMMUL8_MXU_CRT env, on) routes the CRT weighted
    accumulation through an int8 MXU contraction (see _crt_mxu_consts) —
    bit-identical output, ~1/3 the VPU ops. Only applies to the
    "residues" input kind (the "limbs" input already skipped it).

    tail_chunk > 0 (MXU path only) runs the mod-M + rounding tail in
    column strips of that width inside the kernel body: the tail holds
    ~20 live tile-sized buffers, which spill to VMEM at full block width;
    strips sized to the vector register file keep the whole chain
    register-resident (same math, bit-identical)."""
    L, m, n = c32.shape
    if mxu is None:
        mxu = mxu_crt_default()
    mxu = mxu and input_kind == "residues"
    if block is None:
        from . import launch

        block = launch.get("rec_mxu" if mxu else "rec_vpu")
    bm, bn = block
    # shrink for small problems (the defaults target the headline sizes)
    bm, bn = min(bm, _ceil_to(m, 8)), min(bn, _ceil_to(n, 128))
    if tail_chunk and (not mxu or bn % tail_chunk):
        tail_chunk = 0
    if mxu:
        assert bm % 8 == 0, "sublane collapse needs bm % 8 == 0"
        wp, cl = _crt_mxu_consts(num_moduli, bm)
    mp, np_ = _ceil_to(m, bm), _ceil_to(n, bn)
    c32p = jnp.pad(c32, ((0, 0), (0, mp - m), (0, np_ - n)))
    sfta_p = jnp.pad(sft_a, ((0, mp - m), (0, 0)))
    sftb_p = jnp.pad(sft_b, ((0, 0), (0, np_ - n)))
    grid = (mp // bm, np_ // bn)
    in_specs = [
        pl.BlockSpec((L, bm, bn), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    tile_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    inputs = (c32p, sfta_p, sftb_p)
    if mxu:
        # W' rides as a VMEM-resident input (constant index map); baking a
        # 200 KB arbitrary constant into the kernel body is not supported
        in_specs = [pl.BlockSpec(wp.shape, lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM)] + in_specs
        inputs = (jnp.asarray(wp),) + inputs

    def body(c, sa, sb, w=None):
        if mxu:
            rc2 = _centered_residues(c, num_moduli)
            x = _crt_accumulate_mxu(rc2, w, num_moduli, cl, bm, bn)
            return _finalize_tile(x, sa, sb, num_moduli, out_kind,
                                  e_extra=e_extra)
        return _rec_body(c, sa, sb, num_moduli, out_kind, input_kind,
                         e_extra)

    def chunked_write(c, sa, sb, w, out_refs):
        # per-strip ref writes: the tail chain stays register-resident
        rc2 = _centered_residues(c, num_moduli)
        x = _crt_accumulate_mxu(rc2, w, num_moduli, cl, bm, bn)
        ef = _I32(e_extra) - (sa + sb)  # broadcast once; strips slice it
        for c0 in range(0, bn, tail_chunk):
            xs = [xl[:, c0:c0 + tail_chunk] for xl in x]
            outs = _finalize_tile(xs, sa, sb, num_moduli, out_kind,
                                  e_fix=ef[:, c0:c0 + tail_chunk])
            for ref, val in zip(out_refs, outs):
                ref[:, c0:c0 + tail_chunk] = val

    if out_kind == "f64":
        if mxu and tail_chunk:
            def kern(w_ref, c_ref, sa_ref, sb_ref, hi_ref, lo_ref):
                chunked_write(c_ref[:], sa_ref[:], sb_ref[:], w_ref[:],
                              (hi_ref, lo_ref))
        elif mxu:
            def kern(w_ref, c_ref, sa_ref, sb_ref, hi_ref, lo_ref):
                hi, lo = body(c_ref[:], sa_ref[:], sb_ref[:], w_ref[:])
                hi_ref[:] = hi
                lo_ref[:] = lo
        else:
            def kern(c_ref, sa_ref, sb_ref, hi_ref, lo_ref):
                hi, lo = body(c_ref[:], sa_ref[:], sb_ref[:])
                hi_ref[:] = hi
                lo_ref[:] = lo

        hi, lo = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs,
            out_specs=(tile_spec, tile_spec),
            out_shape=(jax.ShapeDtypeStruct((mp, np_), jnp.uint32),
                       jax.ShapeDtypeStruct((mp, np_), jnp.uint32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_interpret(),
        )(*inputs)
        return F64Bits(hi[:m, :n], lo[:m, :n])

    if mxu and tail_chunk:
        def kern32(w_ref, c_ref, sa_ref, sb_ref, o_ref):
            chunked_write(c_ref[:], sa_ref[:], sb_ref[:], w_ref[:],
                          (o_ref,))
    elif mxu:
        def kern32(w_ref, c_ref, sa_ref, sb_ref, o_ref):
            (o_ref[:],) = body(c_ref[:], sa_ref[:], sb_ref[:], w_ref[:])
    else:
        def kern32(c_ref, sa_ref, sb_ref, o_ref):
            (o_ref[:],) = body(c_ref[:], sa_ref[:], sb_ref[:])

    o = pl.pallas_call(
        kern32, grid=grid, in_specs=in_specs, out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*inputs)
    return o[:m, :n]
