"""Fused slice-matmul + CRT-reconstruct megakernel.

The headline 8192^3 call spends ~43 ms on MXU matmuls and ~15 ms of
SERIAL VPU work reconstructing from the residue tensor (plus ~2.4 ms of
HBM round trip for the (L, m, n) residues). On TPU, kernels execute one
at a time per core — but WITHIN a kernel, vector ops that do not consume
an in-flight matmul's result overlap with the MXU. This kernel exploits
that with software pipelining across grid steps:

  grid = (T+1, L) over output tiles x moduli, moduli innermost.
  step (t, l), t < T: issue the int8 matmul of tile t, modulus l into a
      parity-indexed VMEM accumulator (acc[g], g = (t*L+l) % 2).
  Barrett rider at (t, l): mod-reduce the PREVIOUS step's accumulator
      acc[1-g] (tile/modulus of step (t,l)-1) to a canonical uint8
      residue in VMEM — no dependency on the in-flight matmul, so the
      VPU work hides behind it. (In matmul_mod_u8_pallas the epilogue
      reads the accumulator its own step just filled, which serializes
      VPU after MXU — the measured 9-15% shortfall from int8 peak.)
  Finalize riders at (t, l < nchunks): CRT-accumulate + mod-M center +
      round-to-float one row-chunk of tile t-1 (whose residues completed
      at step (t, 0)), writing the output block mapped to tile t-1.
  The trailing grid step t = T runs only riders (flushes the last tile).

Residues never touch HBM: the (L, bm, bn) uint8 residue tile lives in a
tile-parity-indexed VMEM scratch. Reconstruction math is the exact same
code reconstruct_pallas runs (core.reconstruct), so results are
bit-identical to the unfused pipeline — asserted by tests.

Reference mapping: this fuses the reference's phases 2-4 (cublasGemmEx
loop, conv_32i_2_8u, inverse_scaling — gemmul8.cu:259-292) into one
launch; the reference serializes them with device syncs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables
from ..core import reconstruct as rec
from ..types import F64Bits
from .matmul import barrett_fixup_params

_I32 = jnp.int32


def _ceil_to(x, a):
    return (x + a - 1) // a * a


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_nchunks(bm: int, num_moduli: int) -> int:
    """Row-chunk count for the finalize riders: a power of two dividing bm
    (chunks are static slices), at most num_moduli (rider slots per tile)
    and at most 8 (smaller chunks spread the VPU work more evenly)."""
    nchunks = 8
    while nchunks > 1 and (nchunks > num_moduli or bm % nchunks
                           or (bm // nchunks) % 8):
        nchunks //= 2
    return nchunks


def matmul_reconstruct_pallas(a8: jax.Array, b8: jax.Array,
                              sft_a: jax.Array, sft_b: jax.Array,
                              num_moduli: int, out_kind: str,
                              block=(1024, 1024)):
    """(L, m, k) int8 x (L, k, n) int8 + shifts -> F64Bits / f32 (m, n).

    Requires the full contraction dim resident per tile (k*bm + k*bn int8
    must fit VMEM alongside the residue scratch — callers gate on k)."""
    L, m, k = a8.shape
    _, _, n = b8.shape
    assert L == num_moduli
    bm, bn = block
    bm, bn = min(bm, _ceil_to(m, 128)), min(bn, _ceil_to(n, 128))
    mp, np_ = _ceil_to(m, bm), _ceil_to(n, bn)
    mi, nj = mp // bm, np_ // bn
    T = mi * nj
    a8p = jnp.pad(a8, ((0, 0), (0, mp - m), (0, 0)))
    b8p = jnp.pad(b8, ((0, 0), (0, 0), (0, np_ - n)))
    sfta_p = jnp.pad(sft_a, ((0, mp - m), (0, 0)))
    sftb_p = jnp.pad(sft_b, ((0, 0), (0, np_ - n)))
    mods = jnp.asarray(tables.MODULI[:L], jnp.int32)
    recips = jnp.asarray([1.0 / mm for mm in tables.MODULI[:L]], jnp.float32)
    bias, fix_steps = barrett_fixup_params(k, tuple(range(L)))
    nchunks = _pick_nchunks(bm, L)
    rows_per = bm // nchunks
    grid = (T + 1, L)

    # tile coords as index-map helpers (prev = the tile the riders and the
    # output block refer to; clamped at the first step where none exists)
    def cur_i(t):
        tt = jnp.minimum(t, T - 1)
        return tt // nj

    def cur_j(t):
        tt = jnp.minimum(t, T - 1)
        return jax.lax.rem(tt, jnp.int32(nj))

    def prev_i(t):
        tp = jnp.clip(t - 1, 0, T - 1)
        return tp // nj

    def prev_j(t):
        tp = jnp.clip(t - 1, 0, T - 1)
        return jax.lax.rem(tp, jnp.int32(nj))

    def kern(mods_ref, recips_ref, a_ref, b_ref, sa_ref, sb_ref, *refs):
        if out_kind == "f64":
            hi_ref, lo_ref, acc0_ref, acc1_ref, res_ref = refs
        else:
            (o_ref, acc0_ref, acc1_ref, res_ref) = refs
        t = pl.program_id(0)
        l = pl.program_id(1)
        g = jax.lax.rem(t * jnp.int32(L) + l, jnp.int32(2))

        # accumulator slots are STATICALLY dual-banked (duplicated matmul
        # sites under pl.when): a dynamically indexed destination forces a
        # materialize+copy instead of the MXU writing the bank directly
        @pl.when((t < T) & (g == 0))
        def _():
            acc0_ref[:] = jax.lax.dot_general(
                a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        @pl.when((t < T) & (g == 1))
        def _():
            acc1_ref[:] = jax.lax.dot_general(
                a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        # ---- Barrett rider: previous step's accumulator -> uint8 residue
        had_prev_mm = ((l > 0) & (t < T)) | ((l == 0) & (t > 0))

        def _barrett(src_ref):
            lp = jnp.where(l > 0, l - 1, L - 1)
            tp = jnp.where(l > 0, t, t - 1)
            mj = mods_ref[lp]
            rj = recips_ref[lp]
            x = src_ref[:]
            q = jnp.floor(x.astype(jnp.float32) * rj
                          - jnp.float32(bias)).astype(_I32)
            r = x - q * mj
            for s in fix_steps:
                r = r - jnp.where(r >= s * mj, s * mj, _I32(0))
            bank = jax.lax.rem(tp, jnp.int32(2)) * jnp.int32(L)
            res_ref[pl.ds(bank + lp, 1)] = r.astype(jnp.uint8)[None]

        @pl.when(had_prev_mm & (g == 0))
        def _():
            _barrett(acc1_ref)

        @pl.when(had_prev_mm & (g == 1))
        def _():
            _barrett(acc0_ref)

        # ---- finalize riders: row chunk l of tile t-1 (all residues of
        # tile t-1 are in res_ref[(t-1)%2] after this step's Barrett rider)
        @pl.when((t > 0) & (l < nchunks))
        def _():
            pb = jax.lax.rem(t - 1, jnp.int32(2)) * jnp.int32(L)
            rows = pl.ds(l * rows_per, rows_per)
            r = jnp.concatenate(
                [res_ref[pl.ds(pb + j, 1), rows, :].astype(_I32)
                 for j in range(L)], axis=0)
            x = rec.accumulate_weighted(r, L)
            e_fix = -(sa_ref[rows, :] + sb_ref[:])
            mag, negf = rec._mod_m_centered(x, L)
            if out_kind == "f64":
                eb, mant = rec._round_to_float(mag, negf, e_fix, 53)
                out = rec._assemble_f64(negf, eb, mant)
                hi_ref[rows, :] = out.hi
                lo_ref[rows, :] = out.lo
            else:
                eb, mant = rec._round_to_float(mag, negf, e_fix, 24)
                o_ref[rows, :] = rec._assemble_f32(negf, eb, mant)

    in_specs = [
        pl.BlockSpec((1, bm, k), lambda t, l, *refs: (l, cur_i(t), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k, bn), lambda t, l, *refs: (l, 0, cur_j(t)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda t, l, *refs: (prev_i(t), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda t, l, *refs: (0, prev_j(t)),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((bm, bn),
                            lambda t, l, *refs: (prev_i(t), prev_j(t)),
                            memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((bm, bn), jnp.int32),
               pltpu.VMEM((bm, bn), jnp.int32),
               pltpu.VMEM((2 * L, bm, bn), jnp.uint8)]
    if out_kind == "f64":
        out_specs = (out_spec, out_spec)
        out_shapes = (jax.ShapeDtypeStruct((mp, np_), jnp.uint32),
                      jax.ShapeDtypeStruct((mp, np_), jnp.uint32))
    else:
        out_specs = out_spec
        out_shapes = jax.ShapeDtypeStruct((mp, np_), jnp.float32)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * mp * np_ * k,
            bytes_accessed=T * L * (bm * k + k * bn) + mp * np_ * 8,
            transcendentals=0),
        interpret=_interpret(),
    )(mods, recips, a8p, b8p, sfta_p, sftb_p)
    if out_kind == "f64":
        return F64Bits(out[0][:m, :n], out[1][:m, :n])
    return out[:m, :n]


def fused_reconstruct_ok(m: int, n: int, k: int, num_moduli: int,
                        block=(1024, 1024)) -> bool:
    """Gate: the megakernel holds bm*k + k*bn int8 operand tiles, the
    2-deep accumulator, and the 2L residue tiles in VMEM. Stay under
    ~100 MB with double-buffered operand streams."""
    bm = min(block[0], _ceil_to(m, 128))
    bn = min(block[1], _ceil_to(n, 128))
    operand = 2 * (bm * k + k * bn)          # double-buffered int8 streams
    acc = 2 * bm * bn * 4
    resid = 2 * num_moduli * bm * bn
    outb = 2 * bm * bn * 8
    return operand + acc + resid + outb < 100 * 1024 * 1024
