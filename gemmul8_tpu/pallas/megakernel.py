"""Fused slice-matmul + CRT-reconstruct megakernel.

The headline 8192^3 call spends ~43 ms on MXU matmuls and ~15 ms of
SERIAL VPU work reconstructing from the residue tensor (plus ~2.4 ms of
HBM round trip for the (L, m, n) residues). On TPU, kernels execute one
at a time per core — but WITHIN a kernel, vector ops that do not consume
an in-flight matmul's result overlap with the MXU. This kernel exploits
that with software pipelining across grid steps:

  grid = (T+1, L, KK) over output tiles x moduli x k-chunks.
  The k-chunk dimension exists for TWO measured reasons (bisect probes,
  4096^3): (a) without it each step streams bm*k + k*bn operand bytes
  per full-k matmul — ~550 GB/s of sustained HBM demand at (512,1024),
  which stalls the MXU (matmul-only ran 10 ms vs the 5.4 ms floor);
  with bk=2048 chunks the demand drops under ~370 GB/s and small blocks
  leave VMEM headroom for real double-buffering. (b) It multiplies the
  rider slots per tile by KK, so finalize row-chunks shrink below one
  step's MXU time — a chunk that exceeds the step cannot hide by
  construction (the measured +4.6 ms).

  step (t, l, kk), t < T: accumulate the int8 matmul chunk into a
      parity-banked VMEM accumulator (bank (t*L+l) % 2, STATIC dual
      refs — a dynamically indexed destination forces a copy).
  Barrett rider at kk==1: mod-reduce the OTHER bank (modulus l-1 /
      previous tile's last modulus), finished >= 2 steps ago so the MXU
      pipeline never stalls on it, into uint8 residues in VMEM.
      (In matmul_mod_u8_pallas the epilogue reads the accumulator its
      own step just filled, which serializes VPU after MXU — the
      measured 9-15% shortfall from int8 peak. Bisect: this rider is
      FREE — matmul-only and matmul+Barrett time identical.)
  Finalize riders at kk in [2, KK): CRT-accumulate + mod-M center +
      round-to-float one row-chunk of tile t-1 (whose residues complete
      at step (t, 0, *)), writing the output block mapped to tile t-1.
  The trailing grid step t = T runs only riders (flushes the last tile).

Residues never touch HBM: the (L, bm, bn) uint8 residue tile lives in a
tile-parity-banked VMEM scratch. Reconstruction math is the exact same
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

from ..core import reconstruct as rec
from ..types import F64Bits
from .matmul import barrett_fixup_params, barrett_reduce, \
    moduli_consts

_I32 = jnp.int32


def _ceil_to(x, a):
    return (x + a - 1) // a * a


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_nchunks(bm: int, slots: int) -> int:
    """Finalize row-chunk count: a power of two dividing bm into
    8-aligned chunks, bounded by the rider slots available per tile.
    More chunks = less VPU work per slot = better hiding."""
    nchunks = 16
    while nchunks > 1 and (nchunks > slots or bm % nchunks
                           or (bm // nchunks) % 8):
        nchunks //= 2
    return nchunks


def matmul_reconstruct_pallas(a8: jax.Array, b8: jax.Array,
                              sft_a: jax.Array, sft_b: jax.Array,
                              num_moduli: int, out_kind: str,
                              block=(1024, 1024, 2048)):
    """(L, m, k) int8 x (L, k, n) int8 + shifts -> F64Bits / f32 (m, n)."""
    L, m, k = a8.shape
    _, _, n = b8.shape
    assert L == num_moduli
    if len(block) == 2:    # (bm, bn): default k-chunking
        block = (*block, 2048)
    bm, bn, bk = block
    bm, bn = min(bm, _ceil_to(m, 128)), min(bn, _ceil_to(n, 128))
    bk = min(bk, _ceil_to(k, 128))
    mp, np_ = _ceil_to(m, bm), _ceil_to(n, bn)
    kp = _ceil_to(k, bk)
    mi, nj = mp // bm, np_ // bn
    KK = kp // bk
    T = mi * nj
    a8p = jnp.pad(a8, ((0, 0), (0, mp - m), (0, kp - k)))
    b8p = jnp.pad(b8, ((0, 0), (0, kp - k), (0, np_ - n)))
    sfta_p = jnp.pad(sft_a, ((0, mp - m), (0, 0)))
    sftb_p = jnp.pad(sft_b, ((0, 0), (0, np_ - n)))
    mods, recips = moduli_consts(range(L))
    bias, fix_steps = barrett_fixup_params(kp, tuple(range(L)))
    # rider slot budget per tile for the finalize chunks
    fin_slots = L * (KK - 2) if KK >= 3 else L
    nchunks = _pick_nchunks(bm, fin_slots)
    rows_per = bm // nchunks
    kk_bar = min(1, KK - 1)   # Barrett rider slot within the k loop
    grid = (T + 1, L, KK)

    def cur_i(t):
        return jnp.minimum(t, T - 1) // nj

    def cur_j(t):
        return jax.lax.rem(jnp.minimum(t, T - 1), jnp.int32(nj))

    def prev_i(t):
        return jnp.clip(t - 1, 0, T - 1) // nj

    def prev_j(t):
        return jax.lax.rem(jnp.clip(t - 1, 0, T - 1), jnp.int32(nj))

    def kern(mods_ref, recips_ref, a_ref, b_ref, sa_ref, sb_ref, *refs):
        if out_kind == "f64":
            hi_ref, lo_ref, acc0_ref, acc1_ref, res_ref = refs
        else:
            (o_ref, acc0_ref, acc1_ref, res_ref) = refs
        t = pl.program_id(0)
        l = pl.program_id(1)
        kk = pl.program_id(2)
        g = jax.lax.rem(t * jnp.int32(L) + l, jnp.int32(2))

        def mm(acc_ref):
            prod = jax.lax.dot_general(
                a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

            @pl.when(kk == 0)
            def _():
                acc_ref[:] = prod

            @pl.when(kk > 0)
            def _():
                acc_ref[:] += prod

        @pl.when((t < T) & (g == 0))
        def _():
            mm(acc0_ref)

        @pl.when((t < T) & (g == 1))
        def _():
            mm(acc1_ref)

        # ---- Barrett rider: the other bank's finished accumulator ->
        # canonical uint8 residues (modulus l-1, or L-1 of tile t-1)
        had_prev_mm = ((l > 0) & (t < T)) | ((l == 0) & (t > 0))

        def _barrett(src_ref):
            lp = jnp.where(l > 0, l - 1, L - 1)
            tp = jnp.where(l > 0, t, t - 1)
            r = barrett_reduce(src_ref[:], mods_ref[lp], recips_ref[lp],
                               bias, fix_steps)
            bank = jax.lax.rem(tp, jnp.int32(2)) * jnp.int32(L)
            res_ref[pl.ds(bank + lp, 1)] = r.astype(jnp.uint8)[None]

        @pl.when(had_prev_mm & (kk == kk_bar) & (g == 0))
        def _():
            _barrett(acc1_ref)

        @pl.when(had_prev_mm & (kk == kk_bar) & (g == 1))
        def _():
            _barrett(acc0_ref)

        # ---- finalize riders: row chunk c of tile t-1
        if KK >= 3:
            slot = l * (KK - 2) + (kk - 2)
            fin_on = (t > 0) & (kk >= 2) & (slot < nchunks)
        else:
            slot = l
            fin_on = (t > 0) & (kk == KK - 1) & (slot < nchunks)

        @pl.when(fin_on)
        def _():
            pb = jax.lax.rem(t - 1, jnp.int32(2)) * jnp.int32(L)
            rows = pl.ds(slot * rows_per, rows_per)
            r = [res_ref[pl.ds(pb + j, 1), rows, :][0].astype(_I32)
                 for j in range(L)]
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
        pl.BlockSpec((1, bm, bk), lambda t, l, kk, *r: (l, cur_i(t), kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, bn), lambda t, l, kk, *r: (l, kk, cur_j(t)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda t, l, kk, *r: (prev_i(t), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda t, l, kk, *r: (0, prev_j(t)),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((bm, bn),
                            lambda t, l, kk, *r: (prev_i(t), prev_j(t)),
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
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * mp * np_ * kp,
            bytes_accessed=T * L * (bm * kp + kp * bn) + mp * np_ * 8,
            transcendentals=0),
        interpret=_interpret(),
    )(mods, recips, a8p, b8p, sfta_p, sftb_p)
    if out_kind == "f64":
        return F64Bits(out[0][:m, :n], out[1][:m, :n])
    return out[:m, :n]


def fused_reconstruct_ok(m: int, n: int, k: int, num_moduli: int,
                        block=(1024, 1024, 2048)) -> bool:
    """Gate: operand chunk streams, the dual accumulators, the 2L residue
    tiles, and the output blocks must fit VMEM comfortably."""
    bm = min(block[0], _ceil_to(m, 128))
    bn = min(block[1], _ceil_to(n, 128))
    bk = min(block[2], _ceil_to(k, 128))
    operand = 4 * (bm * bk + bk * bn)        # double-buffered int8 streams
    acc = 2 * bm * bn * 4
    resid = 2 * num_moduli * bm * bn
    outb = 2 * bm * bn * 8
    return operand + acc + resid + outb < 100 * 1024 * 1024
