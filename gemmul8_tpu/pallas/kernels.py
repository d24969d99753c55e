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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables
from ..core import encode as enc
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
# Encode kernel
# ---------------------------------------------------------------------------

def encode_slices_pallas(x, sft, num_moduli: int, axis: int,
                         moduli_idx=None, block=(256, 512)):
    """Residue slices via a fused VMEM kernel. x: F64Bits or f32 array
    (2D); sft: keepdims shift from the stats pass ((m,1) for axis=1,
    (1,k) for axis=0). Returns (L, m, k) int8."""
    is64 = isinstance(x, F64Bits)
    m, k = x.shape
    bm, bk = block
    mp, kp = _ceil_to(m, bm), _ceil_to(k, bk)
    grid = (mp // bm, kp // bk)
    n_out = num_moduli if moduli_idx is None else len(moduli_idx)

    def pad2(a):
        return jnp.pad(a, ((0, mp - m), (0, kp - k)))

    if axis == 1:  # row shifts (m, 1)
        sft_p = jnp.pad(sft, ((0, mp - m), (0, 0)))
        sft_spec = pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)
    else:          # column shifts (1, k)
        sft_p = jnp.pad(sft, ((0, 0), (0, kp - k)))
        sft_spec = pl.BlockSpec((1, bk), lambda i, j: (0, j),
                                memory_space=pltpu.VMEM)

    if is64:
        inputs = (pad2(x.hi), pad2(x.lo), sft_p)

        def kern(hi_ref, lo_ref, sft_ref, out_ref):
            chunks, exp, sign, normal = enc._f64_fields(hi_ref[:], lo_ref[:])
            out_ref[:] = enc._encode_with_sft(
                chunks, exp, sign, normal, sft_ref[:], num_moduli, 53,
                moduli_idx)
    else:
        bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32),
                                            jnp.uint32)
        inputs = (pad2(bits), sft_p)

        def kern(bits_ref, sft_ref, out_ref):
            chunks, exp, sign, normal = enc._f32_fields(bits_ref[:])
            out_ref[:] = enc._encode_with_sft(
                chunks, exp, sign, normal, sft_ref[:], num_moduli, 24,
                moduli_idx)

    data_spec = pl.BlockSpec((bm, bk), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    in_specs = [data_spec] * (len(inputs) - 1) + [sft_spec]
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_out, bm, bk), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, mp, kp), jnp.int8),
        interpret=_interpret(),
    )(*inputs)
    return out[:, :m, :k]


# ---------------------------------------------------------------------------
# Reconstruct kernel: mod-reduce + CRT limb accumulate + mod-M + rounding,
# all fused.
# ---------------------------------------------------------------------------

def _rec_body(c32, sft_a, sft_b, num_moduli, out_kind):
    if c32.dtype == jnp.uint8:
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
    e_fix = -(sft_a + sft_b)
    mag, negf = rec._mod_m_centered(x, num_moduli)
    if out_kind == "f64":
        eb, mant = rec._round_to_float(mag, negf, e_fix, 53)
        out = rec._assemble_f64(negf, eb, mant)
        return out.hi, out.lo
    eb, mant = rec._round_to_float(mag, negf, e_fix, 24)
    return (rec._assemble_f32(negf, eb, mant),)


def reconstruct_pallas(c32, sft_a, sft_b, num_moduli: int, out_kind: str,
                       block=(128, 256)):
    """Fused mod-reduce + CRT + inverse scaling. c32: (L, m, n) int32 slice
    products; sft_a (m,1), sft_b (1,n). Returns F64Bits or f32 array."""
    L, m, n = c32.shape
    bm, bn = block
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

    if out_kind == "f64":
        def kern(c_ref, sa_ref, sb_ref, hi_ref, lo_ref):
            hi, lo = _rec_body(c_ref[:], sa_ref[:], sb_ref[:], num_moduli,
                               "f64")
            hi_ref[:] = hi
            lo_ref[:] = lo

        hi, lo = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs,
            out_specs=(tile_spec, tile_spec),
            out_shape=(jax.ShapeDtypeStruct((mp, np_), jnp.uint32),
                       jax.ShapeDtypeStruct((mp, np_), jnp.uint32)),
            interpret=_interpret(),
        )(c32p, sfta_p, sftb_p)
        return F64Bits(hi[:m, :n], lo[:m, :n])

    def kern32(c_ref, sa_ref, sb_ref, o_ref):
        (o_ref[:],) = _rec_body(c_ref[:], sa_ref[:], sb_ref[:], num_moduli,
                                "f32")

    o = pl.pallas_call(
        kern32, grid=grid, in_specs=in_specs, out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        interpret=_interpret(),
    )(c32p, sfta_p, sftb_p)
    return o[:m, :n]
