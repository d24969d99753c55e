"""Pallas batched int8 matmul with fused modular epilogue.

The moduli-batched slice products are the FLOP core (reference: the
cublasGemmEx CUDA_R_8I loop, gemmul8.cu:259-275). XLA's batched int8
dot_general measured ~217 TOPS on v5e (55% of the 394.5 TOPS int8 peak)
and materializes the full (L, m, n) int32 product to HBM (3.7 GB at
8192^2, L=14) only for the reconstruct kernel to re-read it.

This kernel tiles the batched matmul onto the MXU with an int32 VMEM
accumulator and applies the per-modulus Barrett reduction in the epilogue,
writing canonical uint8 residues instead — 4x less HBM write + 4x less
read for the consumer (the equivalent fusion the reference performs as a
separate conv_32i_2_8u kernel, conv_32i_2_8u.hpp:25-56).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables

_I32 = jnp.int32


def _ceil_to(x, a):
    return (x + a - 1) // a * a


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def barrett_fixup_params(kp: int, moduli_idx) -> tuple:
    """(bias, fix_steps) for the float-estimate Barrett epilogue.

    Fixup count from the STATIC accumulator bound |x| <= 2^7*2^7*kp
    (the modulus-256 lane can reach 128*128*k; at k=2^17 that equals 2^31
    and wraps int32, which is harmless for THAT lane only because the
    wrap is 0 mod 256 — use the 128^2 bound so the analysis covers it).
    Full quotient-error budget: int->f32 cast (<= ulp(xmax)), reciprocal
    rounding and product rounding (each <= (x/m)*2^-24), and the rounding
    of the bias subtraction (<= ulp(x/m)/2). The bias must dominate the
    budget or q can overshoot floor(x/m), leaving a NEGATIVE remainder
    that the >=-only fixups cannot repair. One conditional subtract per
    doubling of the undershoot interval.
    """
    xmax = 128.0 * 128.0 * kp
    m_min = min(int(tables.MODULI[j]) for j in moduli_idx)
    qmax = xmax / m_min
    ulp = lambda v: 2.0 ** (max(int(np.ceil(np.log2(v))) - 24, -100))
    qerr = (ulp(xmax) / m_min          # cast of x (full ulp: conservative)
            + 2.0 * qmax / 2 ** 24     # reciprocal + multiply rounding
            + ulp(qmax)                # bias-subtraction rounding
            + 2.0 ** -10)
    bias = float(np.ceil(qerr * 8) / 8)
    # q in [t - ceil(2*bias), t]: remove up to `need` extra multiples of m
    # with descending power-of-two conditional subtracts (covers 2^(j+1)-1)
    need = int(np.ceil(2 * bias))
    fix_steps = []
    sfx = 1
    while sfx <= need:
        fix_steps.append(sfx)
        sfx *= 2
    return bias, tuple(reversed(fix_steps))


def moduli_consts(moduli_idx):
    """(mods int32, recips f32) SMEM-constant vectors for the kernels'
    dynamic-modulus Barrett epilogues."""
    mods = jnp.asarray([tables.MODULI[j] for j in moduli_idx], jnp.int32)
    recips = jnp.asarray([1.0 / tables.MODULI[j] for j in moduli_idx],
                         jnp.float32)
    return mods, recips


def barrett_reduce(x, mj, rj, bias, fix_steps):
    """Kernel-body float-estimate Barrett: canonical `x mod m` for an
    int32 dot product x, dynamic modulus mj with reciprocal rj, and the
    statically-proven (bias, fix_steps) from barrett_fixup_params. Shared
    verbatim by every matmul-epilogue kernel (here, megakernel.py,
    pipelined.py) — the bodies must stay bit-identical for the pipeline
    parity invariants."""
    q = jnp.floor(x.astype(jnp.float32) * rj
                  - jnp.float32(bias)).astype(_I32)
    r = x - q * mj
    for s in fix_steps:
        r = r - jnp.where(r >= s * mj, s * mj, _I32(0))
    return r


def matmul_mod_u8_pallas(a8: jax.Array, b8: jax.Array, num_moduli: int,
                         moduli_idx=None,
                         block=None,
                         centered: bool = False) -> jax.Array:
    """Batched int8 matmul with the Barrett mod-reduce fused into the
    epilogue: emits (L, m, n) uint8 canonical residues (1 byte/elem HBM
    write instead of 4).

    centered=True emits (r - 128) int8 instead — the exact bit pattern
    the MXU-CRT reconstruct's contraction consumes, produced for free
    inside the (fully hidden) Barrett epilogue so the consumer skips its
    per-residue xor+bitcast pass."""
    L, m, k = a8.shape
    _, _, n = b8.shape
    if moduli_idx is None:
        moduli_idx = tuple(range(num_moduli))
    assert L == len(moduli_idx)
    if block is None:
        from . import launch

        block = launch.get("matmul")
    bm, bn, bk = block
    # shrink tiles for small problems (tuned defaults target >= 4096^2)
    bm, bn, bk = min(bm, _ceil_to(m, 128)), min(bn, _ceil_to(n, 128)), \
        min(bk, _ceil_to(k, 128))
    mp, np_, kp = _ceil_to(m, bm), _ceil_to(n, bn), _ceil_to(k, bk)
    a8p = jnp.pad(a8, ((0, 0), (0, mp - m), (0, kp - k)))
    b8p = jnp.pad(b8, ((0, 0), (0, kp - k), (0, np_ - n)))
    grid = (L, mp // bm, np_ // bn, kp // bk)
    # per-batch modulus constants, scalar-prefetched
    mods, recips = moduli_consts(moduli_idx)
    bias, fix_steps = barrett_fixup_params(kp, moduli_idx)

    def kern(mods_ref, recips_ref, a_ref, b_ref, o_ref, acc_ref):
        kk = pl.program_id(3)
        klast = pl.num_programs(3) - 1
        l = pl.program_id(0)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(kk == klast)
        def _():
            # modulus 256: the Barrett path handles it too (exact), but the
            # canonical residue may be 128..255 — uint8 output holds it.
            r = barrett_reduce(acc_ref[:], mods_ref[l], recips_ref[l],
                               bias, fix_steps)
            if centered:
                o_ref[0] = (r - _I32(128)).astype(jnp.int8)
            else:
                o_ref[0] = r.astype(jnp.uint8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, bk),
                         lambda l, i, j, kk, *refs: (l, i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bn),
                         lambda l, i, j, kk, *refs: (l, kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, bn),
                               lambda l, i, j, kk, *refs: (l, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, mp, np_),
                                       jnp.int8 if centered else jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            # v5e exposes far more VMEM than the 16MB default scoped limit;
            # large tiles halve HBM traffic (see tune_matmul.py results)
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * mp * np_ * kp,
            bytes_accessed=L * (mp * kp + kp * np_ + mp * np_),
            transcendentals=0),
        interpret=_interpret(),
    )(mods, recips, a8p, b8p)
    return out[:, :m, :n]


def matmul_mod_u8_pipelined(a8: jax.Array, b8: jax.Array, num_moduli: int,
                            moduli_idx=None,
                            block=(1024, 512)) -> jax.Array:
    """matmul_mod_u8_pallas with the Barrett epilogue software-pipelined
    one n-step behind the MXU: step j computes the dot for tile j into a
    ping-pong accumulator while the VPU reduces tile j-1 from the other
    buffer — the two are independent, so Mosaic overlaps them (the
    unpipelined kernel serializes dot -> epilogue inside each step, which
    leaves the ~8-op/elem reduction visible: ~3-4 ms at 8192^3/14).

    Requires the full contraction extent in one k-tile (the tuned shape
    at headline sizes); grid is (L, m-tiles, n-tiles + 1) with the last
    step running only the final tile's epilogue. Bit-identical output to
    matmul_mod_u8_pallas."""
    L, m, k = a8.shape
    _, _, n = b8.shape
    if moduli_idx is None:
        moduli_idx = tuple(range(num_moduli))
    assert L == len(moduli_idx)
    bm, bn = block
    bm, bn = min(bm, _ceil_to(m, 128)), min(bn, _ceil_to(n, 128))
    kp = _ceil_to(k, 128)
    mp, np_ = _ceil_to(m, bm), _ceil_to(n, bn)
    a8p = jnp.pad(a8, ((0, 0), (0, mp - m), (0, kp - k)))
    b8p = jnp.pad(b8, ((0, 0), (0, kp - k), (0, np_ - n)))
    nj = np_ // bn
    grid = (L, mp // bm, nj + 1)
    mods, recips = moduli_consts(moduli_idx)
    bias, fix_steps = barrett_fixup_params(kp, moduli_idx)

    def kern(mods_ref, recips_ref, a_ref, b_ref, o_ref, acc0_ref, acc1_ref):
        l = pl.program_id(0)
        j = pl.program_id(2)
        p = j & 1

        def epilogue(acc_ref):
            o_ref[0] = barrett_reduce(acc_ref[:], mods_ref[l], recips_ref[l],
                                      bias, fix_steps).astype(jnp.uint8)

        def dot(acc_ref):
            acc_ref[:] = jax.lax.dot_general(
                a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        # static ping-pong (two scratch refs, parity-gated): the write
        # target and the read source are provably disjoint refs, so the
        # scheduler can overlap the VPU epilogue of tile j-1 with the MXU
        # dot of tile j (a dynamic acc[p] index defeats that analysis —
        # measured 48.4 ms vs 43.2 unpipelined)
        @pl.when((j > 0) & (p == 1))
        def _():
            epilogue(acc0_ref)

        @pl.when((j > 0) & (p == 0))
        def _():
            epilogue(acc1_ref)

        @pl.when((j < nj) & (p == 0))
        def _():
            dot(acc0_ref)

        @pl.when((j < nj) & (p == 1))
        def _():
            dot(acc1_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, kp),
                         lambda l, i, j, *refs: (l, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, bn),
                         lambda l, i, j, *refs:
                         (l, 0, jnp.minimum(j, nj - 1)),
                         memory_space=pltpu.VMEM),
        ],
        # tile j's residues are written during step j+1; block 0 is
        # revisited at steps 0 and 1 (flushed once, after the real write)
        out_specs=pl.BlockSpec((1, bm, bn),
                               lambda l, i, j, *refs:
                               (l, i, jnp.maximum(j - 1, 0)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32),
                        pltpu.VMEM((bm, bn), jnp.int32)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, mp, np_), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * mp * np_ * kp,
            bytes_accessed=L * (mp * kp + kp * np_ + mp * np_),
            transcendentals=0),
        interpret=_interpret(),
    )(mods, recips, a8p, b8p)
    return out[:, :m, :n]


def matmul_mod_u8(a8: jax.Array, b8: jax.Array, num_moduli: int,
                  moduli_idx=None, centered: bool = False) -> jax.Array:
    """Dispatch: the epilogue-pipelined kernel (opt-in, measurement
    pending — the dynamic-ping-pong variant measured 48.4 vs 43.2 ms at
    8192^3/14, see PERF_NOTES.md) or the tuned k-tiled kernel."""
    import os

    from . import launch

    _, m, k = a8.shape
    n = b8.shape[2]
    bm, bn, bk = launch.get("matmul")
    if (not centered
            and os.environ.get("GEMMUL8_MM_PIPELINE") == "1" and k <= bk
            and (min(bm, _ceil_to(m, 128)) + min(bn, _ceil_to(n, 128)))
            * _ceil_to(k, 128) <= 24 * 1024 * 1024):
        return matmul_mod_u8_pipelined(a8, b8, num_moduli, moduli_idx,
                                       block=(bm, bn))
    return matmul_mod_u8_pallas(a8, b8, num_moduli, moduli_idx,
                                centered=centered)


def magmax_matmul_scratch(a8: jax.Array, b8: jax.Array, block=None):
    """magmax with the cross-tile max fold DEFERRED to XLA: each (i, j)
    tile writes its row/col maxes to its OWN static output block, and two
    tiny XLA reductions finish the fold.

    MEASURED SLOWER on v5e (13.6 ms at (1024,512,8192) vs 7.66 for the
    in-kernel fold; 7.87 at (2048,512)): the per-(i,j) output flushes of
    the broadcast max blocks cost more than the lane-dynamic scratch
    store they replace. Kept opt-in (GEMMUL8_MAGMAX_SCRATCH=1) as the
    measured record — the unbatched-dot floor itself is ~4.9 ms in this
    grid (matmul_mod_u8 at L=1 measures the same), so magmax's realistic
    ceiling is ~5.5 ms, not the 3.1 ms batched-amortized rate."""
    m, k = a8.shape
    _, n = b8.shape
    if block is None:
        from . import launch

        block = launch.get("magmax")
    bm, bn, bk = block
    bm, bn, bk = min(bm, _ceil_to(m, 128)), min(bn, _ceil_to(n, 128)), \
        min(bk, _ceil_to(k, 128))
    mp, np_, kp = _ceil_to(m, bm), _ceil_to(n, bn), _ceil_to(k, bk)
    a8p = jnp.pad(a8, ((0, mp - m), (0, kp - k)))
    b8p = jnp.pad(b8, ((0, kp - k), (0, np_ - n)))
    mi, nj = mp // bm, np_ // bn
    grid = (mi, nj, kp // bk)

    def kern(a_ref, b_ref, row_ref, col_ref, acc_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(kk == pl.num_programs(2) - 1)
        def _():
            # per-tile maxes, broadcast to the minimal legal block shapes
            rmax = jnp.max(acc_ref[:], axis=1, keepdims=True)   # (bm, 1)
            cmax = jnp.max(acc_ref[:], axis=0, keepdims=True)   # (1, bn)
            row_ref[:] = jnp.broadcast_to(rmax, (bm, 128))
            col_ref[:] = jnp.broadcast_to(cmax, (8, bn))

    row, col = pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        # every (i, j) owns a distinct block: no revisits, no dynamics
        out_specs=(
            pl.BlockSpec((bm, 128), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bn), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((mp, 128 * nj), jnp.int32),
                   jax.ShapeDtypeStruct((8 * mi, np_), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * 128 * nj * 4
            + 8 * mi * np_ * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(a8p, b8p)
    # finish the fold on XLA: max over the per-tile groups (tiny)
    smax_row = jnp.max(row.reshape(mp, nj, 128), axis=(1, 2),
                       keepdims=False)[:m, None]
    smax_col = jnp.max(col.reshape(mi, 8, np_), axis=(0, 1),
                       keepdims=False)[None, :n]
    return smax_row, smax_col


def magmax_matmul_pallas(a8: jax.Array, b8: jax.Array, block=None):
    """|A| x |B| magnitude GEMM with row/col max epilogue fused: returns
    (smax_row (m, 1), smax_col (1, n)) int32 — the accurate-mode
    product-magnitude bounds, WITHOUT materializing the (m, n) int32
    product to HBM (reference runs one full GemmEx and reduces it,
    scaling.hpp:3110-3121). Operands are nonnegative 7-bit magnitudes.

    GEMMUL8_MAGMAX_SCRATCH=1 opts into the deferred-fold variant
    (bit-identical; measured slower — see magmax_matmul_scratch)."""
    import os

    if os.environ.get("GEMMUL8_MAGMAX_SCRATCH", "0") == "1":
        return magmax_matmul_scratch(a8, b8, block)
    m, k = a8.shape
    _, n = b8.shape
    if block is None:
        from . import launch

        block = launch.get("magmax")
    bm, bn, bk = block
    bm, bn, bk = min(bm, _ceil_to(m, 128)), min(bn, _ceil_to(n, 128)), \
        min(bk, _ceil_to(k, 128))
    mp, np_, kp = _ceil_to(m, bm), _ceil_to(n, bn), _ceil_to(k, bk)
    a8p = jnp.pad(a8, ((0, mp - m), (0, kp - k)))
    b8p = jnp.pad(b8, ((0, kp - k), (0, np_ - n)))
    mi, nj = mp // bm, np_ // bn
    grid = (mi, nj, kp // bk)

    def kern(a_ref, b_ref, row_ref, col_ref, acc_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        kk = pl.program_id(2)

        # the per-tile max outputs keep their small cross-tile axis WHOLE
        # in the block (Mosaic requires block dims divisible by 8/128 or
        # equal to the array dim — a (bm, 1) block over a (mp, nj) array
        # is rejected on real TPU lowering); each (i, j) tile folds its
        # max into the right lane with an iota mask. Products are >= 0,
        # so the j==0/kk==0 zero-init is a neutral max element.
        @pl.when((i == 0) & (j == 0) & (kk == 0))
        def _():
            col_ref[:] = jnp.zeros_like(col_ref)

        @pl.when((j == 0) & (kk == 0))
        def _():
            row_ref[:] = jnp.zeros_like(row_ref)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(kk == pl.num_programs(2) - 1)
        def _():
            rmax = jnp.max(acc_ref[:], axis=1, keepdims=True)      # (bm, 1)
            cmax = jnp.max(acc_ref[:], axis=0, keepdims=True)      # (1, bn)
            jl = jax.lax.broadcasted_iota(jnp.int32, (bm, nj), 1)
            row_ref[:] = jnp.where(jl == j, jnp.maximum(row_ref[:], rmax),
                                   row_ref[:])
            col_ref[pl.ds(i, 1), pl.ds(j * bn, bn)] = cmax

    row, col = pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # row partials: block resident per i-tile (index constant in
            # j/kk), each j folds into its own lane
            pl.BlockSpec((bm, nj), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            # col partials: whole (mi, n) buffer resident for the entire
            # kernel (tiny) — a block index that varied with the middle
            # grid dim would be flushed and NOT reloaded on revisit
            pl.BlockSpec((mi, np_), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((mp, nj), jnp.int32),
                   jax.ShapeDtypeStruct((mi, np_), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * nj + mi * np_,
            transcendentals=0),
        interpret=_interpret(),
    )(a8p, b8p)
    smax_row = jnp.max(row[:m], axis=1, keepdims=True)
    smax_col = jnp.max(col[:, :n], axis=0, keepdims=True)
    return smax_row, smax_col


def matmul_complex_mod_pallas(a8r, a8i, b8r, b8i, num_moduli: int,
                              moduli_idx=None, block=None,
                              centered: bool = False,
                              kara=None):
    """Fused COMPLEX slice matmul with the Barrett epilogue: computes the
    residue products of (Re_a + i Im_a)(Re_b + i Im_b) per modulus and
    emits centered int8 / canonical uint8 residues for Re and Im — the
    complex analog of matmul_mod_u8_pallas (VERDICT r4 item 3).

    Default (4-dot) schedule per grid step:
        acc_re += ReA.ReB - ImA.ImB ; acc_im += ImA.ReB + ReA.ImB
    This is algebraically the reference's BIG_MATRIX block GEMM
    ([[Re,-Im],[Im,Re]] @ [Re;Im], gemmul8.cu:579-723) with the quadrant
    concatenation rewritten as accumulate-in-place — same exact integer
    sums, so the residues are BIT-IDENTICAL to both the big-matrix and
    classic jnp paths, but the (L, 2m, 2k) block tensor and the (L, 2m,
    n) int32 product never exist in HBM.

    kara=(s_a, s_b) switches to the 3-dot Karatsuba schedule
    (E=ReA.ReB, F=ImA.ImB, G=s_a.s_b; Re=E-F, Im=G-E-F,
    gemmul8.cu:725-890) with the re-centered sum slices precomputed by
    the caller — 25% fewer MXU ops at one extra operand stream each way.

    int32 exactness: |acc| <= 2 (classic) / 3 (kara) * 128^2 * k — the
    caller enforces the strategy's global-k bound (complexgemm._KMAX);
    barrett_fixup_params gets the matching effective kp."""
    L, m, k = a8r.shape
    _, _, n = b8r.shape
    if moduli_idx is None:
        moduli_idx = tuple(range(num_moduli))
    assert L == len(moduli_idx)
    if block is None:
        from . import launch

        block = launch.get("matmul")
    bm, bn, bk = block
    bm, bn, bk = min(bm, _ceil_to(m, 128)), min(bn, _ceil_to(n, 128)), \
        min(bk, _ceil_to(k, 128))
    mp, np_, kp = _ceil_to(m, bm), _ceil_to(n, bn), _ceil_to(k, bk)

    def pad_a(t):
        return jnp.pad(t, ((0, 0), (0, mp - m), (0, kp - k)))

    def pad_b(t):
        return jnp.pad(t, ((0, 0), (0, kp - k), (0, np_ - n)))

    a_ops = [pad_a(a8r), pad_a(a8i)]
    b_ops = [pad_b(b8r), pad_b(b8i)]
    if kara is not None:
        a_ops.append(pad_a(kara[0]))
        b_ops.append(pad_b(kara[1]))
    grid = (L, mp // bm, np_ // bn, kp // bk)
    mods, recips = moduli_consts(moduli_idx)
    kp_eff = (3 if kara is not None else 2) * kp
    bias, fix_steps = barrett_fixup_params(kp_eff, moduli_idx)

    def dot(a_ref, b_ref):
        return jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def emit(o_ref, x, l, mods_ref, recips_ref):
        r = barrett_reduce(x, mods_ref[l], recips_ref[l], bias, fix_steps)
        if centered:
            o_ref[0] = (r - _I32(128)).astype(jnp.int8)
        else:
            o_ref[0] = r.astype(jnp.uint8)

    if kara is None:
        def kern(mods_ref, recips_ref, ar_ref, ai_ref, br_ref, bi_ref,
                 ore_ref, oim_ref, accr_ref, acci_ref):
            kk = pl.program_id(3)
            l = pl.program_id(0)

            @pl.when(kk == 0)
            def _():
                accr_ref[:] = jnp.zeros_like(accr_ref)
                acci_ref[:] = jnp.zeros_like(acci_ref)

            accr_ref[:] += dot(ar_ref, br_ref) - dot(ai_ref, bi_ref)
            acci_ref[:] += dot(ai_ref, br_ref) + dot(ar_ref, bi_ref)

            @pl.when(kk == pl.num_programs(3) - 1)
            def _():
                emit(ore_ref, accr_ref[:], l, mods_ref, recips_ref)
                emit(oim_ref, acci_ref[:], l, mods_ref, recips_ref)

        scratch = [pltpu.VMEM((bm, bn), jnp.int32)] * 2
    else:
        def kern(mods_ref, recips_ref, ar_ref, ai_ref, sa_ref, br_ref,
                 bi_ref, sb_ref, ore_ref, oim_ref, e_ref, f_ref, g_ref):
            kk = pl.program_id(3)
            l = pl.program_id(0)

            @pl.when(kk == 0)
            def _():
                e_ref[:] = jnp.zeros_like(e_ref)
                f_ref[:] = jnp.zeros_like(f_ref)
                g_ref[:] = jnp.zeros_like(g_ref)

            e_ref[:] += dot(ar_ref, br_ref)
            f_ref[:] += dot(ai_ref, bi_ref)
            g_ref[:] += dot(sa_ref, sb_ref)

            @pl.when(kk == pl.num_programs(3) - 1)
            def _():
                e, f, g = e_ref[:], f_ref[:], g_ref[:]
                emit(ore_ref, e - f, l, mods_ref, recips_ref)
                emit(oim_ref, g - e - f, l, mods_ref, recips_ref)

        scratch = [pltpu.VMEM((bm, bn), jnp.int32)] * 3

    a_spec = pl.BlockSpec((1, bm, bk), lambda l, i, j, kk, *r: (l, i, kk),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, bk, bn), lambda l, i, j, kk, *r: (l, kk, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, bm, bn), lambda l, i, j, kk, *r: (l, i, j),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[a_spec] * len(a_ops) + [b_spec] * len(b_ops),
        out_specs=(o_spec, o_spec),
        scratch_shapes=scratch,
    )
    odt = jnp.int8 if centered else jnp.uint8
    ops = a_ops + b_ops
    ore, oim = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((L, mp, np_), odt),
                   jax.ShapeDtypeStruct((L, mp, np_), odt)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * (3 if kara is not None else 4) * L * mp * np_ * kp,
            bytes_accessed=L * (2 * (mp * kp + kp * np_) + 2 * mp * np_),
            transcendentals=0),
        interpret=_interpret(),
    )(mods, recips, *ops)
    return ore[:, :m, :n], oim[:, :m, :n]


def matmul_crt_pallas(a8: jax.Array, b8: jax.Array, num_moduli: int,
                      block=(512, 512, 8192)) -> jax.Array:
    """Batched int8 matmul with the FULL per-modulus epilogue fused:
    Barrett residue + CRT-weight scaling + limb accumulation across the
    moduli axis. Emits (num_limbs, m, n) int32 canonical 16-bit limbs of
    X = sum_j w_j * (C_j mod m_j) — the quantity reconstruct's
    accumulate_weighted would otherwise rebuild from a (L, m, n) residue
    tensor (one extra HBM round trip + the accumulation on the critical
    path; here it hides behind the MXU).

    Grid is (i, j, l, kk) with the output block revisited across l and kk,
    so the limb accumulator never leaves VMEM until every modulus has
    contributed. Limb partial sums stay < L*255*65535 < 2^29: safe in
    int32; one carry pass canonicalizes at the last modulus.
    """
    L, m, k = a8.shape
    _, _, n = b8.shape
    assert L == num_moduli
    nl = tables.num_limbs(num_moduli)
    bm, bn, bk = block
    bm, bn, bk = min(bm, _ceil_to(m, 128)), min(bn, _ceil_to(n, 128)), \
        min(bk, _ceil_to(k, 128))
    mp, np_, kp = _ceil_to(m, bm), _ceil_to(n, bn), _ceil_to(k, bk)
    a8p = jnp.pad(a8, ((0, 0), (0, mp - m), (0, kp - k)))
    b8p = jnp.pad(b8, ((0, 0), (0, kp - k), (0, np_ - n)))
    grid = (mp // bm, np_ // bn, L, kp // bk)
    mods, recips = moduli_consts(range(L))
    weights = jnp.asarray(tables.crt_weight_limbs(num_moduli), jnp.int32)  # (L, nl)

    def kern(mods_ref, recips_ref, w_ref, a_ref, b_ref, o_ref, acc_ref):
        kk = pl.program_id(3)
        klast = pl.num_programs(3) - 1
        l = pl.program_id(2)
        llast = pl.num_programs(2) - 1

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when((l == 0) & (kk == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        @pl.when(kk == klast)
        def _():
            mj = mods_ref[l]
            rj = recips_ref[l]
            x = acc_ref[:]
            q = jnp.floor(x.astype(jnp.float32) * rj
                          - jnp.float32(8.0)).astype(_I32)
            r = x - q * mj
            for s in (8, 4, 2, 1):
                r = r - jnp.where(r >= s * mj, s * mj, _I32(0))
            for lw in range(o_ref.shape[0]):
                o_ref[lw] += r * w_ref[l, lw]

            @pl.when(l == llast)
            def _():
                c = jnp.zeros_like(r)
                for lw in range(o_ref.shape[0]):
                    t = o_ref[lw] + c
                    o_ref[lw] = t & _I32(0xFFFF)
                    c = t >> 16

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, bk),
                         lambda i, j, l, kk, *refs: (l, i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bn),
                         lambda i, j, l, kk, *refs: (l, kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nl, bm, bn),
                               lambda i, j, l, kk, *refs: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nl, mp, np_), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * mp * np_ * kp,
            bytes_accessed=L * (mp * kp + kp * np_) + nl * mp * np_ * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(mods, recips, weights, a8p, b8p)
    return out[:, :m, :n]
