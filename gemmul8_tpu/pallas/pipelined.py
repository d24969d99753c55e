"""Panel-pipelined matmul with the CRT reconstruct (and optionally the
next panel's encode) as riders.

On TPU the per-call phases execute serially (one core, one kernel at a
time), so the ~12 ms of reconstruct VPU work at 8192^3/14 sits naked on
the critical path after the ~43 ms MXU matmul. The measured fact that
motivates this module (PERF_NOTES.md): *independent* VPU work injected
into the matmul kernel hides at ~70% marginal rate — but the reconstruct
of an output tile depends on ALL of that tile's per-modulus products, so
inside one monolithic matmul there is nothing independent to inject.

The panel pipeline manufactures the independence: split the m axis into
panels; the kernel invocation that computes panel p's residues carries,
as riders spread across its grid steps,
  - the full CRT reconstruct of panel p-1 (whose residues are complete),
  - optionally the int8 encode of A-panel p+1 (whose source and shifts
    are ready; the a8 panels ping-pong between calls).
Only the LAST panel's reconstruct runs bare, and only the FIRST panel's
encode. When both riders are active they interleave by grid-step parity
so each step carries at most one rider tile. Operand traffic is
unchanged versus the monolithic kernel — the panel calls index into the
same full b8 array (B streamed once per panel, exactly as the monolithic
kernel streams it once per m-tile) and A slices are read once per
modulus either way.

This replaces the reference's serialized phase structure
(gemmul8.cu:259-292: GemmEx loop, then inverse_scaling) with a
TPU-native software pipeline; the arithmetic is bit-identical to the
unpipelined path (same encode/_rec_body/Barrett bodies — encode and the
Barrett epilogue are elementwise-exact so tiling cannot change them, and
the reconstruct rider reuses _rec_body verbatim).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import encode as enc
from ..types import F64Bits
from .kernels import _rec_body, reconstruct_pallas, encode_slices_pallas, \
    fast_sft_pallas, ENC_BLOCK
from .matmul import barrett_fixup_params, barrett_reduce, \
    moduli_consts

_I32 = jnp.int32


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _encode_f64_tile(hi_ref, lo_ref, sft_ref, num_moduli: int):
    """Rider body: int8 residue slices of one f64 tile — the same
    _f64_fields/_encode_with_sft bodies as encode_slices_pallas, so the
    riders stay bit-identical to the up-front encode."""
    chunks, exp, sign, normal = enc._f64_fields(hi_ref[:], lo_ref[:])
    return enc._encode_with_sft(chunks, exp, sign, normal, sft_ref[:],
                                num_moduli, 53, None)


def _encode_f32_tile(bits_ref, sft_ref, num_moduli: int):
    """f32 rider body (operand as uint32 bit patterns, like
    encode_slices_pallas's internal bitcast)."""
    chunks, exp, sign, normal = enc._f32_fields(bits_ref[:])
    return enc._encode_with_sft(chunks, exp, sign, normal, sft_ref[:],
                                num_moduli, 24, None)


def _src_arrays(x, kind: str):
    """Operand leaves for a rider's source: (hi, lo) for f64 bit pairs,
    a single uint32 bitcast for f32 (passed through unchanged when the
    caller already bitcast it — _RawSrc)."""
    if kind == "f64":
        return (x.hi, x.lo)
    if isinstance(x, _RawSrc):
        return (x.bits,)
    return (jax.lax.bitcast_convert_type(x.astype(jnp.float32),
                                         jnp.uint32),)


def _encode_tile(src_refs, sft_ref, num_moduli: int, kind: str):
    if kind == "f64":
        return _encode_f64_tile(src_refs[0], src_refs[1], sft_ref,
                                num_moduli)
    return _encode_f32_tile(src_refs[0], sft_ref, num_moduli)


def _rec_out(kind: str):
    """(leaf count, leaf dtype) of the reconstruct output."""
    return (2, jnp.uint32) if kind == "f64" else (1, jnp.float32)


def _rider_tiles(pm: int, np_: int, steps: int):
    """Rider tile shape (brm, brn) covering a (pm, np_) panel with at most
    `steps` tiles (one tile per grid step), lane-friendly (brn mult of 128,
    brm mult of 8). Width preference: 512 first (matches the matmul's bn
    tile so rider traffic aligns with the panel steps), then coarser, then
    finer; within a width, the smallest row count that fits — so the VPU
    work spreads as evenly as the width allows. Returns None if nothing
    fits."""
    for brn in (512, 1024, 2048, 256, 128):
        if np_ % brn:
            continue
        ncols = np_ // brn
        for brm in (32, 64, 128, 256, 512, 1024):
            if pm % brm:
                continue
            if (pm // brm) * ncols <= steps:
                return brm, brn
    return None


def pipeline_mode() -> int:
    """Pipeline gate from GEMMUL8_PIPELINE: 0 = off, 1 = reconstruct
    rider, 2 = reconstruct + encode riders, 3 = mode 2 plus the B-split
    first panel (B's right-half encode rides the left-half matmul).

    Default (env unset): 0. Every variant is asserted bit-identical to
    the monolithic path in interpret mode, but interpret mode cannot
    model Mosaic's prefetch/flush ordering against the schedule's aliased
    writes — so the aggressive schedules stay opt-in for API callers
    until chip-validated. bench.py opts in explicitly and additionally
    accuracy-gates its warmup call against the dd oracle, reverting to
    GEMMUL8_PIPELINE=0 on any chip-side failure."""
    import os
    # empty string == unset (the `GEMMUL8_PIPELINE= cmd` clearing idiom)
    v = os.environ.get("GEMMUL8_PIPELINE") or "0"
    if v not in ("0", "1", "2", "3"):
        # an explicit-but-invalid opt-in must not silently run unpipelined
        raise ValueError(
            f"GEMMUL8_PIPELINE={v!r}: expected one of '0','1','2','3'")
    return int(v)


def pipeline_applicable(m: int, n: int, k: int, num_moduli: int,
                        panel_m: int = 1024, bn: int = 512,
                        encode_rider: bool = False) -> bool:
    """The rider pipeline targets the large fast-mode f64 one-shot path.
    Shape gates keep the kernel simple: panel-aligned m, lane-aligned n,
    full-k-resident A panel within VMEM. With encode_rider the middle
    panels carry TWO riders interleaved by step parity, so each rider's
    tiling must fit in half the grid steps."""
    if m % panel_m or m // panel_m < 2:
        return False
    if n % bn or k % 128 or k > 16384:
        return False
    steps = num_moduli * (n // bn)
    if encode_rider:
        return (_rider_tiles(panel_m, n, steps // 2) is not None
                and _rider_tiles(panel_m, k, steps // 2) is not None
                and _rider_tiles(panel_m, k, steps) is not None)
    return _rider_tiles(panel_m, n, steps) is not None


def choose_panels(m: int, n: int, k: int, num_moduli: int,
                  encode_rider: bool = False):
    """Pick (panel_m, bn) for the pipeline, preferring the tuned headline
    configuration (1024, 512; scripts/tune_kernels.py) and falling back to
    smaller panels for smaller m. Returns None when no configuration
    applies."""
    for pm_ in (1024, 512, 256):
        for bn_ in (512, 256, 128):
            if pipeline_applicable(m, n, k, num_moduli, pm_, bn_,
                                   encode_rider):
                return pm_, bn_
    return None


def _sched(nt: int, tiles: int, phase: int, nphases: int):
    """Grid-step -> rider-tile schedule. With nphases=1 step s maps to
    tile min(s, tiles-1): steps past the last tile are gated OFF by
    active() (they never write), and the clamped index map keeps the
    final output block resident in VMEM until the kernel's final flush
    (revisiting a flushed block would NOT reload it — CLAUDE.md trap).
    With nphases=2 the riders interleave by parity: phase-p steps carry
    tile s//2."""
    t_max = tiles - 1

    def tidx(l, j):
        return jnp.minimum((l * nt + j) // nphases, t_max)

    def active(l, j):
        s = l * nt + j
        return jnp.logical_and(s % nphases == phase,
                               s // nphases <= t_max)

    return tidx, active


def matmul_rider_step(a8, b8, panel: int, r_prev, prev_panel: int,
                      sft_a, sft_b, num_moduli: int,
                      panel_m: int = 1024, bn: int = 512, *,
                      a_src=None, next_panel: int = -1,
                      acc=None, a_kind: str = "f64",
                      out_kind: str = "f64"):
    """One pipeline stage: int8 matmul (+Barrett uint8 epilogue) of one
    A panel against all of B, with up to two riders on the grid steps:
      - CRT reconstruct of panel `prev_panel` (skipped when r_prev is
        None — the first panel),
      - int8 encode of A-panel `next_panel` from the source `a_src`
        (skipped when a_src is None — the last panel, or rec-only mode).

    a_kind: the A rider source's kind — "f64" (F64Bits hi/lo pair) or
    "f32" (one uint32 bitcast). out_kind: "f64" (hi/lo uint32 output
    pairs) or "f32" (one f32 buffer per panel). The rider bodies
    dispatch on these; everything else (matmul, Barrett, schedules) is
    dtype-blind, so mixed-operand calls pipeline too.

    a8: (L, panel_m, k) int8 — this panel's slices — OR the full
    (L, m, k) array (rec-only mode; the panel is selected via a
    prefetched scalar so every stage shares one compiled kernel).
    b8: (L, k, n) int8; r_prev: (L, panel_m, n) uint8 residues of the
    previous panel; sft_a: (m, 1) int32 full shift vector; sft_b: (1, n).
    Returns (res_panel (L, panel_m, n) uint8, rec_leaves, a8_next) —
    rec_leaves is the (panel_m, n) reconstruct-output tuple ((hi, lo)
    uint32 for f64, (f32,) for f32) or None when r_prev is None; a8_next
    is (L, panel_m, next-panel slices) int8 or None when a_src is None.

    acc: accumulate the rider's reconstruct output into FULL-SIZE (m, n)
    hi/lo buffers instead of per-panel pieces (saves the caller's final
    concatenate): "fresh" allocates the buffers (first rider call; the
    not-yet-written regions are uninitialized), or a (hi, lo) pair from
    the previous call, alias-chained so each call only writes its
    prev-panel row region. The aliased inputs' prefetch blocks are pinned
    to the LAST panel's region, which no rider call ever writes.
    """
    L = a8.shape[0]
    k = a8.shape[2]
    n = b8.shape[2]
    a8_full = a8.shape[1] != panel_m
    assert k % 128 == 0 and n % bn == 0 and a8.shape[1] % panel_m == 0
    nt = n // bn
    steps = L * nt
    rec_rider = r_prev is not None
    enc_rider = a_src is not None
    assert acc is None or rec_rider
    acc_chain = isinstance(acc, tuple)
    m_total = sft_a.shape[0]
    nphases = 2 if (rec_rider and enc_rider) else 1
    # Unconditional single-rider execution: with one rider the clamped
    # index maps already fetch tile t_max's blocks on every step past the
    # last tile, so dropping pl.when only re-runs an idempotent tile
    # write (the rider bodies are pure functions of their refs) — it
    # trades ~(steps-tiles)/tiles redundant VPU work for predication-free
    # code Mosaic can overlap with the MXU dots
    # (matmul_mod_u8_pipelined's measured failure mode was predication).
    # Like pipeline_mode's env, this is read at TRACE time: it is not part
    # of any jit cache key, so toggling it after a shape has been traced
    # keeps the previously-compiled schedule until the cache is dropped.
    uncond = os.environ.get("GEMMUL8_RIDER_UNCOND", "0") == "1"
    if uncond and nphases != 1:
        import warnings
        warnings.warn(
            "GEMMUL8_RIDER_UNCOND=1 only applies to single-rider panels "
            "(nphases==1); two-rider (mode>=2) steps interleave rider "
            "kinds by parity and keep their pl.when gates", stacklevel=2)
        uncond = False
    # panel indices ride in as prefetched scalars so pipeline stages with
    # the same rider structure share ONE compiled kernel (a static
    # capture would specialize the Mosaic payload per panel)
    pidx = jnp.asarray([panel, max(next_panel, 0), max(prev_panel, 0)],
                       jnp.int32)
    mods, recips = moduli_consts(range(L))
    bias, fix_steps = barrett_fixup_params(k, tuple(range(L)))

    if rec_rider:
        brm, brn = _rider_tiles(panel_m, n, steps // nphases)
        ncols = n // brn
        r_tidx, r_active = _sched(nt, (panel_m // brm) * ncols, 0, nphases)
        sa_prev = jax.lax.dynamic_slice_in_dim(
            sft_a, prev_panel * panel_m, panel_m, axis=0)
    if enc_rider:
        berm, berk = _rider_tiles(panel_m, k, steps // nphases)
        ekcols = k // berk
        e_tidx, e_active = _sched(nt, (panel_m // berm) * ekcols,
                                  nphases - 1, nphases)
        erows = panel_m // berm

    n_rec, rec_dtype = _rec_out(out_kind)
    n_src = 2 if a_kind == "f64" else 1

    def kern(*refs):
        it = iter(refs)
        pidx_ref, mods_ref, recips_ref = next(it), next(it), next(it)
        a_ref, b_ref = next(it), next(it)
        if rec_rider:
            r_ref, sa_ref, sb_ref = next(it), next(it), next(it)
        if enc_rider:
            src_refs = [next(it) for _ in range(n_src)]
            sae_ref = next(it)
        if acc_chain:
            for _ in range(n_rec):
                next(it)  # aliased reconstruct inputs: never read
        o_ref = next(it)
        if rec_rider:
            rec_refs = [next(it) for _ in range(n_rec)]
        if enc_rider:
            a8n_ref = next(it)
        l = pl.program_id(0)
        j = pl.program_id(1)
        x = jax.lax.dot_general(a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o_ref[0] = barrett_reduce(x, mods_ref[l], recips_ref[l],
                                  bias, fix_steps).astype(jnp.uint8)

        if rec_rider:
            def _rec():
                outs = _rec_body(r_ref[:], sa_ref[:], sb_ref[:],
                                 num_moduli, out_kind)
                for ref, val in zip(rec_refs, outs):
                    ref[:] = val
            if uncond:
                _rec()
            else:
                pl.when(r_active(l, j))(_rec)
        if enc_rider:
            def _enc():
                a8n_ref[:] = _encode_tile(src_refs, sae_ref, num_moduli,
                                          a_kind)
            if uncond:
                _enc()
            else:
                pl.when(e_active(l, j))(_enc)

    if a8_full:
        a_spec = pl.BlockSpec((1, panel_m, k),
                              lambda l, j, pidx_r, *refs: (l, pidx_r[0], 0),
                              memory_space=pltpu.VMEM)
    else:
        a_spec = pl.BlockSpec((1, panel_m, k),
                              lambda l, j, *refs: (l, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        a_spec,
        pl.BlockSpec((1, k, bn),
                     lambda l, j, *refs: (l, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [pl.BlockSpec((1, panel_m, bn),
                              lambda l, j, *refs: (l, 0, j),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((L, panel_m, n), jnp.uint8)]
    operands = [a8, b8]
    if rec_rider:
        in_specs += [
            pl.BlockSpec((L, brm, brn),
                         lambda l, j, *refs: (0, r_tidx(l, j) // ncols,
                                              r_tidx(l, j) % ncols),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((brm, 1),
                         lambda l, j, *refs: (r_tidx(l, j) // ncols, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, brn),
                         lambda l, j, *refs: (0, r_tidx(l, j) % ncols),
                         memory_space=pltpu.VMEM),
        ]
        if acc is None:
            rec_out_spec = pl.BlockSpec(
                (brm, brn),
                lambda l, j, *refs: (r_tidx(l, j) // ncols,
                                     r_tidx(l, j) % ncols),
                memory_space=pltpu.VMEM)
            rec_out_shape = jax.ShapeDtypeStruct((panel_m, n), rec_dtype)
        else:
            # full-size accumulation: write this rider's tiles into the
            # prev-panel row region of an (m, n) buffer
            prow = panel_m // brm
            rec_out_spec = pl.BlockSpec(
                (brm, brn),
                lambda l, j, pidx_r, *refs: (
                    pidx_r[2] * prow + r_tidx(l, j) // ncols,
                    r_tidx(l, j) % ncols),
                memory_space=pltpu.VMEM)
            rec_out_shape = jax.ShapeDtypeStruct((m_total, n), rec_dtype)
        out_specs += [rec_out_spec] * n_rec
        out_shapes += [rec_out_shape] * n_rec
        operands += [r_prev, sa_prev, sft_b]
    if enc_rider:
        # source blocks offset into the NEXT panel's rows via the
        # prefetched panel index (no host-side slice copies)
        def _esrc(l, j, pidx_r, *refs):
            t = e_tidx(l, j)
            return (pidx_r[1] * erows + t // ekcols, t % ekcols)

        in_specs += (
            [pl.BlockSpec((berm, berk), _esrc, memory_space=pltpu.VMEM)]
            * n_src
            + [pl.BlockSpec((berm, 1),
                            lambda l, j, pidx_r, *refs:
                            (pidx_r[1] * erows + e_tidx(l, j) // ekcols, 0),
                            memory_space=pltpu.VMEM)]
        )
        out_specs += [
            pl.BlockSpec((num_moduli, berm, berk),
                         lambda l, j, *refs: (0, e_tidx(l, j) // ekcols,
                                              e_tidx(l, j) % ekcols),
                         memory_space=pltpu.VMEM),
        ]
        out_shapes += [jax.ShapeDtypeStruct((num_moduli, panel_m, k),
                                            jnp.int8)]
        operands += [*_src_arrays(a_src, a_kind), sft_a]

    aliases = {}
    if acc_chain:
        # alias-chain the full-size reconstruct buffers through this call;
        # the input prefetch blocks are pinned to the last panel's region,
        # which no rider call writes (only the caller's final bare
        # reconstruct)
        last_blk = (m_total - panel_m) // 8
        acc_in_spec = pl.BlockSpec((8, 128),
                                   lambda l, j, *refs: (last_blk, 0),
                                   memory_space=pltpu.VMEM)
        first_idx = 3 + len(operands)
        in_specs += [acc_in_spec] * n_rec
        operands += list(acc)
        aliases = {first_idx + i: 1 + i for i in range(n_rec)}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(L, nt),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * panel_m * n * k,
            # matmul operands/output plus the riders' streams: the
            # point of this kernel is overlapped memory-heavy work, so
            # understating it would skew XLA's latency-hiding heuristics
            bytes_accessed=(
                L * (panel_m * k + k * n + panel_m * n)
                + (L * panel_m * n + n_rec * 4 * panel_m * n
                   if rec_rider else 0)
                + (4 * n_src * panel_m * k + L * panel_m * k
                   if enc_rider else 0)),
            transcendentals=0),
        interpret=_interpret(),
    )(pidx, mods, recips, *operands)
    out = list(out) if isinstance(out, (tuple, list)) else [out]
    res = out.pop(0)
    rec_leaves = a8n = None
    if rec_rider:
        rec_leaves = tuple(out.pop(0) for _ in range(n_rec))
    if enc_rider:
        a8n = out.pop(0)
    return res, rec_leaves, a8n


def bsplit_applicable(m: int, n: int, k: int, num_moduli: int,
                      panel_m: int = 1024, bn: int = 512) -> bool:
    """The B-split schedule additionally needs an even column-tile count
    and a rider tiling that encodes the right half of B (k x n/2) within
    the left-half matmul's L*(nt/2) grid steps."""
    nt = n // bn
    if nt % 2 or nt < 2 or (n // 2) % ENC_BLOCK[1]:
        return False
    if not pipeline_applicable(m, n, k, num_moduli, panel_m, bn,
                               encode_rider=True):
        return False
    return _rider_tiles(k, n // 2, num_moduli * (nt // 2)) is not None


def matmul_bsplit_pair(a8_p0, b8_left, b_src, sft_a, sft_b,
                       num_moduli: int, panel_m: int, bn: int, *,
                       a_src=None, a_kind: str = "f64",
                       b_kind: str = "f64"):
    """Panel-0 matmul as two column-half calls that finish B's encode:

      call 0a: int8 matmul of A-panel-0 against the LEFT column half of
        b8 (already encoded), carrying as rider the residue encode of the
        RIGHT half of B straight from the f64 source — written into the
        full-size b8 buffer through an input_output_alias (the matmul
        only ever reads left-half blocks, the rider only writes
        right-half blocks, so the aliased regions are disjoint).
      call 0b: int8 matmul against the RIGHT half (now encoded),
        optionally carrying the A-panel-1 encode rider; its residue
        output aliases call 0a's so the panel's residues land in one
        (L, panel_m, n) buffer without a concatenate.

    Replaces the reference's strictly-serial scaling -> GemmEx ordering
    (gemmul8.cu:259-275) for the first panel; arithmetic is bit-identical
    (same _encode_with_sft / Barrett bodies). Returns
    (res0 (L, panel_m, n) uint8, b8_full (L, k, n) int8, a8_next|None).
    """
    L = num_moduli
    k = a8_p0.shape[2]
    n = b8_left.shape[2]
    nt = n // bn
    ntL = nt // 2
    mods, recips = moduli_consts(range(L))
    bias, fix_steps = barrett_fixup_params(k, tuple(range(L)))

    # ---- call 0a: matmul left + B-right encode rider ----
    berk, bern = _rider_tiles(k, n // 2, L * ntL)
    bcols = (n // 2) // bern  # also the right-half offset in bern units
    b_tidx, b_active = _sched(ntL, (k // berk) * bcols, 0, 1)

    n_bsrc = 2 if b_kind == "f64" else 1

    def kern_a(*refs):
        it = iter(refs)
        mods_ref, recips_ref, a_ref, b_ref = (next(it), next(it),
                                              next(it), next(it))
        bsrc_refs = [next(it) for _ in range(n_bsrc)]
        sbe_ref, o_ref, b8o_ref = next(it), next(it), next(it)
        l = pl.program_id(0)
        j = pl.program_id(1)
        x = jax.lax.dot_general(a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o_ref[0] = barrett_reduce(x, mods_ref[l], recips_ref[l],
                                  bias, fix_steps).astype(jnp.uint8)

        @pl.when(b_active(l, j))
        def _():
            b8o_ref[:] = _encode_tile(bsrc_refs, sbe_ref, num_moduli,
                                      b_kind)

    def _bsrc(l, j):
        t = b_tidx(l, j)
        return (t // bcols, t % bcols + bcols)

    res0, b8_full = pl.pallas_call(
        kern_a,
        grid=(L, ntL),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, panel_m, k), lambda l, j: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, bn), lambda l, j: (l, 0, j),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((berk, bern), lambda l, j: _bsrc(l, j),
                          memory_space=pltpu.VMEM)] * n_bsrc + [
            pl.BlockSpec((1, bern),
                         lambda l, j: (0, b_tidx(l, j) % bcols + bcols),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, panel_m, bn), lambda l, j: (l, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_moduli, berk, bern),
                         lambda l, j: (0,) + _bsrc(l, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((L, panel_m, n), jnp.uint8),
                   jax.ShapeDtypeStruct((L, k, n), jnp.int8)),
        input_output_aliases={3: 1},  # b8: left read / right written
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * panel_m * (n // 2) * k,
            # matmul streams plus the B-right encode rider's source read
            # and residue write
            bytes_accessed=(L * (panel_m * k + k * n // 2 + panel_m * n // 2)
                            + 4 * n_bsrc * k * (n // 2)
                            + L * k * (n // 2)),
            transcendentals=0),
        interpret=_interpret(),
    )(mods, recips, a8_p0, b8_left, *_src_arrays(b_src, b_kind), sft_b)

    # ---- call 0b: matmul right (+ optional A-panel-1 encode rider) ----
    enc_rider = a_src is not None
    if enc_rider:
        berm, aberk = _rider_tiles(panel_m, k, L * (nt - ntL))
        ekcols = k // aberk
        e_tidx, e_active = _sched(nt - ntL, (panel_m // berm) * ekcols,
                                  0, 1)
        erows = panel_m // berm

    n_asrc = 2 if a_kind == "f64" else 1

    def kern_b(*refs):
        it = iter(refs)
        mods_ref, recips_ref = next(it), next(it)
        a_ref, b_ref, r_in = next(it), next(it), next(it)
        if enc_rider:
            src_refs = [next(it) for _ in range(n_asrc)]
            sae_ref = next(it)
        o_ref = next(it)
        if enc_rider:
            a8n_ref = next(it)
        del r_in  # aliased input: read nowhere, present only for aliasing
        l = pl.program_id(0)
        j = pl.program_id(1)
        x = jax.lax.dot_general(a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o_ref[0] = barrett_reduce(x, mods_ref[l], recips_ref[l],
                                  bias, fix_steps).astype(jnp.uint8)
        if enc_rider:
            @pl.when(e_active(l, j))
            def _():
                a8n_ref[:] = _encode_tile(src_refs, sae_ref, num_moduli,
                                          a_kind)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, panel_m, k), lambda l, j: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k, bn), lambda l, j: (l, 0, j + ntL),
                     memory_space=pltpu.VMEM),
        # aliased residue input: block pinned to the (already-final) left
        # half, which this call never writes — the prefetcher must not
        # touch the right-half region the matmul is flushing
        pl.BlockSpec((1, 8, 128), lambda l, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [mods, recips, a8_p0, b8_full, res0]
    out_specs = [pl.BlockSpec((1, panel_m, bn), lambda l, j: (l, 0, j + ntL),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((L, panel_m, n), jnp.uint8)]
    if enc_rider:
        def _esrc(l, j):
            t = e_tidx(l, j)
            return (erows + t // ekcols, t % ekcols)

        in_specs += (
            [pl.BlockSpec((berm, aberk), lambda l, j: _esrc(l, j),
                          memory_space=pltpu.VMEM)] * n_asrc
            + [pl.BlockSpec((berm, 1), lambda l, j: (_esrc(l, j)[0], 0),
                            memory_space=pltpu.VMEM)]
        )
        out_specs += [
            pl.BlockSpec((num_moduli, berm, aberk),
                         lambda l, j: (0, e_tidx(l, j) // ekcols,
                                       e_tidx(l, j) % ekcols),
                         memory_space=pltpu.VMEM),
        ]
        out_shapes += [jax.ShapeDtypeStruct((num_moduli, panel_m, k),
                                            jnp.int8)]
        operands += [*_src_arrays(a_src, a_kind), sft_a]

    out = pl.pallas_call(
        kern_b,
        grid=(L, nt - ntL),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        input_output_aliases={4: 0},  # residues: left kept / right written
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * panel_m * (n - n // 2) * k,
            # matmul streams plus the A-panel-1 encode rider's
            bytes_accessed=(L * (panel_m * k + k * (n - n // 2)
                                 + panel_m * (n - n // 2))
                            + (4 * n_asrc * panel_m * k + L * panel_m * k
                               if enc_rider else 0)),
            transcendentals=0),
        interpret=_interpret(),
    )(*operands)
    out = list(out) if isinstance(out, (tuple, list)) else [out]
    res0_full = out.pop(0)
    a8n = out.pop(0) if enc_rider else None
    return res0_full, b8_full, a8n


def _reconstruct_into(r8, sft_a, sft_b, num_moduli: int, hi_acc, lo_acc,
                      last_panel: int, panel_m: int,
                      block=None, kind: str = "f64"):
    """CRT reconstruct of the LAST panel's residues written directly into
    the alias-chained full-size output buffers (same _rec_body as
    reconstruct_pallas; saves the final panel concatenate). The aliased
    inputs' prefetch blocks are pinned to panel-0's region, which this
    call never writes. hi_acc/lo_acc: the alias-chained buffers (lo_acc
    is None for f32)."""
    L, pm, n = r8.shape
    m_total = sft_a.shape[0]
    if block is None:
        block = (32, 256 if n % 256 == 0 else 128)
    bm, bn = block
    assert pm == panel_m and pm % bm == 0 and n % bn == 0
    sa_last = jax.lax.dynamic_slice_in_dim(sft_a, last_panel * panel_m,
                                           panel_m, axis=0)
    roff = last_panel * (panel_m // bm)
    n_rec, rec_dtype = _rec_out(kind)
    acc_leaves = (hi_acc, lo_acc)[:n_rec]

    def kern(*refs):
        c_ref, sa_ref, sb_ref = refs[0], refs[1], refs[2]
        # refs[3 : 3+n_rec] are the aliased inputs: never read
        out_refs = refs[3 + n_rec:]
        outs = _rec_body(c_ref[:], sa_ref[:], sb_ref[:], num_moduli, kind)
        for ref, val in zip(out_refs, outs):
            ref[:] = val

    tile_out = pl.BlockSpec((bm, bn), lambda i, j: (roff + i, j),
                            memory_space=pltpu.VMEM)
    tiny = pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(pm // bm, n // bn),
        in_specs=[
            pl.BlockSpec((L, bm, bn), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ] + [tiny] * n_rec,
        out_specs=(tile_out,) * n_rec,
        out_shape=tuple(jax.ShapeDtypeStruct((m_total, n), rec_dtype)
                        for _ in range(n_rec)),
        input_output_aliases={3 + i: i for i in range(n_rec)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(r8, sa_last, sft_b, *acc_leaves)
    if kind == "f64":
        return F64Bits(out[0], out[1])
    return out if not isinstance(out, (tuple, list)) else out[0]


def _slice_rows(x, start: int, size: int, kind: str):
    if kind == "f64":
        return F64Bits(jax.lax.slice_in_dim(x.hi, start, start + size,
                                            axis=0),
                       jax.lax.slice_in_dim(x.lo, start, start + size,
                                            axis=0))
    return jax.lax.slice_in_dim(x, start, start + size, axis=0)


def gemm_pipelined(a, b, num_moduli: int, kind: str = "f64",
                   panel_m: int = 1024, bn: int = 512,
                   sfts=None, encode_rider: bool = False,
                   a8=None, b_rider: bool = False,
                   acc_out: bool = True):
    """GEMM emulation with the panel/rider pipeline. Bit-identical to
    gemm_core's one-shot pallas path (same stats, encode, Barrett, and
    reconstruct bodies); only the schedule differs.
    kind: the OUTPUT kind — "f64" (F64Bits out) or "f32" (f32 array out,
    the SGEMM path). Each operand may independently be F64Bits or an f32
    array (mixed-precision calls pipeline too); riders read f64 sources
    as hi/lo pairs and f32 sources as one uint32 bitcast.
    sfts: optional precomputed (sft_a, sft_b) from the caller's stats pass
    (fast OR accurate mode — the schedule is shift-agnostic).
    encode_rider: additionally pipeline A's per-panel encode into the
    previous panel's matmul (only panel 0 is encoded up front).
    a8: optional pre-encoded (L, m, k) slices of A — used by the
    column-panel schedule, which encodes A once and reuses it across
    panels (mutually exclusive with encode_rider).
    b_rider: split panel 0's matmul into column halves so only B's left
    half is encoded up front and the right half rides the left-half
    matmul (requires encode_rider; matmul_bsplit_pair).
    acc_out: alias-chain the rider reconstructs into one full-size (m, n)
    output instead of concatenating per-panel pieces at the end."""
    m, k = a.shape
    n = b.shape[1]
    P = m // panel_m
    if m % panel_m or P < 2:
        # the schedule needs >= 2 panels (panel p's matmul carries panel
        # p-1's reconstruct); callers gate via choose_panels/
        # pipeline_applicable, which enforce the same bound
        raise ValueError(
            f"panel pipeline needs m a multiple of panel_m with at least "
            f"2 panels; got m={m}, panel_m={panel_m}")
    a_kind = "f64" if isinstance(a, F64Bits) else "f32"
    b_kind = "f64" if isinstance(b, F64Bits) else "f32"
    if b_rider:
        assert encode_rider \
            and bsplit_applicable(m, n, k, num_moduli, panel_m, bn)
    if sfts is not None:
        sft_a, sft_b = sfts
    else:
        sft_a = fast_sft_pallas(a, num_moduli, axis=1)
        sft_b = fast_sft_pallas(b, num_moduli, axis=0)
    # the riders' encode source: f64 rides the hi/lo pair, f32 rides ONE
    # uint32 bitcast (computed once here, not per rider call)
    a_rider_src = a
    if a_kind == "f32" and (encode_rider or b_rider):
        a_rider_src = _RawSrc(_src_arrays(a, "f32")[0])
    if b_rider:
        b8 = encode_slices_pallas(b, sft_b, num_moduli, axis=0,
                                  col_tiles=(0, (n // 2) // ENC_BLOCK[1]))
        b_src = b if b_kind == "f64" else _RawSrc(_src_arrays(b, "f32")[0])
    else:
        b8 = encode_slices_pallas(b, sft_b, num_moduli, axis=0)
    if a8 is not None:
        assert not encode_rider
        a8_p = a8
    elif encode_rider:
        a0 = _slice_rows(a, 0, panel_m, a_kind)
        a8_p = encode_slices_pallas(a0, sft_a[:panel_m], num_moduli, axis=1)
    else:
        a8_p = encode_slices_pallas(a, sft_a, num_moduli, axis=1)
    n_rec, _ = _rec_out(kind)
    pieces = []      # per-panel reconstruct leaf tuples (acc_out=False)
    acc_leaves = None
    if b_rider:
        r_prev, b8, a8_p = matmul_bsplit_pair(
            a8_p, b8, b_src, sft_a, sft_b, num_moduli, panel_m, bn,
            a_src=a_rider_src if P > 1 else None,
            a_kind=a_kind, b_kind=b_kind)
        p_start = 1
    else:
        r_prev = None
        p_start = 0
    for p in range(p_start, P):
        src = a_rider_src if (encode_rider and p < P - 1) else None
        if acc_out and r_prev is not None:
            acc = acc_leaves if acc_leaves is not None else "fresh"
        else:
            acc = None
        r_p, rec_leaves, a8_next = matmul_rider_step(
            a8_p, b8, p, r_prev, p - 1, sft_a, sft_b, num_moduli,
            panel_m=panel_m, bn=bn, a_src=src, next_panel=p + 1,
            acc=acc, a_kind=a_kind, out_kind=kind)
        if acc is not None:
            acc_leaves = rec_leaves
        elif rec_leaves is not None:
            pieces.append(rec_leaves)
        r_prev = r_p
        if a8_next is not None:
            a8_p = a8_next
    if acc_out:
        hi_acc = acc_leaves[0]
        lo_acc = acc_leaves[1] if n_rec == 2 else None
        return _reconstruct_into(r_prev, sft_a, sft_b, num_moduli,
                                 hi_acc, lo_acc, P - 1, panel_m, kind=kind)
    sa_last = jax.lax.dynamic_slice_in_dim(sft_a, (P - 1) * panel_m,
                                           panel_m, axis=0)
    last = reconstruct_pallas(r_prev, sa_last, sft_b, num_moduli, kind)
    if kind == "f64":
        pieces.append((last.hi, last.lo))
        return F64Bits(jnp.concatenate([t[0] for t in pieces], axis=0),
                       jnp.concatenate([t[1] for t in pieces], axis=0))
    pieces.append((last,))
    return jnp.concatenate([t[0] for t in pieces], axis=0)


class _RawSrc:
    """Adapter marking an operand already in rider-source form (the f32
    path's uint32 bitcast): _src_arrays must pass it through unchanged."""

    def __init__(self, bits):
        self.bits = bits


def gemm_fast_pipelined_f64(a: F64Bits, b: F64Bits, num_moduli: int,
                            **kw) -> F64Bits:
    """f64 entry point (historical name; see gemm_pipelined)."""
    return gemm_pipelined(a, b, num_moduli, kind="f64", **kw)
