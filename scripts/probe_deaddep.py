"""Does a data dependency on the dot make rider VPU work hide?

Round-2 finding (PERF_NOTES): VPU work in the dot's own dataflow (the
Barrett epilogue) pipelines across grid steps and is fully hidden; VPU
work on independent refs (the panel riders) runs at the serial VPU rate.
Untested hypothesis: the difference is the DATAFLOW EDGE, not the work —
seeding the rider chain with a value derived from the step's dot output
might make Mosaic schedule it like the epilogue.

This probe runs the production matmul+Barrett structure (grid (l, i, j),
full-k tiles) plus an injected loop-carried VPU chain of `nops` int32
ops per element of a (bm, bn) scratch, in two flavors:
  indep    chain seeded from the scratch only (round-2 rider structure)
  deaddep  chain seeded with (x[0,0] & 1) from the step's dot product

If `deaddep` at nops=16 costs ~the nops=0 baseline while `indep` costs
baseline + serial-VPU time, the dataflow-edge trick unlocks hiding the
encode/reconstruct phases inside the matmul (round-4 mechanism).

    python scripts/probe_deaddep.py [n] [L] [nops ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(n, L, nops, variant):
    """variant: 'indep' (scratch-resident chain), 'deaddep' (chain seeded
    from the dot), 'hbmin' (chain consumes a per-step streamed HBM input
    block), 'hbmio' (hbmin + per-step streamed HBM output block) — the
    last two reproduce the real rider's memory structure."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gemmul8_tpu.pallas.matmul import (barrett_fixup_params,
                                           barrett_reduce, moduli_consts)

    bm, bn, k = 1024, 512, n
    rm, rn = 128, 512           # rider tile (per-step streamed block)
    mods, recips = moduli_consts(range(L))
    bias, fix_steps = barrett_fixup_params(k, tuple(range(L)))
    hbm_in = variant in ("hbmin", "hbmio")
    hbm_out = variant == "hbmio"
    recbody = variant in ("recbody", "recmxu")
    if variant == "recbody":
        rm = 64                 # ~32K elems/step: the real rider tile size
    if variant == "recmxu":
        rm, rn = 8, 4096        # the production MXU-CRT reconstruct shape
    live16 = variant == "live16"

    def kern(*refs):
        it = iter(refs)
        mods_ref, recips_ref = next(it), next(it)
        a_ref, b_ref = next(it), next(it)
        if recbody:
            # the REAL reconstruct tile body as the rider: per-step
            # streamed uint8 residue block -> f64 hi/lo blocks, all with
            # pure affine index maps (the structural difference from the
            # round-2 rider implementation)
            from gemmul8_tpu.pallas.kernels import (_centered_residues,
                                                    _crt_accumulate_mxu,
                                                    _crt_mxu_consts,
                                                    _finalize_tile,
                                                    _rec_body)

            r_ref = next(it)
            w_ref = next(it) if variant == "recmxu" else None
            o_ref, aux_ref, hi_ref, lo_ref = (next(it), next(it),
                                              next(it), next(it))
            l = pl.program_id(0)
            x = jax.lax.dot_general(a_ref[0], b_ref[0],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            o_ref[0] = barrett_reduce(x, mods_ref[l], recips_ref[l],
                                      bias, fix_steps).astype(jnp.uint8)
            sfta = jnp.zeros((rm, 1), jnp.int32)
            sftb = jnp.zeros((1, rn), jnp.int32)
            if variant == "recmxu":
                _, cl = _crt_mxu_consts(L, rm)
                rc2 = _centered_residues(r_ref[0], L)
                xl = _crt_accumulate_mxu(rc2, w_ref[:], L, cl, rm, rn)
                hi, lo = _finalize_tile(xl, sfta, sftb, L, "f64")
            else:
                hi, lo = _rec_body(r_ref[0], sfta, sftb, L, "f64")
            hi_ref[0] = hi
            lo_ref[0] = lo
            aux_ref[:] = hi[:8, :128].astype(jnp.int32)
            return
        r_ref = next(it) if hbm_in else None
        o_ref, aux_ref = next(it), next(it)
        ro_ref = next(it) if hbm_out else None
        v_ref = next(it)
        l = pl.program_id(0)
        x = jax.lax.dot_general(a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o_ref[0] = barrett_reduce(x, mods_ref[l], recips_ref[l],
                                  bias, fix_steps).astype(jnp.uint8)
        if nops:
            if hbm_in:
                v = r_ref[0]                  # fresh per-step HBM block
            else:
                seed = (x[0, 0] & jnp.int32(1)) \
                    if variant == "deaddep" else jnp.int32(0)
                v = v_ref[:] + seed
            for _ in range(nops // 2):
                v = v * jnp.int32(3) + jnp.int32(1)
            if hbm_out:
                ro_ref[0] = v
            elif hbm_in:
                v_ref[:rm] = v                # consume without HBM write
            else:
                v_ref[:] = v
            aux_ref[:] = (v_ref[:rm] if hbm_in and not hbm_out
                          else v)[:8, :128]

    def f(a8, b8, rin):
        mi, nj = n // bm, n // bn
        grid = (L, mi, nj)
        steps = L * mi * nj
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bm, k), lambda l, i, j: (l, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, bn), lambda l, i, j: (l, 0, j),
                         memory_space=pltpu.VMEM),
        ]
        args = [mods, recips, a8, b8]
        if recbody:
            sidx = lambda l, i, j: ((l * (n // 1024) + i) * (n // 512) + j,
                                    0, 0, 0)
            sidx3 = lambda l, i, j: ((l * (n // 1024) + i) * (n // 512) + j,
                                     0, 0)
            in_specs.append(pl.BlockSpec((1, L, rm, rn), sidx,
                                         memory_space=pltpu.VMEM))
            args.append(rin)
            if variant == "recmxu":
                from gemmul8_tpu.pallas.kernels import _crt_mxu_consts
                wp = _crt_mxu_consts(L, rm)[0]
                in_specs.append(pl.BlockSpec(wp.shape, lambda l, i, j: (0, 0),
                                             memory_space=pltpu.VMEM))
                args.append(jnp.asarray(wp))
            out_specs = (
                pl.BlockSpec((1, bm, bn), lambda l, i, j: (l, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda l, i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rm, rn), sidx3, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rm, rn), sidx3, memory_space=pltpu.VMEM))
            out_shapes = (
                jax.ShapeDtypeStruct((L, n, n), jnp.uint8),
                jax.ShapeDtypeStruct((8, 128), jnp.int32),
                jax.ShapeDtypeStruct((steps, rm, rn), jnp.uint32),
                jax.ShapeDtypeStruct((steps, rm, rn), jnp.uint32))
            return pl.pallas_call(
                kern, grid=grid,
                in_specs=in_specs, out_specs=out_specs,
                out_shape=out_shapes,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary"),
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=jax.default_backend() != "tpu",
            )(*args)
        if hbm_in:
            in_specs.append(pl.BlockSpec(
                (1, rm, rn),
                lambda l, i, j: ((l * (n // 1024) + i) * (n // 512) + j,
                                 0, 0),
                memory_space=pltpu.VMEM))
            args.append(rin)
        out_specs = [
            pl.BlockSpec((1, bm, bn), lambda l, i, j: (l, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda l, i, j: (0, 0),
                         memory_space=pltpu.VMEM)]
        out_shapes = [jax.ShapeDtypeStruct((L, n, n), jnp.uint8),
                      jax.ShapeDtypeStruct((8, 128), jnp.int32)]
        if hbm_out:
            out_specs.append(pl.BlockSpec(
                (1, rm, rn),
                lambda l, i, j: ((l * (n // 1024) + i) * (n // 512) + j,
                                 0, 0),
                memory_space=pltpu.VMEM))
            out_shapes.append(
                jax.ShapeDtypeStruct((steps, rm, rn), jnp.int32))
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            scratch_shapes=[pltpu.VMEM((bm if not hbm_in else rm, bn),
                                       jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=jax.default_backend() != "tpu",
        )(*args)

    return f, (L * (n // bm) * (n // bn), rm, rn)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    nops_list = [int(x) for x in sys.argv[3:]] or [0, 16, 32]

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from gemmul8_tpu.bench.timing import require_tpu
    require_tpu()
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-128, 128, (L, n, n), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-128, 128, (L, n, n), dtype=np.int8))
    rin = None

    for nops in nops_list:
        variants = ["indep", "deaddep", "hbmin", "hbmio"] if nops > 0 \
            else (["recbody"] if nops == -1
                  else ["recmxu"] if nops == -2 else ["base"])
        for tag in variants:
            f, (steps, rm, rn) = build(n, L, abs(nops), tag)
            if tag in ("hbmin", "hbmio") and rin is None:
                rin = jnp.asarray(rng.integers(
                    0, 255, (steps, rm, rn)).astype(np.int32))
            if tag in ("recbody", "recmxu"):
                rin = jnp.asarray(rng.integers(
                    0, 199, (steps, L, rm, rn)).astype(np.uint8))

            def step(x, y, r, s_prev, _f=f):
                x2 = x.at[0, 0, 0].add((s_prev & jnp.int32(0))
                                       .astype(jnp.int8))
                outs = _f(x2, y, r)
                o, aux = outs[0], outs[1]
                return jnp.sum(o[::64, ::64].astype(jnp.int32)) + aux[0, 0]

            jf = jax.jit(step)
            s = jf(a8, b8, rin, jnp.int32(0))
            int(s)
            t0 = time.perf_counter()
            int(s)
            rtt = time.perf_counter() - t0
            iters = 12
            t0 = time.perf_counter()
            for _ in range(iters):
                s = jf(a8, b8, rin, s)
            int(s)
            dt = (time.perf_counter() - t0 - rtt) / iters
            if tag in ("recbody", "recmxu"):
                print(f"{tag:13s}: {dt*1e3:7.2f} ms (real reconstruct "
                      f"rider, {steps} tiles of ({rm},{rn}); isolated "
                      "reconstruct ~ 8-14 ms)", flush=True)
                continue
            elems = (rm * rn if tag in ("hbmin", "hbmio")
                     else 1024 * 512)
            gops = steps * elems * nops / 1e9
            print(f"nops={nops:3d} {tag:8s}: {dt*1e3:7.2f} ms "
                  f"(injected {gops:5.1f} G ops ~= {gops/0.95:4.1f} ms "
                  "serial)", flush=True)


if __name__ == "__main__":
    main()
