"""Feasibility/timing probe for the MXU-CRT reconstruct building blocks.

The round-3 perf mechanism (PERF_NOTES.md "Where the ms must come from")
moves reconstruct's CRT weighted accumulation — ~98 const-mults + adds
per output element on the VPU — onto the MXU as one int8 contraction per
block:

    Y ((nd+1)*bm, bn) = W' ((nd+1)*bm, L*bm) @ R (L*bm, bn)

Variants isolate the cost of each building block on the real chip:
  full     center (xor+bitcast) + collapse + dot + fold consumer
  nodot    center + collapse + fold consumer (no contraction)
  dotonly  input pre-collapsed interleaved int8 (m//bm, L*bm, n): dot only
  noxor    collapse + dot on an int8 input (skip centering)

Usage:
  python scripts/probe_mxu_crt.py lower
  python scripts/probe_mxu_crt.py time [variant] [bm bn L m n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _wp(L, bm):
    """(W', nd) via the production constant builder — the probe must time
    exactly the matrix the kernel uses (kernels._crt_mxu_consts)."""
    from gemmul8_tpu import tables
    from gemmul8_tpu.pallas.kernels import _crt_mxu_consts

    nd = 2 * tables.num_limbs(L)
    return _crt_mxu_consts(L, bm)[0], nd


def _build(L, bm, bn, nd, variant, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def fold(y3):
        acc = y3[nd]
        for d in range(nd):
            acc = acc + y3[d]
        return acc

    if variant == "dotonly":
        def kern(w_ref, r_ref, o_ref):
            y = jax.lax.dot_general(w_ref[:], r_ref[0],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            o_ref[:] = fold(y.reshape(nd + 1, bm, bn))

        def f(w, r):
            mi, _, n = r.shape  # (m//bm, L*bm, n) interleaved int8
            grid = (mi, n // bn)
            return pl.pallas_call(
                kern, grid=grid,
                in_specs=[
                    pl.BlockSpec(((nd + 1) * bm, L * bm),
                                 lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, L * bm, bn), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((mi * bm, n), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(w, r)

        return f

    def kern(w_ref, r_ref, o_ref):
        r3 = r_ref[:]
        if variant == "noxor":
            rc = r3
        else:
            rc = jax.lax.bitcast_convert_type(r3 ^ jnp.uint8(0x80), jnp.int8)
        r2 = rc.reshape(L * bm, bn)
        if variant == "nodot":
            # fold sublane groups so the collapse result is consumed
            acc = r2[:bm].astype(jnp.int32)
            for j in range(1, L):
                acc = acc + r2[j * bm:(j + 1) * bm].astype(jnp.int32)
            o_ref[:] = acc
            return
        y = jax.lax.dot_general(w_ref[:], r2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o_ref[:] = fold(y.reshape(nd + 1, bm, bn))

    def f(w, r):
        _, m, n = r.shape
        grid = (m // bm, n // bn)
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[
                pl.BlockSpec(((nd + 1) * bm, L * bm), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, bm, bn), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(w, r)

    return f


def lower():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    L = 14
    for variant in ("full", "nodot", "dotonly", "noxor"):
        for bm, bn in ((8, 512), (16, 256), (32, 256)):
            wp, nd = _wp(L, bm)
            f = _build(L, bm, bn, nd, variant, interpret=False)
            w = jnp.asarray(wp)
            if variant == "dotonly":
                r = jnp.zeros((128 // bm, L * bm, 512), jnp.int8)
            elif variant == "noxor":
                r = jnp.zeros((L, 128, 512), jnp.int8)
            else:
                r = jnp.zeros((L, 128, 512), jnp.uint8)
            try:
                jax.export.export(jax.jit(f), platforms=["tpu"])(w, r)
                print(f"OK   {variant} bm={bm} bn={bn}")
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"FAIL {variant} bm={bm} bn={bn}: "
                      f"{type(e).__name__}: {msg}")


def time_on_chip(variant, bm, bn, L, m, n):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemmul8_tpu.bench.timing import require_tpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    require_tpu()
    wp, nd = _wp(L, bm)
    f = _build(L, bm, bn, nd, variant, interpret=False)
    w = jnp.asarray(wp)
    rng = np.random.default_rng(0)
    if variant == "dotonly":
        r = jnp.asarray(rng.integers(-128, 128, (m // bm, L * bm, n),
                                     dtype=np.int8))
    elif variant == "noxor":
        r = jnp.asarray(rng.integers(-128, 128, (L, m, n), dtype=np.int8))
    else:
        r = jnp.asarray(rng.integers(0, 256, (L, m, n), dtype=np.uint8))

    # chained-enqueue protocol (CLAUDE.md): each iteration's W depends on
    # the previous checksum (a zero-valued but data-dependent nudge), so
    # no layer can collapse or reorder the chain; one final sync, minus a
    # pre-warmed sync round trip
    def step(w_, r_, s_prev):
        w2 = w_.at[0, 0].add((s_prev & jnp.int32(0)).astype(jnp.int8))
        o = f(w2, r_)
        return jnp.sum(o[::64, ::64]), o

    jf = jax.jit(step)
    s, o = jf(w, r, jnp.int32(0))
    int(s)
    t0 = time.perf_counter()
    int(s)
    rtt = time.perf_counter() - t0
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        s, o = jf(w, r, s)
    int(s)
    dt = (time.perf_counter() - t0 - rtt) / iters
    print(f"{variant} bm={bm} bn={bn}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "time":
        args = sys.argv[2:]
        variant = args[0] if len(args) > 0 else "full"
        bm = int(args[1]) if len(args) > 1 else 16
        bn = int(args[2]) if len(args) > 2 else 512
        L = int(args[3]) if len(args) > 3 else 14
        m = int(args[4]) if len(args) > 4 else 8192
        n = int(args[5]) if len(args) > 5 else 8192
        time_on_chip(variant, bm, bn, L, m, n)
    else:
        lower()
