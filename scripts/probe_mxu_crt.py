"""Feasibility/timing probe for the MXU-CRT reconstruct building blocks.

The round-3 perf mechanism (PERF_NOTES.md "Where the ms must come from")
moves reconstruct's CRT weighted accumulation — ~98 const-mults + adds
per output element on the VPU — onto the MXU as one int8 contraction per
block:

    Y ((nd+1)*bm, bn) = W' ((nd+1)*bm, L*bm) @ R (L*bm, bn)

where R is the residue block (L, bm, bn) collapsed along sublanes and W'
is a compile-time block-diagonal matrix of centered CRT weight bytes
(plus a ones block that yields S = sum_j r_j for the zero-point fixup).

Unknowns this probe answers BEFORE the real kernel is built:
  1. Does Mosaic lower the sublane-collapse (L, bm, bn) -> (L*bm, bn)?
     Variants: jnp.reshape vs jnp.concatenate of L 2D slices.
  2. Does the in-kernel int8 dot with M=(nd+1)*bm, K=L*bm lower to the
     MXU (and at what cost)?
  3. The reshape back ((nd+1)*bm, bn) -> (nd+1, bm, bn) (split leading).

Usage:
  python scripts/probe_mxu_crt.py lower          # cross-lower only (no chip)
  python scripts/probe_mxu_crt.py time [m n L bm bn]   # time on the chip
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(L, bm, bn, nd, variant, interpret):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gemmul8_tpu import tables

    # W': ((nd+1)*bm, L*bm) int8 block-diagonal of centered weight bytes.
    w16 = np.asarray(tables.crt_weight_limbs(L), dtype=np.int64)  # (L, nl)
    nl = w16.shape[1]
    assert nd == 2 * nl
    wbytes = np.zeros((L, nd + 1), np.int32)
    for j in range(L):
        for l in range(nl):
            wbytes[j, 2 * l] = int(w16[j, l]) & 0xFF
            wbytes[j, 2 * l + 1] = (int(w16[j, l]) >> 8) & 0xFF
        wbytes[j, nd] = 128 + 1  # ones column (stored centered: 1)
    wc = (wbytes - 128).astype(np.int8)          # centered, in [-128, 127]
    wp = np.zeros(((nd + 1) * bm, L * bm), np.int8)
    for d in range(nd + 1):
        for j in range(L):
            blk = np.zeros((bm, bm), np.int8)
            np.fill_diagonal(blk, wc[j, d])
            wp[d * bm:(d + 1) * bm, j * bm:(j + 1) * bm] = blk

    def kern(w_ref, r_ref, o_ref):
        r3 = r_ref[:]                                    # (L, bm, bn) uint8
        rc = jax.lax.bitcast_convert_type(r3 ^ jnp.uint8(0x80), jnp.int8)
        if variant == "reshape":
            r2 = rc.reshape(L * bm, bn)
        else:
            r2 = jnp.concatenate([rc[j] for j in range(L)], axis=0)
        y = jax.lax.dot_general(w_ref[:], r2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y3 = y.reshape(nd + 1, bm, bn)
        # cheap consumer so nothing is dead-code-eliminated: fold the digit
        # planes into one int32 plane (NOT the real limb assembly — the
        # probe isolates collapse+dot cost)
        acc = y3[nd]
        for d in range(nd):
            acc = acc + y3[d]
        o_ref[:] = acc

    def f(w, r):
        Lr, m, n = r.shape
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

    return f, jnp.asarray(wp)


def lower():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    L, nd = 14, 16
    for variant in ("reshape", "concat"):
        for bm, bn in ((8, 512), (16, 256), (32, 256)):
            f, w = _build(L, bm, bn, nd, variant, interpret=False)
            r = jnp.zeros((L, 128, 512), jnp.uint8)
            t0 = time.time()
            try:
                jax.export.export(jax.jit(f), platforms=["tpu"])(w, r)
                print(f"OK   {variant} bm={bm} bn={bn} "
                      f"({time.time()-t0:.1f}s)")
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"FAIL {variant} bm={bm} bn={bn}: "
                      f"{type(e).__name__}: {msg}")


def time_on_chip(m=8192, n=8192, L=14, bm=16, bn=256, variant="reshape"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemmul8_tpu.bench.timing import require_tpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    require_tpu()
    nd = 16
    f, w = _build(L, bm, bn, nd, variant, interpret=False)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.integers(0, 256, (L, m, n), dtype=np.uint8))
    jf = jax.jit(f)
    o = jf(w, r)
    o.block_until_ready()
    _ = int(jnp.sum(o[::64, ::64]))  # true sync
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        o = jf(w, r + o[0, 0].astype(jnp.uint8))  # serial dependency
    _ = int(jnp.sum(o[::64, ::64]))
    t1 = time.perf_counter()
    t0s = time.perf_counter()
    _ = int(jnp.sum(o[::64, ::64]))
    rtt = time.perf_counter() - t0s
    dt = (t1 - t0 - rtt) / iters
    print(f"{variant} bm={bm} bn={bn}: {dt*1e3:.2f} ms "
          f"({L*m*n/dt/1e9:.0f} G residue/s)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "time":
        args = sys.argv[2:]
        m = int(args[0]) if len(args) > 0 else 8192
        n = int(args[1]) if len(args) > 1 else 8192
        L = int(args[2]) if len(args) > 2 else 14
        bm = int(args[3]) if len(args) > 3 else 16
        bn = int(args[4]) if len(args) > 4 else 256
        variant = args[5] if len(args) > 5 else "reshape"
        time_on_chip(m, n, L, bm, bn, variant)
    else:
        lower()
