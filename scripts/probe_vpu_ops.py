"""Probe sustained VPU op rates through Mosaic: int32 vs f32 multiply /
MAC chains on a VMEM-resident block.

Protocol notes (cost hours to rediscover — see CLAUDE.md):
- per-call host dispatch through the axon tunnel is ~3 ms, so each timed
  call must run >> 3 ms of device work: the kernel loops a grid of
  STEPS over the SAME resident block (index map pinned to (0,0)), with
  an unrolled chain of REPS dependent ops per step;
- iterations are serially chained (x = f(x)) and synced once at the end.

Decides whether recasting the encode/reconstruct integer MAC chains in
exact-f32 arithmetic would beat the int32 path.

    python scripts/probe_vpu_ops.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from gemmul8_tpu.bench.timing import require_tpu
    require_tpu()  # fail fast when the axon tunnel is down
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scripts.profile_phases import sync, sync_overhead

    M, N = 512, 512
    REPS = 16                  # unrolled dependent ops per grid step
    STEPS = 2048               # grid steps over the same resident block
    # total ops/call = M*N*REPS*STEPS = 8.6 G -> ~3-6 ms device time

    def make(body, dtype):
        def kern(x_ref, o_ref):
            s = pl.program_id(0)

            @pl.when(s == 0)
            def _():
                o_ref[:] = x_ref[:]

            a = x_ref[:]
            b = o_ref[:]
            for i in range(REPS):
                b = body(b, a, i)
            o_ref[:] = b

        @jax.jit
        def f(x):
            return pl.pallas_call(
                kern,
                grid=(STEPS,),
                in_specs=[pl.BlockSpec((M, N), lambda s: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((M, N), lambda s: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x)
        return f

    ri = np.random.randint(1, 1000, (M, N)).astype(np.int32)
    rf = np.random.uniform(0.5, 2.0, (M, N)).astype(np.float32)
    cases = {
        "i32 mul":       (make(lambda b, a, i: b * a, jnp.int32), ri | 1),
        "i32 constmul":  (make(lambda b, a, i: b * np.int32(2 * i + 179),
                               jnp.int32), ri),
        "i32 constmac":  (make(lambda b, a, i: b * np.int32(2 * i + 179) + a,
                               jnp.int32), ri),
        "i32 add":       (make(lambda b, a, i: b + a, jnp.int32), ri),
        "i32 shr^":      (make(lambda b, a, i: (b >> np.int32(1)) ^ a,
                               jnp.int32), ri),
        "f32 mul":       (make(lambda b, a, i: b * a, jnp.float32),
                          np.random.uniform(0.999, 1.001, (M, N))
                          .astype(np.float32)),
        "f32 constmac":  (make(lambda b, a, i: b * np.float32(1.0001)
                               + a * np.float32(1e-6), jnp.float32), rf),
        "f32 floor":     (make(lambda b, a, i: b - jnp.floor(
                               b * np.float32(1 / 3)) * np.float32(2.9999),
                               jnp.float32),
                          np.random.uniform(100, 1000, (M, N))
                          .astype(np.float32)),
        "f32->i32 cvt":  (make(lambda b, a, i: (b.astype(jnp.float32)
                               * np.float32(1.5)).astype(jnp.int32) ^ a,
                               jnp.int32), ri),
    }

    ovh = sync_overhead()
    for name, (f, x) in cases.items():
        xj = jnp.asarray(x)
        sync(f(xj))
        it = 8
        t0 = time.perf_counter()
        out = xj
        for _ in range(it):
            out = f(out)          # serial chain: no dispatch pile-up
        sync(out)
        dt = (time.perf_counter() - t0 - ovh) / it
        ops = M * N * REPS * STEPS
        print(f"{name:14s} {dt * 1e3:7.3f} ms   {ops / dt / 1e12:6.2f} T op/s",
              flush=True)


if __name__ == "__main__":
    main()
