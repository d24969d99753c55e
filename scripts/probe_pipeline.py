"""Measure the panel/rider pipeline vs the monolithic fused path on TPU.

    python scripts/probe_pipeline.py [n] [L] [iters]

Times three chained-protocol variants of the 8192^3 fast-f64 call:
  A) monolithic gemm_core (current bench path)
  B) gemm_fast_pipelined_f64 (reconstruct rides the panel matmuls)
and prints the marginal cost of the rider versus the reconstruct it hides.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gemmul8_tpu.bench.timing import chained_time
    from gemmul8_tpu.core import gemm as gg
    from gemmul8_tpu.pallas import pipelined as pp
    from gemmul8_tpu.types import F64Bits

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rng = np.random.default_rng(0)
    a = (rng.random((n, n)) - 0.5) * np.exp(rng.standard_normal((n, n)) * 0.5)
    u = np.ascontiguousarray(a).view(np.uint32).reshape(n, n, 2)
    A = F64Bits(jnp.asarray(u[..., 1]), jnp.asarray(u[..., 0]))
    bt = np.ascontiguousarray(a.T).view(np.uint32).reshape(n, n, 2)
    B = F64Bits(jnp.asarray(bt[..., 1]), jnp.asarray(bt[..., 0]))

    def mk_step(core):
        def step(st):
            ahi, alo, bhi, lo, chk = st
            lo = lo.at[0, 0].set(lo[0, 0] ^ (chk.astype(jnp.uint32)
                                             & jnp.uint32(1)))
            o = core(F64Bits(ahi, alo), F64Bits(bhi, lo))
            return ahi, alo, bhi, lo, jnp.sum(
                o.hi[::64, ::64].astype(jnp.float32))
        return jax.jit(step, donate_argnums=(0,))

    st0 = (A.hi, A.lo, B.hi, B.lo, jnp.float32(0))

    fa = mk_step(lambda x, y: gg.gemm_core(x, y, L, True, "f64"))
    t0 = time.perf_counter()
    dt_a, _ = chained_time(lambda st: fa(st), st0, iters)
    print(f"A monolithic  : {dt_a*1e3:8.2f} ms/call "
          f"-> {2*n**3/dt_a/1e12:5.2f} TFLOP/s "
          f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)

    fb = mk_step(lambda x, y: pp.gemm_fast_pipelined_f64(x, y, L))
    t0 = time.perf_counter()
    dt_b, _ = chained_time(lambda st: fb(st), st0, iters)
    print(f"B pipelined   : {dt_b*1e3:8.2f} ms/call "
          f"-> {2*n**3/dt_b/1e12:5.2f} TFLOP/s "
          f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)
    print(f"delta         : {(dt_a-dt_b)*1e3:8.2f} ms/call", flush=True)

    fc = mk_step(lambda x, y: pp.gemm_fast_pipelined_f64(
        x, y, L, encode_rider=True))
    t0 = time.perf_counter()
    dt_c, _ = chained_time(lambda st: fc(st), st0, iters)
    print(f"C enc+rec rider: {dt_c*1e3:7.2f} ms/call "
          f"-> {2*n**3/dt_c/1e12:5.2f} TFLOP/s "
          f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)
    print(f"delta vs A     : {(dt_a-dt_c)*1e3:7.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
