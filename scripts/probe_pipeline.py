"""Measure the panel/rider pipeline vs the monolithic fused path on TPU.

    python scripts/probe_pipeline.py [n] [L] [iters] [panel_m,...] [d|f]

Times chained-protocol variants of the 8192^3 fast call (f64 by default;
'f' probes the pure-f32 SGEMM pipeline, e.g. L=6 or 8):
  A) monolithic gemm_core (current bench path)
  B) gemm_pipelined (reconstruct rides the panel matmuls)
  C) + encode rider
  D) + B-split first panel
  (with a 4th argv: B-D repeated per listed panel_m)
and prints the marginal cost of the rider versus the reconstruct it hides.
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

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gemmul8_tpu.bench.timing import chained_time
    from gemmul8_tpu.core import gemm as gg
    from gemmul8_tpu.pallas import pipelined as pp
    from gemmul8_tpu.types import F64Bits

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    kind = "f32" if (len(sys.argv) > 5 and sys.argv[5] == "f") else "f64"
    rng = np.random.default_rng(0)
    a = (rng.random((n, n)) - 0.5) * np.exp(rng.standard_normal((n, n)) * 0.5)
    if kind == "f64":
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
    else:
        A = jnp.asarray(a, jnp.float32)
        B = jnp.asarray(a.T.copy(), jnp.float32)

        def mk_step(core):
            def step(st):
                x, y, chk = st
                y = y.at[0, 0].add(0 * chk)  # serial dep, value-preserving
                o = core(x, y)
                return x, y, jnp.sum(o[::64, ::64])
            return jax.jit(step, donate_argnums=(0,))

        st0 = (A, B, jnp.float32(0))

    # NB: donate_argnums=(0,) donates EVERY leaf of the state tuple, so a
    # variant's st0 buffers are consumed by its run — thread the returned
    # final state into the next variant (same structure; only a mantissa
    # LSB of B differs, which is timing-irrelevant).
    fa = mk_step(lambda x, y: gg.gemm_core(x, y, L, True, kind))
    t0 = time.perf_counter()
    dt_a, st0 = chained_time(lambda st: fa(st), st0, iters)
    print(f"A monolithic  : {dt_a*1e3:8.2f} ms/call "
          f"-> {2*n**3/dt_a/1e12:5.2f} TFLOP/s "
          f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)

    panels = ([int(x) for x in sys.argv[4].split(",")]
              if len(sys.argv) > 4 else [1024])
    for pm_ in panels:
        cfg = pp.choose_panels(n, n, n, L) if pm_ == 0 else (pm_, 512)
        fb = mk_step(lambda x, y, c=cfg: pp.gemm_pipelined(
            x, y, L, kind=kind, panel_m=c[0], bn=c[1]))
        t0 = time.perf_counter()
        dt_b, st0 = chained_time(lambda st: fb(st), st0, iters)
        print(f"B rec rider  pm={cfg[0]:5d}: {dt_b*1e3:8.2f} ms/call "
              f"-> {2*n**3/dt_b/1e12:5.2f} TFLOP/s "
              f"(d vs A {(dt_a-dt_b)*1e3:+7.2f} ms; "
              f"wall {time.perf_counter()-t0:.0f}s)", flush=True)

        if os.environ.get("GEMMUL8_PROBE_B_ONLY") == "1":
            continue
        if not pp.pipeline_applicable(n, n, n, L, panel_m=cfg[0],
                                      bn=cfg[1], encode_rider=True):
            continue
        fc = mk_step(lambda x, y, c=cfg: pp.gemm_pipelined(
            x, y, L, kind=kind, panel_m=c[0], bn=c[1], encode_rider=True))
        t0 = time.perf_counter()
        dt_c, st0 = chained_time(lambda st: fc(st), st0, iters)
        print(f"C enc+rec    pm={cfg[0]:5d}: {dt_c*1e3:8.2f} ms/call "
              f"-> {2*n**3/dt_c/1e12:5.2f} TFLOP/s "
              f"(d vs A {(dt_a-dt_c)*1e3:+7.2f} ms; "
              f"wall {time.perf_counter()-t0:.0f}s)", flush=True)

        if not pp.bsplit_applicable(n, n, n, L, panel_m=cfg[0], bn=cfg[1]):
            continue
        fd = mk_step(lambda x, y, c=cfg: pp.gemm_pipelined(
            x, y, L, kind=kind, panel_m=c[0], bn=c[1], encode_rider=True,
            b_rider=True))
        t0 = time.perf_counter()
        dt_d, st0 = chained_time(lambda st: fd(st), st0, iters)
        print(f"D +B-split   pm={cfg[0]:5d}: {dt_d*1e3:8.2f} ms/call "
              f"-> {2*n**3/dt_d/1e12:5.2f} TFLOP/s "
              f"(d vs A {(dt_a-dt_d)*1e3:+7.2f} ms; "
              f"wall {time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
