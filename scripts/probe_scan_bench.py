"""Quantify the tunnel's per-dispatch overhead inside the headline bench.

The chained-enqueue protocol pays one host->device dispatch per gemm call
(~0.5-3 ms through the axon tunnel). The reference's 100-iteration CUDA
loop pays ~5 us per launch — negligible. This probe times the SAME
fused gemm call two ways:

  A) chained dispatches (bench.py's current protocol)
  B) a lax.scan of SCAN_N serially-dependent calls inside ONE dispatch
     (device-side iteration; per-call dispatch cost amortized / SCAN_N)

If B is faster per call, the difference is harness artifact, not chip
time.    python scripts/probe_scan_bench.py [n] [L] [scan_n]
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

    from gemmul8_tpu.bench.timing import chained_time, fence
    from gemmul8_tpu.core import gemm as gg
    from gemmul8_tpu.types import F64Bits

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    scan_n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    rng = np.random.default_rng(0)
    a = (rng.random((n, n)) - 0.5) * np.exp(rng.standard_normal((n, n)) * 0.5)
    u = np.ascontiguousarray(a).view(np.uint32).reshape(n, n, 2)
    A = F64Bits(jnp.asarray(u[..., 1]), jnp.asarray(u[..., 0]))
    bt = np.ascontiguousarray(a.T).view(np.uint32).reshape(n, n, 2)
    B = F64Bits(jnp.asarray(bt[..., 1]), jnp.asarray(bt[..., 0]))

    # Operands are threaded through the chained state as explicit args —
    # closing over them captures 800 MB of constants INTO the serialized
    # HLO and the remote-compile upload rejects it (HTTP 413).

    # A) chained dispatches (bench.py protocol)
    def step(st):
        ahi, alo, bhi, lo, chk = st
        lo = lo.at[0, 0].set(lo[0, 0] ^ (chk.astype(jnp.uint32)
                                         & jnp.uint32(1)))
        o = gg.gemm_core(F64Bits(ahi, alo), F64Bits(bhi, lo), L, True, "f64")
        return ahi, alo, bhi, lo, jnp.sum(
            o.hi[::64, ::64].astype(jnp.float32))

    f = jax.jit(step, donate_argnums=(0,))
    st0 = (A.hi, A.lo, B.hi, B.lo, jnp.float32(0))
    dt_a, _ = chained_time(lambda st: f(st), st0, 8)
    print(f"A chained dispatch : {dt_a*1e3:8.2f} ms/call "
          f"-> {2*n**3/dt_a/1e12:5.2f} TFLOP/s", flush=True)

    # B) device-side iteration: scan of scan_n dependent calls per dispatch
    def scan_body(carry, _):
        ahi, alo, bhi, lo, chk = carry
        lo = lo.at[0, 0].set(lo[0, 0] ^ (chk.astype(jnp.uint32)
                                         & jnp.uint32(1)))
        o = gg.gemm_core(F64Bits(ahi, alo), F64Bits(bhi, lo), L, True, "f64")
        return (ahi, alo, bhi, lo,
                jnp.sum(o.hi[::64, ::64].astype(jnp.float32))), None

    def stepN(st):
        out, _ = jax.lax.scan(scan_body, st, None, length=scan_n)
        return out

    g = jax.jit(stepN, donate_argnums=(0,))
    dt_b, _ = chained_time(lambda st: g(st), st0, 4)
    per = dt_b / scan_n
    print(f"B scan x{scan_n} device : {per*1e3:8.2f} ms/call "
          f"-> {2*n**3/per/1e12:5.2f} TFLOP/s", flush=True)
    print(f"dispatch artifact  : {(dt_a-per)*1e3:8.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
