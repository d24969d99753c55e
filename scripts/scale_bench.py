"""Large-problem throughput: 16384^3 via the column-panel schedule.

The one-shot 16384^3 emulation needs ~17 GB of slice tensors (exceeds
the 16 GB v5e HBM); gemm_core_panels encodes A once and streams B /
residues / output one n-panel at a time (PERF_NOTES.md "Scale
behavior"). Chained-enqueue protocol as in bench.py.

    python scripts/scale_bench.py [n] [n_panel] [num_moduli] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n_panel = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 14
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from gemmul8_tpu.bench.timing import require_tpu
    require_tpu()
    import jax.numpy as jnp
    import numpy as np

    from gemmul8_tpu.bench.matrices import phi_matrix
    from gemmul8_tpu.bench.native import dd_gemm, relerr_vs_dd
    from gemmul8_tpu.core import gemm as gg
    from gemmul8_tpu.types import F64Bits, bits_to_f64, f64_to_bits

    a = phi_matrix(n, n, 0.5, seed=0)
    A = f64_to_bits(a)
    B = f64_to_bits(a.T.copy())

    def run(x, y_hi, y_lo, s_prev):
        y_lo = y_lo.at[0, 0].set(y_lo[0, 0] ^ (s_prev & jnp.uint32(1)))
        o = gg.gemm_core_panels(x, F64Bits(y_hi, y_lo), L, True, "f64",
                                n_panel=n_panel)
        return o, jnp.sum(o.hi[::64, ::64] ^ o.lo[::64, ::64]), y_lo

    f = jax.jit(run, donate_argnums=(2,))
    b_lo = jnp.array(B.lo)
    s = jnp.uint32(0)
    out, s, b_lo = f(A, B.hi, b_lo, s)
    int(s)
    # accuracy gate on one tile vs the dd oracle
    got = bits_to_f64(F64Bits(out.hi[:256, :256], out.lo[:256, :256]),
                      to_numpy=True)
    ref_hi, ref_lo = dd_gemm(a[:256], np.ascontiguousarray(a.T[:, :256]))
    rel, _ = relerr_vs_dd(got, ref_hi, ref_lo)
    assert rel < 1e-8, f"accuracy gate: {rel:.2e}"

    def sync_rtt():
        t = time.perf_counter()
        int(jnp.sum(s))
        return time.perf_counter() - t

    sync_rtt()
    t0 = time.perf_counter()
    for _ in range(iters):
        out, s, b_lo = f(A, B.hi, b_lo, s)
    int(s)
    dt = (time.perf_counter() - t0 - sync_rtt()) / iters
    tflops = 2 * n ** 3 / dt / 1e12
    base = 72.13 * 394.5 / 1575.0
    print(f"{n}^3 L={L} panel={n_panel}: {dt*1e3:.1f} ms -> "
          f"{tflops:.2f} TFLOP/s = {tflops/base:.2f}x scaled ref "
          f"(tile relerr {rel:.2e})")


if __name__ == "__main__":
    main()
