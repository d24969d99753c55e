"""Accurate-mode pre-phase (mag7 + magnitude GEMM) timing on the chip.

VERDICT r4 item 2: t_scale is ~5 ms higher in accurate mode than fast at
8192^3 against a ~2.3 ms theoretical cost. Compares the two-kernel
emax+mag7 pair vs the fused one-pass kernel, and magmax block variants.
Run: python scripts/probe_accurate_pre.py [n]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    for t in leaves:
        if hasattr(t, "block_until_ready"):
            t.block_until_ready()
    np.asarray(jax.device_get(leaves[0].ravel()[0]))


_OVH = None


def sync_overhead():
    global _OVH
    if _OVH is None:
        import jax.numpy as jnp

        x = jnp.zeros((8, 128))
        sync(x)
        t0 = time.perf_counter()
        for _ in range(3):
            sync(x)
        _OVH = (time.perf_counter() - t0) / 3
    return _OVH


def timeit(f, *args, iters=10):
    ovh = sync_overhead()
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    return max(time.perf_counter() - t0 - ovh, 1e-9) / iters, out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gemmul8_tpu.pallas import kernels as pk
    from gemmul8_tpu.pallas import matmul as pm
    from gemmul8_tpu.types import F64Bits

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rng = np.random.default_rng(0)
    a = (rng.random((n, n)) - 0.5) * np.exp(rng.standard_normal((n, n)) * .5)
    u = np.ascontiguousarray(a).view(np.uint32).reshape(n, n, 2)
    A = F64Bits(jnp.asarray(u[..., 1]), jnp.asarray(u[..., 0]))

    two = jax.jit(lambda x, ax: (pk.mag7_pallas(x, pk.emax_pallas(x, ax),
                                                ax)), static_argnums=1)
    t1, _ = timeit(two, A, 1)
    t1b, _ = timeit(two, A, 0)
    print(f"two-kernel mag7: ax1 {t1*1e3:6.2f} ms  ax0 {t1b*1e3:6.2f} ms",
          flush=True)
    for br in (32, 64, 128, 256):
        fus = jax.jit(lambda x, ax, r=br: pk.mag7_fused_pallas(
            x, ax, block_rows=r)[0], static_argnums=1)
        try:
            t2, _ = timeit(fus, A, 1)
            t2b, _ = timeit(fus, A, 0)
            print(f"fused mag7 br={br:3d}: ax1 {t2*1e3:6.2f} ms  "
                  f"ax0 {t2b*1e3:6.2f} ms", flush=True)
        except Exception as e:
            print(f"fused mag7 br={br}: FAIL {str(e)[:80]}", flush=True)

    mag_a, _ = pk.mag7_fused_pallas(A, 1)
    mag_b, _ = pk.mag7_fused_pallas(A, 0)
    for blk in ((1024, 1024, 8192), (1024, 512, 8192), (2048, 1024, 8192),
                (512, 512, 8192)):
        f = jax.jit(lambda x, y, b=blk: pm.magmax_matmul_pallas(x, y,
                                                                block=b))
        try:
            t3, _ = timeit(f, mag_a, mag_b)
            print(f"magmax {blk}: {t3*1e3:6.2f} ms", flush=True)
        except Exception as e:
            print(f"magmax {blk}: FAIL {str(e)[:80]}", flush=True)

    # end-to-end accurate vs fast core
    from gemmul8_tpu.core import gemm as gg

    for fm in (True, False):
        f = jax.jit(lambda x, y, m=fm: gg.gemm_core(
            x, y, 14, m, "f64", use_pallas=True))
        t4, _ = timeit(f, A, A, iters=5)
        tf = 2 * n**3 / t4 / 1e12
        print(f"gemm_core fast={fm}: {t4*1e3:7.2f} ms  {tf:5.2f} TF",
              flush=True)


if __name__ == "__main__":
    main()

# (variants appended round 5; run via: python scripts/probe_accurate_pre.py magmax)
