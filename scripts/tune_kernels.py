"""Block tuning for encode / reconstruct / matmul Pallas kernels on TPU."""

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
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    which = sys.argv[3] if len(sys.argv) > 3 else "all"
    rng = np.random.default_rng(0)
    a = (rng.random((n, n)) - 0.5) * np.exp(rng.standard_normal((n, n)) * 0.5)
    u = np.ascontiguousarray(a).view(np.uint32).reshape(n, n, 2)
    A = F64Bits(jnp.asarray(u[..., 1]), jnp.asarray(u[..., 0]))
    sft = pk.fast_sft_pallas(A, L, axis=1)

    if which in ("all", "stats"):
        for blk in [(512, 2048), (512, 1024), (256, 4096)]:
            try:
                f = jax.jit(lambda x, b=blk: pk.fast_sft_pallas(
                    x, L, axis=1, block=b))
                t, _ = timeit(f, A)
                g = jax.jit(lambda x, b=blk: pk.fast_sft_pallas(
                    x, L, axis=0, block=b))
                t0, _ = timeit(g, A)
                print(f"stats {blk}: ax1 {t*1e3:6.2f} ms  ax0 {t0*1e3:6.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"stats {blk}: FAIL {str(e)[:80]}", flush=True)

    if which in ("all", "encode"):
        # MXU-path candidates (minimal sublanes, wide second dim) — the
        # default path since GEMMUL8_MXU_ENC landed; the trailing rows
        # tune the VPU fallback (mxu=False) at its own best shapes
        for blk in [(8, 4096), (8, 2048), (16, 2048), (8, 8192)]:
            try:
                f = jax.jit(lambda x, s, b=blk: pk.encode_slices_pallas(
                    x, s, L, axis=1, block=b))
                t, _ = timeit(f, A, sft)
                print(f"encode mxu {blk}: {t*1e3:7.2f} ms", flush=True)
            except Exception as e:
                print(f"encode mxu {blk}: FAIL {str(e)[:80]}", flush=True)
        for blk in [(64, 512), (64, 256), (32, 256)]:
            try:
                f = jax.jit(lambda x, s, b=blk: pk.encode_slices_pallas(
                    x, s, L, axis=1, block=b, mxu=False))
                t, _ = timeit(f, A, sft)
                print(f"encode vpu {blk}: {t*1e3:7.2f} ms", flush=True)
            except Exception as e:
                print(f"encode vpu {blk}: FAIL {str(e)[:80]}", flush=True)

    if which in ("all", "fusedenc"):
        for br in [32, 64, 128, 256]:
            try:
                f = jax.jit(lambda x, r=br: pk.fast_encode_fused_pallas(
                    x, L, axis=1, block_rows=r)[0])
                t, _ = timeit(f, A)
                g = jax.jit(lambda x, r=br: pk.fast_encode_fused_pallas(
                    x, L, axis=0, block_rows=r)[0])
                t0, _ = timeit(g, A)
                print(f"fusedenc br={br}: ax1 {t*1e3:7.2f} ms  "
                      f"ax0 {t0*1e3:7.2f} ms", flush=True)
            except Exception as e:
                print(f"fusedenc br={br}: FAIL {str(e)[:80]}", flush=True)

    if which in ("all", "mmpipe"):
        a8 = jnp.asarray(rng.integers(-128, 128, (L, n, n), dtype=np.int8))
        b8 = jnp.asarray(rng.integers(-128, 128, (L, n, n), dtype=np.int8))
        for blk in [(1024, 512), (2048, 256), (4096, 256), (1024, 256)]:
            try:
                f = jax.jit(lambda x, y, b=blk: pm.matmul_mod_u8_pipelined(
                    x, y, L, block=b))
                t, _ = timeit(f, a8, b8)
                tops = 2 * L * n**3 / t / 1e12
                print(f"mmpipe {blk}: {t*1e3:7.2f} ms {tops:6.1f} TOPS",
                      flush=True)
            except Exception as e:
                print(f"mmpipe {blk}: FAIL {str(e)[:80]}", flush=True)

    if which in ("all", "recon"):
        r8 = jnp.asarray(rng.integers(0, 173, (L, n, n), dtype=np.uint8))
        sft_b = sft.T
        for blk in [(8, 4096), (8, 2048), (16, 1024), (32, 512), (32, 256),
                    (16, 512)]:
            try:
                f = jax.jit(lambda r, sa, sb, b=blk: pk.reconstruct_pallas(
                    r, sa, sb, L, "f64", block=b))
                t, _ = timeit(f, r8, sft, sft_b)
                print(f"recon {blk}: {t*1e3:7.2f} ms", flush=True)
            except Exception as e:
                print(f"recon {blk}: FAIL {str(e)[:80]}", flush=True)

    if which in ("all", "matmul"):
        a8 = jnp.asarray(rng.integers(-128, 128, (L, n, n), dtype=np.int8))
        b8 = jnp.asarray(rng.integers(-128, 128, (L, n, n), dtype=np.int8))
        for blk in [(512, 512, 8192), (1024, 512, 8192), (2048, 512, 8192),
                    (4096, 512, 8192), (2048, 256, 8192), (512, 512, 8192),
                    (8192, 256, 8192)]:
            try:
                f = jax.jit(lambda x, y, b=blk: pm.matmul_mod_u8_pallas(
                    x, y, L, block=b))
                t, _ = timeit(f, a8, b8)
                tops = 2 * L * n**3 / t / 1e12
                print(f"matmul {blk}: {t*1e3:7.2f} ms {tops:6.1f} TOPS",
                      flush=True)
            except Exception as e:
                print(f"matmul {blk}: FAIL {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
