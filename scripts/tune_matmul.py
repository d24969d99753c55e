"""Block-size tuning for the fused int8 matmul+mod Pallas kernel."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(out):
    import jax

    for t in jax.tree_util.tree_leaves(out):
        if hasattr(t, "block_until_ready"):
            t.block_until_ready()
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return out


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
    out = sync(f(*args))
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
    from gemmul8_tpu.pallas import matmul as pm

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-128, 128, (L, n, n), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-128, 128, (L, n, n), dtype=np.int8))

    configs = [
        (512, 512, 2048),
        (1024, 1024, 1024),
        (1024, 1024, 2048),
        (1024, 1024, 4096),
        (2048, 2048, 1024),
        (2048, 2048, 2048),
        (1024, 2048, 2048),
        (2048, 1024, 2048),
        (4096, 1024, 1024),
    ]
    for blk in configs:
        try:
            f = jax.jit(lambda x, y, b=blk: pm.matmul_mod_u8_pallas(
                x, y, L, block=b))
            t, _ = timeit(f, a8, b8)
            tops = 2 * L * n**3 / t / 1e12
            print(f"block {blk}: {t*1e3:7.2f} ms  {tops:6.1f} TOPS "
                  f"({100*tops/394.5:4.1f}% peak)", flush=True)
        except Exception as e:
            print(f"block {blk}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
