"""Per-phase wall-clock on the real TPU for the headline 8192^3 call.

Times (block_until_ready-fenced) each stage of the pallas path used by
gemm_core, plus raw XLA int8 probes for reference. Run:
    python scripts/profile_phases.py [n] [num_moduli]
"""

import os
import sys
import time

import numpy as np

# NOTE: do not use PYTHONPATH to point here — any PYTHONPATH value breaks
# the axon TPU plugin discovery in this environment.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(out):
    """Force real completion: under the axon tunnel block_until_ready can
    return before execution finishes, so read one element back to host."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    for t in leaves:
        if hasattr(t, "block_until_ready"):
            t.block_until_ready()
    t = leaves[0]
    np.asarray(jax.device_get(t.ravel()[0]))
    return out


_SYNC_OVERHEAD = None


def sync_overhead():
    """Measured cost of one sync round trip through the tunnel (~60 ms)."""
    global _SYNC_OVERHEAD
    if _SYNC_OVERHEAD is None:
        import jax.numpy as jnp

        x = jnp.zeros((8, 128))
        sync(x)
        t0 = time.perf_counter()
        for _ in range(3):
            sync(x)
        _SYNC_OVERHEAD = (time.perf_counter() - t0) / 3
    return _SYNC_OVERHEAD


def timeit(f, *args, iters=10):
    ovh = sync_overhead()
    out = sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    dt = max(time.perf_counter() - t0 - ovh, 1e-9) / iters
    return dt, out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gemmul8_tpu.core import gemm as gg
    from gemmul8_tpu.pallas import kernels as pk
    from gemmul8_tpu.pallas import matmul as pm
    from gemmul8_tpu.types import F64Bits

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    rng = np.random.default_rng(0)
    a = (rng.random((n, n)) - 0.5) * np.exp(rng.standard_normal((n, n)) * 0.5)

    def bits(x):
        u = np.ascontiguousarray(x).view(np.uint32).reshape(x.shape + (2,))
        return F64Bits(jnp.asarray(u[..., 1]), jnp.asarray(u[..., 0]))

    A = bits(a)
    B = bits(a.T.copy())

    sft_fn = jax.jit(lambda x, ax: gg._fast_sft_only(x, L, axis=ax),
                     static_argnums=1)
    t_sft, sft_a = timeit(sft_fn, A, 1)
    _, sft_b = timeit(sft_fn, B, 0)
    print(f"sft stats       : {t_sft*1e3:8.2f} ms (x2 operands)")

    enc_fn = jax.jit(lambda x, s, ax: pk.encode_slices_pallas(x, s, L, ax),
                     static_argnums=2)
    t_enc, a8 = timeit(enc_fn, A, sft_a, 1)
    _, b8 = timeit(enc_fn, B, sft_b, 0)
    print(f"encode (pallas) : {t_enc*1e3:8.2f} ms (x2 operands)")

    mm_fn = jax.jit(lambda x, y: pm.matmul_mod_u8_pallas(x, y, L))
    t_mm, r8 = timeit(mm_fn, a8, b8)
    tops = 2 * L * n**3 / t_mm / 1e12
    print(f"matmul+mod      : {t_mm*1e3:8.2f} ms  -> {tops:6.1f} TOPS int8-equiv")

    rec_fn = jax.jit(lambda r, sa, sb: pk.reconstruct_pallas(r, sa, sb, L,
                                                             "f64"))
    t_rec, out = timeit(rec_fn, r8, sft_a, sft_b)
    print(f"reconstruct     : {t_rec*1e3:8.2f} ms")

    total = 2 * t_sft + 2 * t_enc + t_mm + t_rec
    eff = 2 * n**3 / total / 1e12
    print(f"sum             : {total*1e3:8.2f} ms -> {eff:5.2f} TFLOP/s effective")

    # raw XLA batched int8 matmul for comparison (no mod epilogue)
    xla_fn = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32))
    t_xla, _ = timeit(xla_fn, a8, b8)
    print(f"XLA batched int8: {t_xla*1e3:8.2f} ms -> "
          f"{2*L*n**3/t_xla/1e12:6.1f} TOPS")

    # single big unbatched int8 matmul probe
    a1, b1 = a8[0], b8[0]
    one_fn = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    t_one, _ = timeit(one_fn, a1, b1)
    print(f"XLA single int8 : {t_one*1e3:8.2f} ms -> "
          f"{2*n**3/t_one/1e12:6.1f} TOPS")


if __name__ == "__main__":
    main()
