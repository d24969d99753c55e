"""Bare repeated emulated-DGEMM call for profiler attachment.

Equivalent of the reference's profile_one_call.cu (testing/
profile_one_call.cu:5-9): one isolated 8192^3 fast-mode 14-moduli call,
loopable, with an optional jax.profiler trace dump for xprof/tensorboard."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--moduli", type=int, default=14)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace-dir", default=None,
                   help="write a jax.profiler trace here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gemmul8_tpu.core import gemm as gg
    from gemmul8_tpu.types import F64Bits

    n = args.n
    rng = np.random.default_rng(0)
    a = (rng.random((n, n)) - .5) * np.exp(rng.standard_normal((n, n)) * .5)
    u = np.ascontiguousarray(a).view(np.uint32).reshape(n, n, 2)
    A = F64Bits(jnp.asarray(u[..., 1]), jnp.asarray(u[..., 0]))
    ut = np.ascontiguousarray(a.T).view(np.uint32).reshape(n, n, 2)
    B = F64Bits(jnp.asarray(ut[..., 1]), jnp.asarray(ut[..., 0]))

    f = jax.jit(lambda x, y: gg.gemm_core(x, y, args.moduli, True, "f64"))
    out = f(A, B)
    jax.block_until_ready(out)

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(args.iters):
                out = f(A, B)
            jax.block_until_ready(out)
        print(f"trace written to {args.trace_dir}")
    def fence(o):
        # block_until_ready can return early on remote-TPU runtimes; a
        # 1-element readback is a true fence (see CLAUDE.md)
        jax.block_until_ready(o)
        np.asarray(jax.device_get(o.hi.ravel()[0]))

    fence(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = f(A, B)
    fence(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{dt * 1e3:.1f} ms/call -> {2 * n ** 3 / dt / 1e12:.2f} TFLOPS "
          "(per-iter average incl. one final sync; see bench.py for the "
          "chained headline protocol)")


if __name__ == "__main__":
    main()
