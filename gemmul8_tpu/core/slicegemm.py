"""Per-modulus int8 slice products on the MXU + modular reduction.

The error-free core of the scheme: for each modulus the centered residue
slices satisfy |a8|,|b8| <= 128, so with k <= 2^17 the int8 x int8 -> int32
dot products are exact, and C32 mod m_j recovers the residue of the true
integer product.  (Reference: the cublasGemmEx CUDA_R_8I loop at
/root/reference/GEMMul8/src/gemmul8.cu:259-275 and the Barrett uint8
reduction at src/conv_32i_2_8u.hpp:25-56.)

On TPU the batched moduli axis maps to one batched dot_general, which XLA
lowers to native int8 MXU matmuls; the mod-reduce is a VPU epilogue XLA
fuses into the surrounding graph (a Pallas fused-epilogue matmul variant
lives in gemmul8_tpu.pallas for when fusion isn't enough).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import tables
from .modmath import mod_i32

_I32 = jnp.int32


def slice_products(a8: jax.Array, b8: jax.Array) -> jax.Array:
    """(L, m, k) int8 x (L, k, n) int8 -> (L, m, n) int32, exact."""
    return jax.lax.dot_general(
        a8, b8,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )


def mod_reduce(c32: jax.Array, num_moduli: int, moduli_idx=None) -> jax.Array:
    """Canonical residues of the slice products: (L, m, n) int32 in [0, m_j).

    jnp floor-mod with positive divisor yields [0, m) for any sign. The
    modulus-256 slice is a pure bitmask."""
    if moduli_idx is None:
        moduli_idx = tuple(range(num_moduli))
    outs = []
    for jj, j in enumerate(moduli_idx):
        m = int(tables.MODULI[j])
        if m == 256:
            outs.append(c32[jj] & _I32(255))
        else:
            outs.append(mod_i32(c32[jj], m))
    return jnp.stack(outs, axis=0)


def int8_peak_probe(n: int = 4096, iters: int = 10) -> float:
    """Raw int8 MXU throughput probe (TOPS) — the analog of the reference's
    INT8-GEMM ones-matrix row (testing/test_double.cu:287-309).

    `iters` is a MINIMUM: the probe raises it to at least 30 so one tunnel
    round trip of jitter cannot swing the per-iteration time (see below).

    Uses the repo's chained timing protocol (each iteration's operand
    depends on the previous product; single final readback fence; one
    measured sync round trip subtracted) so the number reflects the chip,
    not the host link."""
    import time

    import numpy as np

    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.randint(ka, (n, n), -128, 128, dtype=jnp.int8)
    b = jax.random.randint(kb, (n, n), -128, 128, dtype=jnp.int8)

    @jax.jit
    def step(a, b):
        c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # chain: next a depends on this product (cheap elementwise fold)
        return (a ^ c.astype(jnp.int8)), c[0, 0]

    def fence(x):
        x.block_until_ready()
        np.asarray(jax.device_get(x))

    # enough chained iterations that one tunnel round trip of jitter
    # cannot swing the per-iteration time (a single ~60 ms RTT sample has
    # tens of ms of variance). At small n the per-iteration device time
    # shrinks below the jitter floor and the subtraction can even push
    # the probe ABOVE hardware peak (the 4096 row once printed 519 TOPS
    # on a 394.5-peak chip) — scale iterations so total device time is
    # >= ~0.1 s regardless of size.
    est_iter_s = 2 * n ** 3 / 300e12   # conservative 300 TOPS estimate
    # cap: at small n the 0.1 s target would need ~10^5 chained dispatches
    # (minutes of ~3 ms tunnel dispatch overhead measuring nothing). 2000
    # dispatches bound wall time at ~6 s; below the size where that reaches
    # 0.1 s of device time the probe is dispatch-bound by nature and the
    # result reflects achievable-at-this-size, not chip peak.
    iters = max(iters, 30, min(int(0.1 / est_iter_s) + 1, 2000))
    ai, s = step(a, b)
    fence(s)
    # sync-cost sample: min of 3 (jitter is one-sided)
    t_sync = min(_sample_sync(fence, s) for _ in range(3))
    t0 = time.perf_counter()
    for _ in range(iters):
        ai, s = step(ai, b)
    fence(s)
    t_total = time.perf_counter() - t0
    dt = max(t_total - t_sync, 1e-9) / iters
    return 2 * n ** 3 / dt / 1e12


def _sample_sync(fence, s) -> float:
    import time

    t1 = time.perf_counter()
    fence(s + jnp.int32(0))
    return time.perf_counter() - t1
