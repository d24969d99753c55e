"""Round-2 API parity additions: einsum/dot_general interception,
gemm(..., return_times=True), complex strided-batch, and the imperative
exp_stats surface (VERDICT r1 items 7-10)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gemmul8_tpu import interception as icp
from gemmul8_tpu.api import gemm, gemm_batched
from gemmul8_tpu.types import ComputeType


def _mk(shape, phi=0.5, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random(shape) - 0.5) * np.exp(
        rng.standard_normal(shape) * phi)


# ---------------------------------------------------------------------------
# Interception breadth (VERDICT item 8)
# ---------------------------------------------------------------------------

def _emulate_all(m, n, k, dtype):
    return "emulate"


def test_einsum_interception_routes():
    a = jnp.asarray(_mk((48, 64)), jnp.float32)
    b = jnp.asarray(_mk((64, 40), seed=1), jnp.float32)
    want = gemm(a, b, num_moduli=8)
    icp.clear_profile_log()
    with icp.override_matmuls(num_moduli=8, rule=_emulate_all, profile=True):
        got = jnp.einsum("ij,jk", a, b)
    log = icp.get_profile_log()
    assert any(r.mode.startswith("emulate") for r in log)
    assert np.array_equal(np.asarray(want), np.asarray(got))


def test_einsum_interception_transposed_forms():
    a = jnp.asarray(_mk((48, 64)), jnp.float32)
    bt = jnp.asarray(_mk((40, 64), seed=1), jnp.float32)  # (n, k): B^T
    want = gemm(a, bt, num_moduli=8, op_b="T")
    with icp.override_matmuls(num_moduli=8, rule=_emulate_all):
        got = jnp.einsum("ij,kj->ik", a, bt)
    assert np.array_equal(np.asarray(want), np.asarray(got))
    assert icp.get_last_func_name().startswith("matmul[48x64x40")


def test_einsum_passthrough_non_matmul():
    a = jnp.asarray(_mk((8, 8)), jnp.float32)
    with icp.override_matmuls(num_moduli=8, rule=_emulate_all):
        tr = jnp.einsum("ii", a)            # trace: not a matmul
        hd = jnp.einsum("ij,ij->ij", a, a)  # hadamard
    assert np.allclose(np.asarray(tr), np.trace(np.asarray(a)), rtol=1e-6)
    assert np.allclose(np.asarray(hd), np.asarray(a) ** 2, rtol=1e-6)


def test_einsum_passthrough_scalar_output():
    """'ij,jk->' (explicit empty output) is a full contraction to a
    scalar, NOT a matmul — after partition('->') it looks identical to
    the implicit form 'ij,jk', so the router must check the separator."""
    a = jnp.asarray(_mk((8, 16)), jnp.float32)
    b = jnp.asarray(_mk((16, 8), seed=1), jnp.float32)
    with icp.override_matmuls(num_moduli=8, rule=_emulate_all):
        s = jnp.einsum("ij,jk->", a, b)
    assert np.ndim(s) == 0
    assert np.allclose(float(s), float((np.asarray(a) @ np.asarray(b)).sum()),
                       rtol=1e-5)


def test_dot_general_interception():
    a = jnp.asarray(_mk((32, 96)), jnp.float32)
    b = jnp.asarray(_mk((96, 24), seed=2), jnp.float32)
    want = gemm(a, b, num_moduli=8)
    with icp.override_matmuls(num_moduli=8, rule=_emulate_all):
        got = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())))
    assert np.array_equal(np.asarray(want), np.asarray(got))
    # precision-annotated calls pass through untouched (the emulator's own
    # internal int8 dot_generals rely on this too)
    with icp.override_matmuls(num_moduli=8, rule=_emulate_all):
        nat = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    assert np.allclose(np.asarray(nat),
                       np.asarray(a, np.float64) @ np.asarray(b, np.float64),
                       rtol=1e-5)


def test_interception_restores_bindings():
    mm, dd = jnp.matmul, jnp.dot
    es, dg = jnp.einsum, jax.lax.dot_general
    with icp.override_matmuls(num_moduli=8):
        assert jnp.einsum is not es
        assert jax.lax.dot_general is not dg
    assert jnp.matmul is mm and jnp.dot is dd
    assert jnp.einsum is es and jax.lax.dot_general is dg


# ---------------------------------------------------------------------------
# gemm(..., return_times=True) (VERDICT item 9)
# ---------------------------------------------------------------------------

def test_gemm_return_times():
    a = _mk((64, 80))
    b = _mk((80, 48), seed=3)
    plain = gemm(a, b, num_moduli=10)
    timed, times = gemm(a, b, num_moduli=10, return_times=True)
    assert len(times) == 4 and all(t >= 0.0 for t in times)
    assert np.array_equal(np.asarray(plain), np.asarray(timed))


def test_gemm_return_times_with_epilogue():
    a = _mk((32, 40))
    b = _mk((40, 24), seed=4)
    c = _mk((32, 24), seed=5)
    plain = gemm(a, b, alpha=2.5, beta=-1.0, c=c, num_moduli=10)
    timed, times = gemm(a, b, alpha=2.5, beta=-1.0, c=c, num_moduli=10,
                        return_times=True)
    assert len(times) == 4
    assert np.array_equal(np.asarray(plain), np.asarray(timed))


# ---------------------------------------------------------------------------
# Complex strided-batch (VERDICT item 7)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
@pytest.mark.parametrize("ct", [ComputeType.COMPLEX_BIG_MATRIX_ENCODE,
                                ComputeType.COMPLEX_KARATSUBA_MULT])
def test_gemm_batched_complex(dtype, ct):
    rng = np.random.default_rng(7)
    B, m, k, n = 3, 24, 40, 16
    a = (_mk((B, m, k), seed=8) + 1j * _mk((B, m, k), seed=9)).astype(dtype)
    b = (_mk((B, k, n), seed=10) + 1j * _mk((B, k, n), seed=11)).astype(dtype)
    out = gemm_batched(a, b, num_moduli=12, compute_type=ct)
    out = np.asarray(out)
    assert out.shape == (B, m, n)
    for i in range(B):
        one = np.asarray(gemm(a[i], b[i], num_moduli=12, compute_type=ct))
        assert np.array_equal(one, out[i]), f"batch element {i}"


def test_gemm_batched_complex_mixed_with_real():
    # real f64 batch x complex batch promotes through the complex engine
    a = _mk((2, 16, 32))
    b = (_mk((2, 32, 8), seed=1) + 1j * _mk((2, 32, 8), seed=2))
    out = np.asarray(gemm_batched(a, b, num_moduli=14))
    ref = np.stack([np.asarray(gemm(a[i], b[i], num_moduli=14))
                    for i in range(2)])
    assert np.array_equal(ref, out)


# ---------------------------------------------------------------------------
# exp_stats imperative surface (VERDICT item 10)
# ---------------------------------------------------------------------------

def test_exp_stats_handle_counts():
    from gemmul8_tpu.ops import mpgemm

    h = mpgemm.ExpStatsHandle()
    h.set_exp_stats_params(ignore_threshold=0.0,
                           underflow_threshold=2.0 ** -10,
                           underflow_ratio_tolerance=0.1)
    h.enable_exp_stats()
    x = np.array([0.0, 1.0, 2.0 ** -12, 2.0 ** -8, 2.0 ** -11, 3.0],
                 np.float32)
    bid = h.exp_stats_ext(x)
    lost, total = h.get_exp_stats(bid)
    assert total == 5          # zeros ignored
    assert lost == 2           # 2^-12 and 2^-11 below threshold
    assert h.get_current_exp_stats_buffer_id() == bid
    assert h.get_max_exp(bid) == 3.0
    assert h.get_exp_stats_compute_mode_level(bid) == mpgemm.Mode.SCALING
    h.reset_exp_stats_buffer_id()
    assert h.get_current_exp_stats_buffer_id() == 0


def test_exp_stats_scaling_round_trip():
    from gemmul8_tpu.ops import mpgemm

    h = mpgemm.ExpStatsHandle()
    x = jnp.asarray(_mk((16, 16)) * 2.0 ** 20, jnp.float32)
    bid = h.exp_max_ext(x)
    xs = h.scale_A(bid, x)
    assert float(jnp.max(jnp.abs(xs))) < 2.0
    back = h.reset_scale_A(bid, xs)
    assert np.allclose(np.asarray(back), np.asarray(x), rtol=0)


def test_exp_stats_buffer_ring_evicts():
    from gemmul8_tpu.ops import mpgemm

    h = mpgemm.ExpStatsHandle(ring_size=2)
    ids = [h.exp_max_ext(jnp.ones((2, 2)) * i) for i in range(1, 5)]
    with pytest.raises(KeyError):
        h.get_exp_stats(ids[0])
    assert h.get_exp_stats(ids[-1]) is not None
