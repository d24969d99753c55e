"""Panel/rider pipeline: bit-exactness vs the monolithic pallas path.

The pipelined schedule (pallas/pipelined.py) must produce byte-identical
output to gemm_core's one-shot path — same stats, encode, Barrett, and
reconstruct bodies, different schedule. Mirrors the reference's invariant
that its phase decomposition is a pure timing refactor
(gemmul8.cu:259-292)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gemmul8_tpu.core import gemm as gg
from gemmul8_tpu.pallas import pipelined as pp
from gemmul8_tpu.types import f64_to_bits


def _phi(m, n, phi, seed):
    rng = np.random.default_rng(seed)
    return (rng.random((m, n)) - 0.5) * np.exp(
        rng.standard_normal((m, n)) * phi)


@pytest.mark.parametrize("shape,L,panel,bn", [
    ((512, 640, 1024), 9, 256, 128),
    ((768, 384, 512), 14, 256, 256),   # steps > tiles: clamp path
    ((512, 256, 256), 5, 128, 128),
])
@pytest.mark.parametrize("enc_rider", [False, True])
@pytest.mark.parametrize("acc_out", [False, True])
def test_pipelined_bit_exact(shape, L, panel, bn, enc_rider, acc_out):
    m, k, n = shape
    a = _phi(m, k, 1.0, seed=m + L)
    b = _phi(k, n, 1.0, seed=n + L)
    A, B = f64_to_bits(a), f64_to_bits(b)
    assert pp.pipeline_applicable(m, n, k, L, panel_m=panel, bn=bn,
                                  encode_rider=enc_rider)
    ref = gg.gemm_core(A, B, L, True, "f64", use_pallas=True)
    got = pp.gemm_fast_pipelined_f64(A, B, L, panel_m=panel, bn=bn,
                                     encode_rider=enc_rider,
                                     acc_out=acc_out)
    assert bool(jnp.all(ref.hi == got.hi))
    assert bool(jnp.all(ref.lo == got.lo))


def test_pipelined_three_panel_both_riders():
    # >= 3 panels exercises the middle-panel kernel that carries BOTH
    # riders interleaved by step parity
    m, k, n = 768, 512, 512
    a = _phi(m, k, 1.5, seed=7)
    b = _phi(k, n, 1.5, seed=8)
    A, B = f64_to_bits(a), f64_to_bits(b)
    ref = gg.gemm_core(A, B, 11, True, "f64", use_pallas=True)
    got = pp.gemm_fast_pipelined_f64(A, B, 11, panel_m=256, bn=128,
                                     encode_rider=True)
    assert bool(jnp.all(ref.hi == got.hi))
    assert bool(jnp.all(ref.lo == got.lo))


def test_panels_schedule_uses_pipeline(monkeypatch):
    # column-panel schedule with the pipeline gate on: bit-identical to
    # the gate-off schedule (A encoded once, shared across column panels)
    m, k, n = 512, 384, 512
    a = _phi(m, k, 1.0, seed=3)
    b = _phi(k, n, 1.0, seed=4)
    A, B = f64_to_bits(a), f64_to_bits(b)
    ref = gg.gemm_core_panels(A, B, 9, True, "f64", n_panel=256,
                              use_pallas=True)
    # the gate must actually engage for these shapes
    assert pp.choose_panels(m, 256, k, 9) is not None
    monkeypatch.setenv("GEMMUL8_PIPELINE", "1")
    got = gg.gemm_core_panels(A, B, 9, True, "f64", n_panel=256,
                              use_pallas=True)
    assert bool(jnp.all(ref.hi == got.hi))
    assert bool(jnp.all(ref.lo == got.lo))


@pytest.mark.parametrize("shape,L,panel,bn", [
    ((512, 1024, 1024), 9, 256, 256),
    ((768, 512, 1024), 11, 256, 512),   # 3 panels: pair + 2 rider steps
])
def test_bsplit_bit_exact(shape, L, panel, bn):
    # mode 3: B's right-half encode rides the left-half matmul of panel 0
    # through aliased writes into the full b8 buffer; residues of the two
    # column halves land in one buffer the same way
    m, k, n = shape
    a = _phi(m, k, 1.2, seed=m + L)
    b = _phi(k, n, 1.2, seed=n + L)
    A, B = f64_to_bits(a), f64_to_bits(b)
    assert pp.bsplit_applicable(m, n, k, L, panel_m=panel, bn=bn)
    ref = gg.gemm_core(A, B, L, True, "f64", use_pallas=True)
    got = pp.gemm_fast_pipelined_f64(A, B, L, panel_m=panel, bn=bn,
                                     encode_rider=True, b_rider=True)
    assert bool(jnp.all(ref.hi == got.hi))
    assert bool(jnp.all(ref.lo == got.lo))


def test_bsplit_via_gemm_core(monkeypatch):
    m, k, n = 512, 1024, 1024
    a = _phi(m, k, 0.8, seed=1)
    b = _phi(k, n, 0.8, seed=2)
    A, B = f64_to_bits(a), f64_to_bits(b)
    ref = gg.gemm_core(A, B, 9, True, "f64", use_pallas=True)
    monkeypatch.setenv("GEMMUL8_PIPELINE", "3")
    got = gg.gemm_core(A, B, 9, True, "f64", use_pallas=True)
    assert bool(jnp.all(ref.hi == got.hi))
    assert bool(jnp.all(ref.lo == got.lo))


@pytest.mark.parametrize("enc_rider,acc_out,b_rider", [
    (False, False, False), (True, True, False), (True, True, True),
])
def test_f32_pipelined_bit_exact(enc_rider, acc_out, b_rider):
    # the pure-f32 (SGEMM) path rides the same schedule: f32 encode /
    # reconstruct bodies, one f32 output buffer per rider
    m, k, n = 512, 1024, 1024
    a = jnp.asarray(_phi(m, k, 1.2, seed=31), jnp.float32)
    b = jnp.asarray(_phi(k, n, 1.2, seed=32), jnp.float32)
    ref = gg.gemm_core(a, b, 9, True, "f32", use_pallas=True)
    got = pp.gemm_pipelined(a, b, 9, kind="f32", panel_m=256, bn=256,
                            encode_rider=enc_rider, acc_out=acc_out,
                            b_rider=b_rider)
    assert got.dtype == jnp.float32
    assert bool(jnp.all(ref == got))


@pytest.mark.parametrize("out_kind", ["f64", "f32"])
def test_mixed_dtype_pipelined(monkeypatch, out_kind):
    # mixed-operand calls (FP64 x FP32, the md/mf protocols) ride the
    # pipeline too: per-operand rider encode bodies, out-kind reconstruct
    m, k, n = 512, 1024, 1024
    a = f64_to_bits(_phi(m, k, 1.2, seed=41))
    b = jnp.asarray(_phi(k, n, 1.2, seed=42), jnp.float32)
    ref = gg.gemm_core(a, b, 9, True, out_kind, use_pallas=True)
    monkeypatch.setenv("GEMMUL8_PIPELINE", "3")
    got = gg.gemm_core(a, b, 9, True, out_kind, use_pallas=True)
    if out_kind == "f64":
        assert bool(jnp.all(ref.hi == got.hi))
        assert bool(jnp.all(ref.lo == got.lo))
    else:
        assert bool(jnp.all(ref == got))


def test_f32_pipelined_via_gemm_core(monkeypatch):
    m, k, n = 512, 768, 512
    a = jnp.asarray(_phi(m, k, 1.0, seed=33), jnp.float32)
    b = jnp.asarray(_phi(k, n, 1.0, seed=34), jnp.float32)
    ref = gg.gemm_core(a, b, 8, True, "f32", use_pallas=True)
    monkeypatch.setenv("GEMMUL8_PIPELINE", "2")
    got = gg.gemm_core(a, b, 8, True, "f32", use_pallas=True)
    assert bool(jnp.all(ref == got))


@pytest.mark.parametrize("pipe", ["1", "3"])
def test_accurate_mode_pipelined(monkeypatch, pipe):
    # accurate mode shares the schedule: shifts come from the mag7 +
    # magnitude-GEMM pre-phase, then the same encode/matmul/reconstruct
    # riders run — must stay bit-identical to the monolithic accu path
    m, k, n = 512, 1024, 1024
    a = _phi(m, k, 1.5, seed=21)
    b = _phi(k, n, 1.5, seed=22)
    A, B = f64_to_bits(a), f64_to_bits(b)
    ref = gg.gemm_core(A, B, 9, False, "f64", use_pallas=True)
    monkeypatch.setenv("GEMMUL8_PIPELINE", pipe)
    got = gg.gemm_core(A, B, 9, False, "f64", use_pallas=True)
    assert bool(jnp.all(ref.hi == got.hi))
    assert bool(jnp.all(ref.lo == got.lo))


def test_accurate_mode_panels_pipelined(monkeypatch):
    # column-panel schedule, accurate mode: per-panel shifts re-encode A,
    # the m-pipeline hides each panel's reconstruct — bit-identical
    m, k, n = 512, 384, 512
    a = _phi(m, k, 1.0, seed=23)
    b = _phi(k, n, 1.0, seed=24)
    A, B = f64_to_bits(a), f64_to_bits(b)
    ref = gg.gemm_core_panels(A, B, 9, False, "f64", n_panel=256,
                              use_pallas=True)
    monkeypatch.setenv("GEMMUL8_PIPELINE", "1")
    got = gg.gemm_core_panels(A, B, 9, False, "f64", n_panel=256,
                              use_pallas=True)
    assert bool(jnp.all(ref.hi == got.hi))
    assert bool(jnp.all(ref.lo == got.lo))


def test_applicability_gates():
    assert pp.pipeline_applicable(8192, 8192, 8192, 14)
    assert not pp.pipeline_applicable(1024, 8192, 8192, 14)   # < 2 panels
    assert not pp.pipeline_applicable(8192, 8100, 8192, 14)   # n % bn
    assert not pp.pipeline_applicable(8200, 8192, 8192, 14)   # m % panel
    assert not pp.pipeline_applicable(8192, 8192, 131072, 14)  # k cap


def test_invalid_pipeline_env_raises(monkeypatch):
    # an explicit-but-invalid opt-in must not silently run unpipelined
    monkeypatch.setenv("GEMMUL8_PIPELINE", "4")
    with pytest.raises(ValueError, match="GEMMUL8_PIPELINE"):
        pp.pipeline_mode()
    monkeypatch.setenv("GEMMUL8_PIPELINE", " 2")
    with pytest.raises(ValueError):
        pp.pipeline_mode()


def test_too_few_panels_raises():
    a = f64_to_bits(_phi(256, 256, 0.5, seed=7))
    b = f64_to_bits(_phi(256, 256, 0.5, seed=8))
    with pytest.raises(ValueError, match="2 panels"):
        pp.gemm_pipelined(a, b, 9, panel_m=256)   # P = 1
    with pytest.raises(ValueError, match="2 panels"):
        pp.gemm_pipelined(a, b, 9, panel_m=512)   # P = 0


def test_uncond_rider_bit_exact(monkeypatch):
    # GEMMUL8_RIDER_UNCOND=1 drops the pl.when gates around the single
    # reconstruct rider (clamped index maps make the re-execution an
    # idempotent rewrite) — must stay bit-identical to the monolithic
    # path. Unique shape: the env is read at trace time, so a shape
    # already traced without the flag would replay the gated schedule.
    m, k, n = 640, 384, 640
    a = _phi(m, k, 1.0, seed=21)
    b = _phi(k, n, 1.0, seed=22)
    A, B = f64_to_bits(a), f64_to_bits(b)
    ref = gg.gemm_core(A, B, 10, True, "f64", use_pallas=True)
    monkeypatch.setenv("GEMMUL8_RIDER_UNCOND", "1")
    got = pp.gemm_fast_pipelined_f64(A, B, 10, panel_m=320, bn=128,
                                     encode_rider=False)
    assert bool(jnp.all(ref.hi == got.hi))
    assert bool(jnp.all(ref.lo == got.lo))


def test_uncond_rider_two_phase_warns(monkeypatch):
    # set alongside two riders (mode >= 2) the flag is ignored with a
    # warning, not silently honored for one phase and not the other
    m, k, n = 768, 512, 512   # 3 panels: the middle one carries BOTH riders
    a = _phi(m, k, 1.0, seed=23)
    b = _phi(k, n, 1.0, seed=24)
    A, B = f64_to_bits(a), f64_to_bits(b)
    ref = gg.gemm_core(A, B, 12, True, "f64", use_pallas=True)
    monkeypatch.setenv("GEMMUL8_RIDER_UNCOND", "1")
    with pytest.warns(UserWarning, match="RIDER_UNCOND"):
        got = pp.gemm_fast_pipelined_f64(A, B, 12, panel_m=256, bn=128,
                                         encode_rider=True)
    assert bool(jnp.all(ref.hi == got.hi))
    assert bool(jnp.all(ref.lo == got.lo))
