"""OS-I baseline accuracy + harness CSV emission."""

import numpy as np
import pytest

from gemmul8_tpu.baselines.ozimmu import ozimmu_gemm_np
from gemmul8_tpu.bench.evalref import dd_gemm_f64
from gemmul8_tpu.bench.harness import accuracy_check
from gemmul8_tpu.bench.matrices import phi_matrix, relerr_stats


def test_ozimmu_baseline_accuracy_curve():
    a = phi_matrix(24, 256, 0.5, seed=500)
    b = phi_matrix(256, 24, 0.5, seed=501)
    ref = dd_gemm_f64(a, b)
    errs = {}
    for s in [6, 8, 10, 12]:
        got = ozimmu_gemm_np(a, b, num_split=s)
        errs[s] = relerr_stats(got, ref)[0]
    # monotone improvement, f64-grade by ~10-12 splits (7 bits per slice)
    assert errs[8] < errs[6]
    assert errs[10] < errs[8]
    assert errs[8] < 1e-5, errs
    assert errs[12] < 1e-11, errs


def test_accuracy_check_csv(tmp_path):
    rows, path = accuracy_check(dtype="f", sizes=(128,), phis=(0.5,),
                                moduli=(6, 8), fastmodes=(True,), m=32,
                                outdir=str(tmp_path))
    assert path and path.endswith(".csv")
    funcs = [r["func"] for r in rows]
    assert "SGEMM" in funcs and "OS2-fast-6" in funcs and "OS2-fast-8" in funcs
    e6 = [r for r in rows if r["func"] == "OS2-fast-6"][0]["max_relerr"]
    e8 = [r for r in rows if r["func"] == "OS2-fast-8"][0]["max_relerr"]
    assert e8 < e6
    with open(path) as f:
        assert f.readline().startswith("phi,")


def test_ozimmu_zgemm():
    from gemmul8_tpu.baselines import ozimmu

    rng = np.random.default_rng(4)
    a = (rng.random((32, 48)) - .5) + 1j * (rng.random((32, 48)) - .5)
    b = (rng.random((48, 24)) - .5) + 1j * (rng.random((48, 24)) - .5)
    c = ozimmu.ozimmu_zgemm_np(a, b, 9)
    ref = a @ b
    assert float(np.abs((c - ref) / np.abs(ref)).max()) < 1e-13


def test_bench_cli_smoke(tmp_path):
    import subprocess
    import sys

    env = dict(__import__("os").environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "gemmul8_tpu.bench", "f", "accuracy_check",
         "--sizes", "64", "--moduli", "4,8", "--outdir", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=__import__("os").path.dirname(
            __import__("os").path.dirname(
                __import__("os").path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-800:]
    assert "accuracy_check ->" in r.stdout


def test_replay_roundtrip(tmp_path):
    from gemmul8_tpu.bench import replay
    from gemmul8_tpu.bench.matrices import phi_matrix

    a = phi_matrix(32, 64, 0.5, seed=1)
    b = phi_matrix(64, 24, 0.5, seed=2)
    p = str(tmp_path / "case.npz")
    replay.save_case(p, a, b, phi=0.5, note=123)
    a2, b2, meta = replay.load_case(p)
    assert np.array_equal(a, a2) and np.array_equal(b, b2)
    assert int(meta["note"]) == 123
    c, mx, med = replay.replay(p, num_moduli=14)
    assert med < 1e-12


def test_latms_condition_number():
    from gemmul8_tpu.bench.matrices import latms_matrix

    a = latms_matrix(64, 48, cond=1e8, seed=3)
    s = np.linalg.svd(a, compute_uv=False)
    got_cond = s[0] / s[-1]
    assert 0.5e8 < got_cond < 2e8
    # emulation still accurate on ill-conditioned inputs
    import gemmul8_tpu as g8
    b = latms_matrix(48, 32, cond=1e6, seed=4)
    c = np.asarray(g8.gemm(a, b, num_moduli=16))
    ref = a @ b
    denom = np.maximum(np.abs(ref), np.abs(a) @ np.abs(b) * 1e-12)
    assert np.median(np.abs(c - ref) / denom) < 1e-13


def test_accuracy_check_mixed_dtypes(tmp_path):
    """'md'/'mf' sweeps (test_mixed_double/test_mixed_float protocol):
    FP64 x FP32 operands; emulation must track the output precision."""
    from gemmul8_tpu.bench.harness import accuracy_check

    rows, _ = accuracy_check(dtype="md", sizes=(256,), phis=(0.5,),
                             moduli=(14,), m=64, fastmodes=(True,),
                             outdir=str(tmp_path))
    emu = [r for r in rows if r["func"] == "OS2-fast-14"][0]
    assert emu["max_relerr"] < 1e-10   # f64 out: b's f32 cast is exact
    rows, _ = accuracy_check(dtype="mf", sizes=(256,), phis=(0.5,),
                             moduli=(14,), m=64, fastmodes=(True,),
                             outdir=str(tmp_path))
    emu = [r for r in rows if r["func"] == "OS2-fast-14"][0]
    nat = [r for r in rows if r["func"] == "SGEMM"][0]
    assert emu["max_relerr"] < 1e-6    # f32-out rounding floor
    assert emu["max_relerr"] < nat["max_relerr"]


def test_accuracy_check_complex(tmp_path):
    """CGEMM sweep (test_float_complex protocol): all three strategies
    beat native complex64 at 8 moduli."""
    from gemmul8_tpu.bench.harness import accuracy_check_complex

    rows, _ = accuracy_check_complex(sizes=(128,), phis=(0.5,),
                                     moduli=(8,), m=48,
                                     fastmodes=(True,),
                                     outdir=str(tmp_path))
    nat = [r for r in rows if r["func"] == "CGEMM"][0]
    for ct in ("big", "kara", "classic"):
        emu = [r for r in rows if r["func"] == f"OS2C-{ct}-fast-8"][0]
        assert emu["max_relerr"] < nat["max_relerr"]


def test_time_check_complex_rows(tmp_path):
    from gemmul8_tpu.bench.harness import time_check_complex

    rows, path = time_check_complex(sizes=(128,), num_moduli=(6,),
                                    compute_types=("kara",), iters=2,
                                    outdir=str(tmp_path))
    assert rows and rows[0]["func"] == "OS2C-kara-fast-6"
    assert rows[0]["seconds"] > 0


def test_time_check_mixed_and_f_rows(tmp_path):
    """time_check parity for the mixed protocols (test_mixed_double /
    test_mixed_float run time sweeps too) and the f-sweep's BF16X3
    (cuMpSGEMM FP16TCEC_SCALING analog) row."""
    from gemmul8_tpu.bench.harness import time_check

    rows, _ = time_check(dtype="md", sizes=(128,), num_moduli=(4,),
                         fastmodes=(True,), iters=2, write_csv=False)
    funcs = [r["func"] for r in rows]
    assert "OS2-fast-4" in funcs and not any("OS1" in f for f in funcs)
    assert any(f.startswith("MIXED-") for f in funcs)
    assert all(r["seconds"] > 0 for r in rows)

    rows, _ = time_check(dtype="mf", sizes=(128,), num_moduli=(4,),
                         fastmodes=(False,), iters=2, write_csv=False)
    assert "OS2-accu-4" in [r["func"] for r in rows]

    rows, _ = time_check(dtype="f", sizes=(128,), num_moduli=(4,),
                         fastmodes=(True,), iters=2, write_csv=False)
    funcs = [r["func"] for r in rows]
    assert "BF16X3-SCALING" in funcs and "SGEMM" in funcs
