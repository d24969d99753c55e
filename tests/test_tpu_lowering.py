"""Cross-lower the Pallas GEMM paths for the TPU platform (no chip).

Interpret mode does NOT check Mosaic's lowering rules — see
scripts/check_tpu_lowering.py. Each check runs in a subprocess: the
axon plugin must be disabled via jax.config (not env) inside a fresh
process, and GEMMUL8_PIPELINE / the interpret monkeypatch are read at
trace time so they must not leak across configs. The lowering itself is
~1 s; the subprocess cost is the jax import.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir,
                       "scripts", "check_tpu_lowering.py")


@pytest.mark.parametrize("n,mode", [(512, "0"), (512, "1"), (512, "3"),
                                    (1024, "3"),
                                    (512, "accu"), (512, "accu3"),
                                    (512, "f32p3"), (512, "mdp3"),
                                    (512, "fe"),
                                    (512, "fr"), (512, "mp"),
                                    (512, "vpucrt"), (512, "vpuenc"),
                                    (512, "cplx"), (512, "cplxkara"),
                                    (512, "cplxaccu")])
def test_gemm_lowers_for_tpu(n, mode):
    r = subprocess.run([sys.executable, _SCRIPT, str(n), mode],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "lowering ok" in r.stdout
