"""Test config: CPU backend with native f64 and a virtual 8-device mesh.

Real-TPU runs happen through bench.py / __graft_entry__.py; unit tests run
on the CPU backend where float64 is native (ground truth) and multi-chip
sharding is emulated with xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# pin the pipeline off regardless of the ambient env: gemm_core
# (use_pallas=True) calls serve as the MONOLITHIC reference the pipeline
# tests bit-compare against; pipeline tests opt in per-test via direct
# calls or monkeypatch.setenv
os.environ.setdefault("GEMMUL8_PIPELINE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon TPU plugin overrides JAX_PLATFORMS; config wins over both
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
