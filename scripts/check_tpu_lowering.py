"""Cross-lower the Pallas GEMM paths for the TPU platform (no chip).

Interpret mode does NOT check Mosaic's lowering rules (block alignment,
scalar-prefetch index maps, input_output_aliases) — shapes that pass
every CPU test can fail only on the real chip (CLAUDE.md traps). This
script runs the real Pallas->Mosaic lowering on the host via jax.export
with platforms=["tpu"], catching that regression class before a bench
run. Execution-order semantics (prefetch vs aliased writes) still need
the chip; bench.py accuracy-gates those.

Usage: python scripts/check_tpu_lowering.py [n] [mode ...]
  n     matrix size (default 512)
  mode  GEMMUL8_PIPELINE values 0-3, or: "accu" (accurate-mode mag7
        path), "accu3" (accurate mode riding the mode-3 pipeline),
        "f32p3" (pure-f32 SGEMM path riding the mode-3 pipeline),
        "mdp3" (mixed FP64 x FP32 -> FP64 riding the mode-3 pipeline),
        "fe"/"fr"/"mp" (the GEMMUL8_FUSED_ENCODE / FUSED_RECONSTRUCT /
        MM_PIPELINE env-gated branches), "vpucrt" / "vpuenc"
        (GEMMUL8_MXU_CRT=0 / GEMMUL8_MXU_ENC=0: the VPU reconstruct /
        encode fallbacks; mode 0 itself covers the default MXU paths),
        "cplx" / "cplxkara" / "cplxaccu" (the fused complex matmul
        kernel: 4-dot fast, 3-dot karatsuba, accurate-mode shifts).
        Default: 0 1 3

Each config lowers in ~1 s (plus the jax import); the pytest wrapper
(tests/test_tpu_lowering.py) runs a few configs in the default suite,
one subprocess each.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_ENV_GATES = {"fe": "GEMMUL8_FUSED_ENCODE", "fr": "GEMMUL8_FUSED_RECONSTRUCT",
              "mp": "GEMMUL8_MM_PIPELINE"}


def check(n: int, mode: str) -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["GEMMUL8_PIPELINE"] = (
        mode if mode.isdigit()
        else "3" if mode in ("accu3", "f32p3", "mdp3") else "0")
    if mode in _ENV_GATES:
        os.environ[_ENV_GATES[mode]] = "1"
    if mode == "vpucrt":
        os.environ["GEMMUL8_MXU_CRT"] = "0"
    if mode == "vpuenc":
        os.environ["GEMMUL8_MXU_ENC"] = "0"
    # jax.export's jaxpr traversal recurses deeply on the unrolled
    # 14-moduli graph; the default 1000-frame limit is not enough
    sys.setrecursionlimit(20000)

    import jax

    # the axon plugin overrides the JAX_PLATFORMS env var (CLAUDE.md trap);
    # only the config knob reliably keeps the host backend — without it
    # this script blocks on the remote TPU tunnel before lowering anything
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import gemmul8_tpu.pallas.kernels as K
    import gemmul8_tpu.pallas.matmul as M
    import gemmul8_tpu.pallas.megakernel as MK
    import gemmul8_tpu.pallas.pipelined as P

    for mod in (P, K, M, MK):
        mod._interpret = lambda: False  # force the Mosaic (TPU) kernel path

    from gemmul8_tpu.core import gemm as gg
    from gemmul8_tpu.types import F64Bits

    if mode in ("3", "accu3", "f32p3", "mdp3"):
        assert P.choose_panels(n, n, n, 14, encode_rider=True) is not None, \
            f"panel schedule must apply at n={n}"

    # "accu"/"accu3": accurate-mode (mag7 Pallas) path
    fastmode = mode not in ("accu", "accu3")

    if mode.startswith("cplx"):
        from gemmul8_tpu.core import complexgemm as cg
        from gemmul8_tpu.types import ComputeType

        strat = (ComputeType.COMPLEX_KARATSUBA_MULT if mode == "cplxkara"
                 else ComputeType.COMPLEX_BIG_MATRIX_ENCODE)

        def fwd(arh, arl, aih, ail, brh, brl, bih, bil):
            ore, oim = cg.gemm_complex_core(
                F64Bits(arh, arl), F64Bits(aih, ail),
                F64Bits(brh, brl), F64Bits(bih, bil),
                14, mode != "cplxaccu", strat, "f64", use_pallas=True)
            return ore.hi, ore.lo, oim.hi, oim.lo

        args = [jax.ShapeDtypeStruct((n, n), jnp.uint32)] * 8
    elif mode == "f32p3":
        def fwd(a, b):
            return gg.gemm_core(a, b, 14, True, "f32", use_pallas=True)

        args = [jax.ShapeDtypeStruct((n, n), jnp.float32)] * 2
    elif mode == "mdp3":
        def fwd(ahi, alo, b):
            out = gg.gemm_core(F64Bits(ahi, alo), b, 14, True, "f64",
                               use_pallas=True)
            return out.hi, out.lo

        args = [jax.ShapeDtypeStruct((n, n), jnp.uint32)] * 2 + \
            [jax.ShapeDtypeStruct((n, n), jnp.float32)]
    else:
        def fwd(ahi, alo, bhi, blo):
            out = gg.gemm_core(F64Bits(ahi, alo), F64Bits(bhi, blo), 14,
                               fastmode, "f64", use_pallas=True)
            return out.hi, out.lo

        args = [jax.ShapeDtypeStruct((n, n), jnp.uint32)] * 4
    t0 = time.time()
    exp = jax.export.export(jax.jit(fwd), platforms=["tpu"])(*args)
    nbytes = len(exp.mlir_module_serialized)
    assert nbytes > 0
    print(f"lowering ok: n={n} mode={mode} "
          f"({nbytes} MLIR bytes, {time.time() - t0:.0f}s)", flush=True)
    return nbytes


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    modes = sys.argv[2:] or ["0", "1", "3"]
    if len(modes) > 1:
        # one subprocess per mode: GEMMUL8_PIPELINE and the interpret
        # monkeypatch are read at trace time and must not leak across
        import subprocess
        for m in modes:
            subprocess.run([sys.executable, __file__, str(n), m], check=True)
    else:
        check(n, modes[0])
