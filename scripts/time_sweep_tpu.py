"""Final TPU throughput sweep for the committed evidence CSVs
(VERDICT r1 items 2, 3, 6): OS2-fast-14 AND OS2-accu-14 rows, the OS-I
(ozIMMU_EF-style) baseline at 8192^3 via the diagonal-group graph, the
raw INT8-GEMM probe, and the honestly-labeled native row. The `f` mode
adds the SGEMM-emulation sweep (reference moduli highlights 6/8 fast+accu
plus the BF16X3-SCALING cuMpSGEMM-analog row); `md`/`mf` add the
mixed-dtype time protocols (test_mixed_double/test_mixed_float).

    python scripts/time_sweep_tpu.py [sizes] [d|f|md|mf|all]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sizes = tuple(int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                                   else ("4096", "8192")))
    which = sys.argv[2] if len(sys.argv) > 2 else "d"
    import jax
    from gemmul8_tpu.bench.timing import require_tpu
    require_tpu()  # fail fast when the axon tunnel is down

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gemmul8_tpu.bench.harness import time_check

    if which in ("d", "all"):
        rows, path = time_check(
            dtype="d", sizes=sizes, num_moduli=(14,),
            fastmodes=(True, False), phi=0.5, iters=10,
            include_osi=(8, 9), outdir="results_committed")
        for r in rows:
            print({k: r[k] for k in ("m", "func", "seconds", "tflops")},
                  flush=True)
        print(f"-> {path}")

    if which in ("f", "all"):
        rows, path = time_check(
            dtype="f", sizes=sizes, num_moduli=(6, 8),
            fastmodes=(True, False), phi=0.5, iters=10,
            outdir="results_committed")
        for r in rows:
            print({k: r[k] for k in ("m", "func", "seconds", "tflops")},
                  flush=True)
        print(f"-> {path}")

    for mx in ("md", "mf"):
        if which in (mx, "all"):
            rows, path = time_check(
                dtype=mx, sizes=sizes, num_moduli=(14,),
                fastmodes=(True, False), phi=0.5, iters=10,
                outdir="results_committed")
            for r in rows:
                print({k: r[k] for k in ("m", "func", "seconds", "tflops")},
                      flush=True)
            print(f"-> {path}")


if __name__ == "__main__":
    main()
