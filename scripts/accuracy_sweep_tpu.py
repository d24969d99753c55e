"""Reference-scale accuracy sweeps on the real TPU (VERDICT r1 item 4).

Mirrors the reference protocol (GEMMul8/testing/test_double.cu:19-23 /
test_float.cu): m=n=1024, k in {1024..8192}, DGEMM phi in
{0.5,1,2,3,4} with moduli 2-20, SGEMM phi in {0,0.5,1,1.5} with moduli
2-19. Ground truth is the dd oracle (bench/native.py). Writes the CSVs
into results_committed/ and renders the accuracy plots.

Long-running (~hours of remote compiles on first run; the persistent
compile cache makes reruns fast):
    python scripts/accuracy_sweep_tpu.py [d|f|all]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    from gemmul8_tpu.bench.timing import require_tpu
    require_tpu()  # fail fast when the axon tunnel is down

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gemmul8_tpu.bench.harness import accuracy_check

    outdir = "results_committed"
    paths = []
    if which in ("d", "all"):
        rows, path = accuracy_check(
            dtype="d", sizes=(1024, 2048, 4096, 8192),
            phis=(0.5, 1.0, 2.0, 3.0, 4.0), moduli=range(2, 21),
            fastmodes=(True, False), m=1024, outdir=outdir)
        print(f"DGEMM sweep -> {path} ({len(rows)} rows)", flush=True)
        paths.append(path)
    if which in ("f", "all"):
        rows, path = accuracy_check(
            dtype="f", sizes=(1024, 2048, 4096, 8192),
            phis=(0.0, 0.5, 1.0, 1.5), moduli=range(2, 20),
            fastmodes=(True, False), m=1024, outdir=outdir)
        print(f"SGEMM sweep -> {path} ({len(rows)} rows)", flush=True)
        paths.append(path)
    if which in ("c", "all"):
        from gemmul8_tpu.bench.harness import accuracy_check_complex

        # reference protocol compiles ONE strategy per binary
        # (COMPUTE_TYPE macro, test_float_complex.cu:24); mirror that
        # compile economy: full moduli sweep on big-matrix, spot checks
        # on kara/classic (each complex graph is a fresh remote compile)
        rows, path = accuracy_check_complex(
            sizes=(1024,), phis=(0.0, 0.5, 1.0, 1.5),
            moduli=range(2, 20), compute_types=("big",),
            fastmodes=(True, False), m=1024, outdir=outdir)
        print(f"CGEMM big sweep -> {path} ({len(rows)} rows)", flush=True)
        rows, path = accuracy_check_complex(
            sizes=(1024,), phis=(0.5,), moduli=(8, 12, 14),
            compute_types=("kara", "classic"),
            fastmodes=(True, False), m=1024, outdir=outdir)
        print(f"CGEMM kara/classic spots -> {path} ({len(rows)} rows)",
              flush=True)
    if which in ("md", "mf"):
        rows, path = accuracy_check(
            dtype=which, sizes=(1024, 8192), phis=(0.5, 2.0),
            moduli=range(2, 21), fastmodes=(True, False), m=1024,
            outdir=outdir)
        print(f"{which} sweep -> {path} ({len(rows)} rows)", flush=True)
    # plots alongside
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from plot_results import _read, plot_accuracy

        for p in paths:
            png = p.replace(".csv", ".png")
            plot_accuracy(_read(p), png)
            print(f"plot -> {png}", flush=True)
    except Exception as exc:  # plotting must never lose the sweep data
        print(f"plotting skipped: {exc}", flush=True)


if __name__ == "__main__":
    main()
