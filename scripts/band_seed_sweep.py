"""Multi-seed accuracy sweep at the reference scale (VERDICT r4 item 10).

Runs the k=8192 band protocol (m=n=1024, phi=0.5 — test_double.cu:19-23)
at several seeds to MEASURE the seed-to-seed spread of the max-relerr
statistic that tests/test_scale_bands.py's slack factor must cover.
CPU-friendly (native f64 + the dd oracle). Run:

    python scripts/band_seed_sweep.py --seeds 3 \
        --csv results_committed/band_seed_sweep_cpu.csv
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--moduli", type=int, nargs="*",
                    default=[10, 12, 13, 14, 15, 16])
    ap.add_argument("--csv", type=str, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from gemmul8_tpu import gemm
    from gemmul8_tpu.bench.matrices import phi_matrix
    from gemmul8_tpu.bench.native import dd_gemm, relerr_vs_dd
    from gemmul8_tpu.types import as_numpy

    m, k = 1024, 8192
    rows = []
    for s in range(args.seeds):
        sa, sb = 123456 + 10 * s, 123457 + 10 * s
        a = phi_matrix(m, k, 0.5, seed=sa)
        b = phi_matrix(k, m, 0.5, seed=sb)
        ref_hi, ref_lo = dd_gemm(a, b)
        for fast in (True, False):
            for L in args.moduli:
                c = as_numpy(gemm(a, b, num_moduli=L, fastmode=fast))
                mx, med = relerr_vs_dd(c.astype(np.float64), ref_hi, ref_lo)
                rows.append(dict(seed=sa, mode="fast" if fast else "accu",
                                 moduli=L, max_relerr=mx, med_relerr=med))
                print(f"seed {sa} {'fast' if fast else 'accu'}-{L}: "
                      f"max {mx:.3e} med {med:.3e}", flush=True)
    # spread per (mode, L)
    print("\nseed spread (max over seeds / min over seeds) of max_relerr:")
    worst = 1.0
    for mode in ("fast", "accu"):
        for L in args.moduli:
            vals = [r["max_relerr"] for r in rows
                    if r["mode"] == mode and r["moduli"] == L]
            lo, hi = min(vals), max(vals)
            sp = hi / lo if lo > 0 else float("inf")
            # ignore the exact-CRT floor where relerr is cancellation luck
            if hi > 1e-13:
                worst = max(worst, sp)
            print(f"  {mode}-{L}: {sp:.2f}x  ({lo:.3e} .. {hi:.3e})")
    print(f"worst spread above the 1e-13 floor: {worst:.2f}x")
    if args.csv:
        import csv as _csv

        with open(args.csv, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
