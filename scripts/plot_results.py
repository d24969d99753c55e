"""Figure generation from harness CSVs — matplotlib port of the reference's
MATLAB scripts (/root/reference/GEMMul8/testing/generate_fig/plot_{accuracy,
flops,timebreakdown}.m): same figure semantics, same CSV schema.

Usage:
    python scripts/plot_results.py results/oz2_results_d_accuracy_*.csv
    python scripts/plot_results.py results/oz2_results_d_time_*.csv

Writes <csv>.png next to each input.
"""

import csv
import os
import sys
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def _read(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def plot_accuracy(rows, out_png):
    """max relerr vs num_moduli, one line per (phi, k), native GEMM as a
    horizontal reference line (reference plot_accuracy.m)."""
    series = defaultdict(list)
    native = {}
    for r in rows:
        key = (float(r["phi"]), int(r["k"]))
        fn = r["func"]
        if fn.startswith("OS2-"):
            tag, L = fn.rsplit("-", 1)
            series[key + (tag,)].append((int(L), float(r["max_relerr"])))
        else:
            native[key] = (fn, float(r["max_relerr"]))
    fig, ax = plt.subplots(figsize=(7, 5))
    for (phi, k, tag), pts in sorted(series.items()):
        pts.sort()
        ax.semilogy([p[0] for p in pts], [p[1] for p in pts],
                    marker="o" if "fast" in tag else "s",
                    label=f"{tag} (phi={phi}, k={k})")
    for (phi, k), (fn, err) in native.items():
        ax.axhline(err, ls="--", lw=1, color="gray")
        ax.annotate(fn, (2, err), fontsize=8, color="gray")
    ax.set_xlabel("num_moduli")
    ax.set_ylabel("max relative error")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    print(out_png)


def plot_time(rows, out_png):
    """Effective TFLOP/s vs size per function + stacked per-phase breakdown
    for the OS2 rows (reference plot_flops.m + plot_timebreakdown.m)."""
    series = defaultdict(list)
    breakdown = defaultdict(list)
    for r in rows:
        n = int(r["m"])
        series[r["func"]].append((n, float(r["tflops"])))
        if r["func"].startswith("OS2-") and r.get("t_scale") not in (None, "", "nan"):
            try:
                breakdown[r["func"]].append(
                    (n, [float(r["t_scale"]), float(r["t_int8gemm"]),
                         float(r["t_mod"]), float(r["t_invscale"])]))
            except ValueError:
                pass
    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    for fn, pts in sorted(series.items()):
        pts.sort()
        axes[0].plot([p[0] for p in pts], [p[1] for p in pts], marker="o",
                     label=fn)
    axes[0].set_xscale("log", base=2)
    axes[0].set_xlabel("m = n = k")
    axes[0].set_ylabel("effective TFLOP/s")
    axes[0].grid(True, alpha=0.3)
    axes[0].legend(fontsize=7)

    labels = ["encode", "int8 GEMMs", "mod reduce", "reconstruct"]
    for fn, pts in sorted(breakdown.items()):
        pts.sort()
        ns = [p[0] for p in pts]
        parts = list(zip(*[p[1] for p in pts]))
        bottom = [0.0] * len(ns)
        for lab, part in zip(labels, parts):
            axes[1].bar([str(n) for n in ns], part, bottom=bottom,
                        label=f"{lab}" if fn == sorted(breakdown)[0] else None)
            bottom = [b + p for b, p in zip(bottom, part)]
    axes[1].set_xlabel("size")
    axes[1].set_ylabel("seconds per call")
    axes[1].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    print(out_png)


def main():
    for path in sys.argv[1:]:
        rows = _read(path)
        out = path + ".png"
        if "accuracy" in os.path.basename(path):
            plot_accuracy(rows, out)
        else:
            plot_time(rows, out)


if __name__ == "__main__":
    main()
