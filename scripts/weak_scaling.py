"""Weak-scaling harness for the mesh-sharded emulated GEMM.

SURVEY.md §7 step 6 / BASELINE.json north star: measure emulated-DGEMM
TFLOP/s per chip at 1 chip, 1 host, and N hosts with the problem scaled
proportionally to the device count (m and n grow with the mesh; global k
fixed below the 2^17 exactness bound).

On a real pod slice run under `jax.distributed.initialize()`; for a
functional demo it also runs on the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/weak_scaling.py --base 512 --moduli 14
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# The axon TPU plugin overrides the JAX_PLATFORMS env var; when the caller
# asked for virtual host devices, force the CPU backend the only way that
# sticks — via jax.config, before any array op (see CLAUDE.md).
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    import jax

    jax.config.update("jax_platforms", "cpu")


def sync(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    for t in leaves:
        if hasattr(t, "block_until_ready"):
            t.block_until_ready()
    # sharded-safe readback: pull one addressable shard to host
    t = leaves[0]
    np.asarray(t.addressable_shards[0].data)[(0,) * t.ndim]


def measure(mesh, base: int, num_moduli: int, iters: int):
    import jax

    from gemmul8_tpu.parallel import distributed as dist
    from gemmul8_tpu.types import f64_to_bits

    nx, ny = mesh.shape["x"], mesh.shape["y"]
    ndev = nx * ny
    # weak scaling: per-device tile fixed at base x base; k fixed globally
    m, n = base * nx, base * ny
    k = min(base * 8, 1 << 17)
    rng = np.random.default_rng(0)
    a = (rng.random((m, k)) - .5) * np.exp(rng.standard_normal((m, k)) * .5)
    b = (rng.random((k, n)) - .5) * np.exp(rng.standard_normal((k, n)) * .5)
    A, B = f64_to_bits(a), f64_to_bits(b)
    out = dist.gemm_sharded(A, B, mesh, num_moduli=num_moduli)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = dist.gemm_sharded(A, B, mesh, num_moduli=num_moduli)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    tflops = 2 * m * n * k / dt / 1e12
    return dict(devices=ndev, mesh=f"{nx}x{ny}", m=m, n=n, k=k,
                seconds=dt, tflops=tflops, tflops_per_chip=tflops / ndev)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=512,
                    help="per-device tile edge")
    ap.add_argument("--moduli", type=int, default=14)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--csv", type=str, default=None,
                    help="write rows to this CSV path")
    args = ap.parse_args()

    import jax

    from gemmul8_tpu.parallel import distributed as dist

    ndev_total = len(jax.devices())
    virtual = jax.default_backend() == "cpu" and ndev_total > 1
    rows = []
    sizes = []
    d = 1
    while d <= ndev_total:
        sizes.append(d)
        d *= 2
    if sizes[-1] != ndev_total:
        sizes.append(ndev_total)
    for nd in sizes:
        mesh = dist.make_mesh(nd)
        rows.append(measure(mesh, args.base, args.moduli, args.iters))
        r = rows[-1]
        print(f"{r['devices']:3d} dev ({r['mesh']}): "
              f"{r['tflops']:.3f} TFLOP/s total, "
              f"{r['tflops_per_chip']:.3f}/chip", flush=True)
    if len(rows) > 1:
        if virtual:
            # N virtual devices time-share ONE CPU, so per-chip throughput
            # necessarily falls ~1/N and is NOT a scaling measurement. The
            # honest virtual-mesh metric is AGGREGATE throughput vs 1
            # device: it degrades exactly by the collective/comm overhead
            # the mesh adds, which is what this harness can validate
            # without pod hardware (real per-chip efficiency needs a pod
            # slice + jax.distributed.initialize()).
            eff = rows[-1]["tflops"] / rows[0]["tflops"]
            label = ("aggregate-throughput efficiency (virtual mesh: "
                     "collective-overhead proxy)")
        else:
            eff = rows[-1]["tflops_per_chip"] / rows[0]["tflops_per_chip"]
            label = "weak-scaling per-chip efficiency"
        print(f"{label} {rows[0]['devices']}->"
              f"{rows[-1]['devices']} devices: {eff*100:.1f}%")
        for r in rows:
            r["efficiency_vs_1dev"] = (
                (r["tflops"] if virtual else r["tflops_per_chip"])
                / (rows[0]["tflops"] if virtual
                   else rows[0]["tflops_per_chip"]))
            r["metric"] = "aggregate" if virtual else "per_chip"
    if args.csv:
        import csv as _csv

        with open(args.csv, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
