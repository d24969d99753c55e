"""Headline benchmark: emulated DGEMM TFLOP/s at m=n=k=8192, num_moduli=14,
fast mode, on one TPU chip (BASELINE.json metric).

vs_baseline normalizes against the reference's GH200 OS2-fast-14 row
(72.13 TFLOPS, BASELINE.md §1) scaled by the int8 peak ratio of the two
chips (GH200 int8 probe 1575 TOPS vs TPU v5e 394.5 TOPS): an equal-quality
implementation on this chip would score 72.13 * 394.5/1575 = 18.07 TFLOPS.
Prints one JSON line.

Schedule selection: each candidate schedule is compiled, accuracy-gated
against the dd oracle, speed-probed with a short chained run, and the
fastest is measured. The default candidate list is "0" (the monolithic
fused path): the panel/rider pipeline modes 3 and 1 measured SLOWER on
chip (riders don't hide — kill table in PERF_NOTES.md), so probing them
burns chip time on known losers. They remain opt-in probes:
GEMMUL8_BENCH_MODES="3,1,0".
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: the 8192^3 graphs take minutes to compile
    # through the remote TPU compiler; cache hits make reruns instant
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # dead-tunnel protection: fail fast and visibly instead of hanging in
    # backend init or grinding the 8192^3 protocol on CPU for days
    from gemmul8_tpu.bench.timing import require_tpu
    require_tpu()
    import sys

    import jax.numpy as jnp

    from gemmul8_tpu.bench.matrices import phi_matrix
    from gemmul8_tpu.bench.native import dd_gemm, relerr_vs_dd
    from gemmul8_tpu.core import gemm as gg
    from gemmul8_tpu.types import F64Bits, bits_to_f64, f64_to_bits

    n = 8192
    num_moduli = 14
    a = phi_matrix(n, n, 0.5, seed=0)

    A = f64_to_bits(a)
    B = f64_to_bits(a.T.copy())

    def run(x, y_hi, y_lo, s_prev):
        # fold the previous checksum into one mantissa LSB of B's first row
        # inside the jitted graph: iterations form a serial dependency
        # chain no caching or reordering layer can collapse. y_lo is
        # donated and threaded through, so the update aliases in place
        # instead of copying the 270 MB buffer.
        y_lo = y_lo.at[0, 0].set(y_lo[0, 0] ^ (s_prev & jnp.uint32(1)))
        o = gg.gemm_core(x, F64Bits(y_hi, y_lo), num_moduli, True, "f64")
        # checksum over a strided sample: forces the (whole-array) kernels
        # to run while itself costing ~nothing — summing the full 540 MB
        # output would charge ~1.5 ms of measurement plumbing to the GEMM
        return o, jnp.sum(o.hi[::64, ::64] ^ o.lo[::64, ::64]), y_lo

    # one gate tile per risky on-chip write region: the pipeline schedule's
    # aliased writes are asserted bit-exact in interpret mode, which cannot
    # model Mosaic's prefetch/flush behavior — a wrong-on-chip schedule must
    # be caught on the warmup call, BEFORE it is benchmarked. Regions:
    # panel 0 + B's left-half encode (top-left), middle-panel alias-chained
    # writes + B's right-half rider encode (middle rows x right cols), and
    # the last panel's aliased reconstruct (bottom-right).
    _GATE_TILES = [(0, 0), (n // 2, n - 256), (n - 256, n - 256)]
    _ref_tiles = {}

    def warmup_relerr(out):
        worst = 0.0
        for r, c in _GATE_TILES:
            got = bits_to_f64(F64Bits(out.hi[r:r + 256, c:c + 256],
                                      out.lo[r:r + 256, c:c + 256]),
                              to_numpy=True)
            if (r, c) not in _ref_tiles:
                _ref_tiles[r, c] = dd_gemm(
                    a[r:r + 256], np.ascontiguousarray(a.T[:, c:c + 256]))
            ref_hi, ref_lo = _ref_tiles[r, c]
            rel, _ = relerr_vs_dd(got, ref_hi, ref_lo)
            worst = max(worst, rel)
        return worst

    def sync_rtt(s):
        t = time.perf_counter()
        int(jnp.sum(s))
        return time.perf_counter() - t

    # Timing protocol: enqueue all chained iterations, sync once at the
    # end, subtract one measured sync round trip. The remote-TPU tunnel has
    # a ~60 ms host<->device RTT; syncing per iteration would measure the
    # tunnel, not the chip (the reference's 100-iter average has the same
    # chained structure, test_double.cu:201-488).
    def chained(f, state, iters):
        out, s, b_lo = state
        t0 = time.perf_counter()
        for _ in range(iters):
            out, s, b_lo = f(A, B.hi, b_lo, s)
        int(s)
        t_total = time.perf_counter() - t0
        return (t_total - sync_rtt(s)) / iters, (out, s, b_lo)

    modes = [int(x) for x in
             os.environ.get("GEMMUL8_BENCH_MODES", "0").split(",")]
    if 0 not in modes:
        modes.append(0)  # the monolithic schedule is the safety net

    # Compile + accuracy-gate each candidate schedule, then speed-probe it
    # with a short chained run; measure the fastest. A candidate that fails
    # to compile, execute, or pass the gate is skipped (the monolithic
    # schedule has no aliased writes and must pass).
    survivors = []  # (dt_probe, mode, fn, state)
    for mode in modes:
        os.environ["GEMMUL8_PIPELINE"] = str(mode)

        def run_m(x, y_hi, y_lo, s_prev, _mode=mode):
            return run(x, y_hi, y_lo, s_prev)

        f = jax.jit(run_m, donate_argnums=(2,))
        try:
            b_lo = jnp.array(B.lo)  # fresh copy: each candidate donates it
            s = jnp.uint32(0)
            out, s, b_lo = f(A, B.hi, b_lo, s)  # compile + warmup
            int(s)
            rel0 = warmup_relerr(out)
            if not rel0 < 1e-8:
                raise RuntimeError(f"warmup accuracy gate: relerr {rel0:.2e}")
            sync_rtt(s)  # warm the sync-probe op so its compile isn't timed
            dt, state = chained(f, (out, s, b_lo), 5)
            survivors.append((dt, mode, f, state))
            print(f"[bench] mode {mode}: probe {dt*1e3:.2f} ms/call "
                  f"(relerr {rel0:.2e})", file=sys.stderr)
        except Exception as e:  # pragma: no cover - chip-side safety net
            print(f"[bench] mode {mode} failed "
                  f"({type(e).__name__}: {e}); skipping", file=sys.stderr)
    assert survivors, "every schedule failed, incl. monolithic"

    survivors.sort(key=lambda t: t[0])
    dt0, mode, f, state = survivors[0]
    # free the losers' device buffers (out hi/lo + donated b_lo each)
    # before the measured run — at 8192^2 they would otherwise pin
    # ~0.5 GB/candidate of dead HBM against the winner's pipeline
    for _, _, _, st in survivors[1:]:
        for leaf in jax.tree_util.tree_leaves(st):
            if isinstance(leaf, jax.Array):
                leaf.delete()
    del survivors
    dt, (out, s, b_lo) = chained(f, state, 20)
    tflops = 2 * n ** 3 / dt / 1e12

    # accuracy spot check on the gate tiles vs the dd oracle (a plain f64
    # numpy reference is itself rounding noise on the near-zero zero-mean
    # sums of a@a.T, inflating the reported max relerr by orders of
    # magnitude and masking real regressions)
    relerr = warmup_relerr(out)

    baseline_equiv = 72.13 * 394.5 / 1575.0
    print(json.dumps({
        "metric": "emulated DGEMM TFLOP/s (8192^3, 14 moduli, fast, "
                  f"1 chip, schedule {mode}; max relerr vs dd ref "
                  f"{relerr:.2e})",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / baseline_equiv, 3),
    }))


if __name__ == "__main__":
    main()
