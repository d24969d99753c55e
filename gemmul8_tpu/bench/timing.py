"""Chained-enqueue device timing.

The remote-TPU tunnel costs ~60 ms per host sync and ~3 ms per dispatch,
and `block_until_ready()` can return before execution finishes, so naive
sync-per-iteration loops measure the tunnel, not the chip. Protocol (the
same one bench.py's headline uses, mirroring the reference's 100-iter
averages, test_double.cu:201-488):

  1. the step function threads a state through itself — a serial data
     dependency no caching/reordering layer can collapse;
  2. warm up the step AND the sync probe (compiles are not timed);
  3. enqueue all iterations, fence ONCE at the end (block_until_ready +
     a 1-element device_get, the only true fence on this runtime);
  4. subtract one measured sync round trip.
"""

from __future__ import annotations

import time

import numpy as np


def require_tpu(timeout_s: int = 600) -> None:
    """Bound TPU backend init and fail fast off-chip.

    When the axon tunnel is down, the plugin's first device query blocks
    forever in a C call; a SIGALRM handler never runs (the main thread
    never returns to bytecode) but a daemon thread can, because the hang
    releases the GIL around network waits. Exits the process with a
    message on timeout or a non-TPU default backend — for bench/sweep
    entry points whose protocols are meaningless off-chip."""
    import sys
    import threading

    import jax

    done = threading.Event()

    def _watchdog():
        if not done.wait(timeout_s):
            sys.stderr.write("[bench] TPU backend init timed out "
                             "(axon tunnel down?)\n")
            sys.stderr.flush()
            import os
            os._exit(1)

    threading.Thread(target=_watchdog, daemon=True).start()
    backend = jax.default_backend()
    done.set()
    if backend != "tpu":
        print(f"[bench] no TPU backend (default_backend={backend!r})",
              file=sys.stderr)
        sys.exit(1)


def fence(x) -> None:
    """True execution fence: a 1-element readback of the LAST leaf (the
    step functions put their checksum last, which depends on everything).

    Deliberately no block_until_ready first: on in-flight work it costs
    its own tunnel round trip, which the ready-probe used for sync-cost
    subtraction cannot observe — the leftover would bias every
    measurement by ~one RTT per run."""
    import jax

    leaves = [t for t in jax.tree_util.tree_leaves(x)
              if hasattr(t, "block_until_ready")]
    if leaves:
        t0 = leaves[-1]
        np.asarray(jax.device_get(t0.ravel()[0] if t0.ndim else t0))


def chained_time(step, state, iters: int):
    """Time `step(state) -> state` (jitted, serially dependent through
    state). Returns (seconds_per_iteration, final_state)."""
    import jax.numpy as jnp

    state = step(state)        # warmup / compile (untimed)
    fence(state)
    probe = jnp.zeros(())
    fence(probe)               # warm the sync probe too
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    fence(state)
    t_total = time.perf_counter() - t0
    t_sync = []
    for _ in range(3):
        t1 = time.perf_counter()
        fence(probe)
        t_sync.append(time.perf_counter() - t1)
    # min of 3: tunnel jitter is one-sided
    return max((t_total - min(t_sync)) / iters, 1e-12), state
