"""Does lax.clz (count-leading-zeros) lower through Mosaic on TPU?

If yes, limbs.msb_position can drop its per-limb f32-exponent trick
(~5 vector ops/limb) for a clz-based scan (~3 ops/word on packed words).
Run: python scripts/probe_clz.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    def kern(x_ref, o_ref):
        o_ref[:] = jax.lax.clz(x_ref[:])

    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 2**31, (256, 256), dtype=np.int32))
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        interpret=False,
    )
    try:
        out = np.asarray(jax.jit(f)(x))
        ref = 32 - np.frexp(np.asarray(x).astype(np.float64))[1]
        ref = np.where(np.asarray(x) == 0, 32, ref)
        ok = np.array_equal(out, ref)
        print("clz lowers:", True, "correct:", bool(ok))
    except Exception as e:
        print("clz lowers:", False, str(e)[:200])


if __name__ == "__main__":
    main()
