"""Soundness of the float-estimate Barrett epilogue over the FULL k range.

The fused matmul epilogue (pallas/matmul.py::matmul_mod_u8_pallas) reduces
the int32 accumulator x to a canonical residue with

    q = floor(f32(x) * f32(1/m) - bias);  r = x - q*m;  fixup subtracts

where `bias` must dominate the f32 quotient-error budget: if q ever
overshoots floor(x/m) the remainder goes NEGATIVE and the >=-only fixups
cannot repair it (the uint8 cast then wraps — a silent, data-dependent
corruption that no sampled accuracy test reliably hits).  The committed
bias bound once omitted the multiply/bias-subtraction rounding terms and
was violated at k=65536 by 0.02 quotient units (review finding).

This test mirrors the kernel's arithmetic operation-for-operation in
numpy float32/int64 and drives it with adversarial accumulator values —
every float32 boundary near every multiple of every modulus, plus the
static extremes — for each padded-k the planner can produce.  It proves
(by exhaustive coverage of the f32 rounding boundaries, not sampling)
that the derived (bias, fix_steps) keep r in [0, m) over the whole
|x| <= 128^2*k accumulator range.
"""

import numpy as np
import pytest

from gemmul8_tpu import tables
from gemmul8_tpu.pallas.matmul import barrett_fixup_params

I64 = np.int64


def emulate_epilogue(x, m, bias, fix_steps):
    """Bit-faithful numpy mirror of the kernel's Barrett sequence.

    x int64 (values within int32), returns r.  f32 ops round exactly as
    the VPU does (round-to-nearest-even); int ops stay exact (the kernel's
    int32 never wraps here: q <= floor(x/m) so q*m <= x, and undershoot is
    bounded by the fixup budget).
    """
    xf = np.float32(x) if np.isscalar(x) else x.astype(np.float32)
    rj = np.float32(1.0 / m)
    q = np.floor(xf * rj - np.float32(bias)).astype(I64)
    r = x - q * m
    for s in fix_steps:
        r = r - np.where(r >= s * m, s * m, 0)
    return r


def adversarial_values(m: int, xmax: int) -> np.ndarray:
    """Accumulator values that stress every f32 rounding boundary.

    For |x| >= 2^24 consecutive ints collapse onto the same f32, so the
    distinct f32 inputs near each multiple t*m are what matter: take the
    f32 neighborhood (prev/next representable) of t*m for a dense sweep
    of t, plus the exact multiples, off-by-ones, and range extremes.
    """
    qmax = xmax // m
    # dense t coverage: all t up to 4096, then geometric to qmax
    ts = np.unique(np.concatenate([
        np.arange(0, min(qmax, 4096) + 1),
        np.geomspace(1, max(qmax, 1), 20000).astype(I64),
        np.array([qmax - 1, qmax], dtype=I64),
    ]))
    ts = ts[(ts >= 0) & (ts <= qmax)]
    mult = ts * m
    # f32 boundary neighbors of each multiple (cast back to int)
    f = mult.astype(np.float32)
    nb = np.concatenate([
        np.nextafter(f, np.float32(np.inf)).astype(I64),
        np.nextafter(f, np.float32(-np.inf)).astype(I64),
    ])
    cand = np.concatenate([mult, mult + 1, mult - 1, nb,
                           np.array([0, 1, xmax - 1, xmax], dtype=I64)])
    cand = np.concatenate([cand, -cand])
    return np.unique(cand[(cand >= -xmax) & (cand <= xmax)])


# padded-k values the planner can produce (block bk caps at 8192; kp is
# k rounded to 128): cover the boundary ks and the contract extremes.
KS = [128, 1024, 8192, 16384, 65536, 131072]


@pytest.mark.parametrize("kp", KS)
def test_barrett_sound_over_full_range(kp):
    moduli_idx = tuple(range(20))
    bias, fix_steps = barrett_fixup_params(kp, moduli_idx)
    int32_max = 2**31 - 1
    for j in moduli_idx:
        m = int(tables.MODULI[j])
        # non-256 lanes cannot wrap int32 (|residue| <= 127 for odd m);
        # the 256 lane CAN hit 2^31 exactly at k=2^17 — tested separately.
        xmax = min(128 * 128 * kp, int32_max)
        x = adversarial_values(m, xmax)
        r = emulate_epilogue(x, m, bias, fix_steps)
        assert ((r - x) % m == 0).all(), f"m={m}: non-congruent residue"
        bad_lo = x[r < 0]
        bad_hi = x[r >= m]
        assert bad_lo.size == 0, \
            f"m={m}: negative remainder (q overshoot) at x={bad_lo[:5]}"
        assert bad_hi.size == 0, \
            f"m={m}: unreduced remainder (fixups short) at x={bad_hi[:5]}"


def test_barrett_256_lane_wrap():
    """The 256 lane may wrap int32 at k=2^17 (128*128*2^17 == 2^31); the
    wrapped value is congruent mod 256 and the epilogue must still emit
    the canonical low byte."""
    bias, fix_steps = barrett_fixup_params(131072, tuple(range(20)))
    # int32-wrapped extremes and random wrapped values
    rng = np.random.default_rng(7)
    true_x = rng.integers(-2**35, 2**35, 4096, dtype=I64)
    wrapped = ((true_x + 2**31) % 2**32 - 2**31).astype(I64)
    r = emulate_epilogue(wrapped, 256, bias, fix_steps)
    assert ((r - wrapped) % 256 == 0).all()
    assert (r >= 0).all() and (r < 256).all()
    # 2^32 ≡ 0 (mod 256): the wrap preserves the true residue
    assert (r == (true_x % 256)).all()


def test_old_bias_was_unsound():
    """Meta-test: the pre-fix budget (cast + reciprocal terms only) is
    violated by a constructible accumulator at k=65536 — proving this
    suite would have caught the bug."""
    kp = 65536
    m = 173
    xmax = 127 * 128 * kp
    old_qerr = (2.0 ** (max(int(np.ceil(np.log2(xmax))) - 24, 0)) / m
                + xmax / m / 2**24 + 2.0**-10)
    old_bias = float(np.ceil(old_qerr * 8) / 8)
    x = adversarial_values(m, min(128 * 128 * kp, 2**31 - 1))
    r = emulate_epilogue(x, m, old_bias, (1,))
    assert (r < 0).any() or (r >= m).any(), \
        "old bias unexpectedly sound — update this meta-test"
