"""Multi-limb integer arithmetic on int32 arrays (16-bit limbs).

The TPU-native substitute for the f64 / double-double arithmetic the
reference uses in CRT reconstruction (/root/reference/GEMMul8/src/
inverse_scaling.hpp:35-262): all values are little-endian lists of int32
arrays each holding 16 bits, so every operation is exact VPU integer math.

Conventions: limbs may temporarily exceed 16 bits (redundant representation)
until `carry_propagate` is called; canonical limbs are in [0, 0xFFFF].
Signed intermediate limbs are fine — carry propagation uses arithmetic
shifts, which implement floor division by 2^16 for negative values too.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

_I32 = jnp.int32
_MASK = 0xFFFF


def carry_propagate(limbs: Sequence[jax.Array]) -> List[jax.Array]:
    """Normalize limbs into [0, 0xFFFF] each, propagating carries/borrows.
    The final carry is dropped (caller must size the limb count so it is 0,
    or use `sub` which returns the borrow)."""
    out = []
    c = jnp.zeros_like(limbs[0])
    for x in limbs:
        t = x + c
        out.append(t & _I32(_MASK))
        c = t >> 16  # arithmetic shift = floor division (handles negatives)
    return out


def sub(a: Sequence[jax.Array], b: Sequence[jax.Array]):
    """a - b limbwise with borrow propagation. Returns (limbs, borrow) where
    borrow is 0 if a >= b else -1 (a, b canonical, same length)."""
    out = []
    c = jnp.zeros_like(a[0])
    for xa, xb in zip(a, b):
        t = xa - xb + c
        out.append(t & _I32(_MASK))
        c = t >> 16
    return out, c


def select(cond: jax.Array, a: Sequence[jax.Array], b: Sequence[jax.Array]):
    """Elementwise limb select: cond ? a : b."""
    return [jnp.where(cond, xa, xb) for xa, xb in zip(a, b)]


def scale_const_sub(a: Sequence[jax.Array], t: jax.Array,
                    const_limbs: Sequence[int]) -> List[jax.Array]:
    """a - t * C for a small nonnegative elementwise multiplier t (< 2^13)
    and a compile-time constant C given as python ints. Result canonical
    (caller guarantees a - t*C fits the limb count and is >= -few*C)."""
    out = []
    c = jnp.zeros_like(a[0])
    for xa, cl in zip(a, const_limbs):
        prod = t * _I32(int(cl)) if cl else jnp.zeros_like(t)
        v = xa - prod + c
        out.append(v & _I32(_MASK))
        c = v >> 16
    return out, c


def sub_const(a: Sequence[jax.Array], const_limbs: Sequence[int]):
    """a - C limbwise vs a compile-time constant. Returns (limbs, borrow):
    borrow == 0 iff a >= C (limbs then canonical), else -1."""
    out = []
    c = jnp.zeros_like(a[0])
    for xa, cl in zip(a, const_limbs):
        t = xa - _I32(int(cl)) + c
        out.append(t & _I32(_MASK))
        c = t >> 16
    return out, c


def const_minus(const_limbs: Sequence[int], a: Sequence[jax.Array]):
    """C - a (elementwise; caller guarantees C >= a)."""
    out = []
    c = jnp.zeros_like(a[0])
    for xa, cl in zip(a, const_limbs):
        v = _I32(int(cl)) - xa + c
        out.append(v & _I32(_MASK))
        c = v >> 16
    return out


def shift_right(limbs: Sequence[jax.Array], u: jax.Array,
                n_out: int) -> List[jax.Array]:
    """Dynamic right shift by u (elementwise int32, 0 <= u <= 16*(len+1)),
    keeping the lowest n_out output limbs. Canonical input limbs.
    Thin wrapper over shift_right_round (one packed funnel-shift
    implementation to maintain)."""
    return shift_right_round(limbs, u, n_out)[0]


def shift_right_round(limbs: Sequence[jax.Array], u: jax.Array,
                      n_out: int):
    """shift_right plus the IEEE rounding inputs in one packed pass:
    returns (shifted n_out limbs, round_bit, sticky) where round_bit is
    bit (u-1) of the value (0 when u == 0) and sticky is whether any bit
    below (u-1) is set. Shares the word packing the three separate calls
    (shift_right, a 1-limb shift for the round bit, dropped_nonzero)
    would each redo."""
    n = len(limbs)
    _U = jnp.uint32
    nw = (n + 1) // 2
    words = []
    for i in range(nw):
        w = limbs[2 * i].astype(_U)
        if 2 * i + 1 < n:
            w = w | (limbs[2 * i + 1].astype(_U) << 16)
        words.append(w)
    nw_out = (n_out + 1) // 2
    max_ws = (16 * (n + 1)) // 32 + 1
    ws = u >> 5
    b = (u & _I32(31)).astype(_U)
    zero = jnp.zeros_like(words[0])
    padded = words + [zero] * (max_ws + nw_out + 2)
    out_words = []
    for i in range(nw_out):
        sw = padded[i]
        sw1 = padded[i + 1]
        for wv in range(1, max_ws + 1):
            sw = jnp.where(ws == wv, padded[i + wv], sw)
            sw1 = jnp.where(ws == wv, padded[i + wv + 1], sw1)
        out_words.append((sw >> b) | ((sw1 << (_U(31) - b)) << 1))
    out = []
    for j in range(n_out):
        w = out_words[j // 2]
        w = (w >> 16) if (j % 2) else w
        out.append(w.astype(_I32) & _I32(_MASK))
    # round bit: bit (u-1); select its word, then its bit
    up = jnp.maximum(u - 1, 0)
    wsp = up >> 5
    bp = (up & _I32(31)).astype(_U)
    rw = padded[0]
    for wv in range(1, max_ws + 1):
        rw = jnp.where(wsp == wv, padded[wv], rw)
    rbit = jnp.where(u > 0, ((rw >> bp) & _U(1)).astype(_I32), _I32(0))
    # sticky: any of the low (u-1) bits
    sticky = jnp.zeros(limbs[0].shape, jnp.bool_)
    for i, w in enumerate(words):
        nbits = jnp.clip(up - 32 * i, 0, 32)
        full = nbits >= 32
        mask = jnp.where(full, _U(0xFFFFFFFF),
                         (_U(1) << nbits.astype(_U)) - _U(1))
        sticky = sticky | ((w & mask) != 0)
    return out, rbit, sticky


def shift_left(limbs: Sequence[jax.Array], v: jax.Array,
               n_out: int) -> List[jax.Array]:
    """Dynamic left shift by v (0 <= v <= 16*n_out), keeping n_out limbs."""
    w = v >> 4
    b = v & _I32(15)
    max_w = n_out
    padded = [jnp.zeros_like(limbs[0])] * (max_w + 1) + list(limbs)
    # padded index: limb i of input is at padded[max_w + 1 + i]
    out = []
    for i in range(n_out):
        sw = jnp.zeros_like(limbs[0])
        sw1 = jnp.zeros_like(limbs[0])
        for wv in range(0, max_w + 1):
            idx = max_w + 1 + i - wv
            lo = padded[idx] if 0 <= idx < len(padded) else jnp.zeros_like(limbs[0])
            idx2 = idx - 1
            lo1 = padded[idx2] if 0 <= idx2 < len(padded) else jnp.zeros_like(limbs[0])
            sw = jnp.where(w == wv, lo, sw)
            sw1 = jnp.where(w == wv, lo1, sw1)
        out.append(((sw << b) | (sw1 >> (16 - b))) & _I32(_MASK))
    return out


def dropped_nonzero(limbs: Sequence[jax.Array], u: jax.Array) -> jax.Array:
    """Whether any of the low u bits are nonzero ('sticky')."""
    sticky = jnp.zeros_like(limbs[0], dtype=jnp.bool_)
    for i, c in enumerate(limbs):
        nbits = jnp.clip(u - 16 * i, 0, 16)
        mask = (_I32(1) << nbits) - _I32(1)
        sticky = sticky | ((c & mask) != 0)
    return sticky


def msb_position(limbs: Sequence[jax.Array]) -> jax.Array:
    """Bit position of the most significant set bit (value >= 0; returns -1
    for zero). Uses exact f32 conversion of 16-bit limbs to find per-limb
    floor(log2)."""
    p = jnp.full_like(limbs[0], -1)
    for i, c in enumerate(limbs):
        cf = c.astype(jnp.float32)
        bits = jax.lax.bitcast_convert_type(cf, jnp.uint32)
        lmsb = ((bits >> 23) & jnp.uint32(0xFF)).astype(_I32) - _I32(127)
        p = jnp.where(c > 0, _I32(16 * i) + lmsb, p)
    return p
