"""Mesh-sharded emulated GEMM over TPU pod slices.

The reference is strictly single-GPU (SURVEY.md §2.5 — no NCCL/MPI anywhere);
this module is the TPU-native scaling design it lacks: operands are 2D-
sharded over a Mesh('x','y'), each shard encodes its local residue slices
(with shift statistics psum/pmax'd over the k-sharded axis so every shard
picks the same globally-valid shift), int8 slice products run per shard on
the local MXU, and the k-partial int32 products are combined with a single
exact integer `psum_scatter` over ICI **in residue space** — communication
stays integer-typed and CRT reconstruction happens exactly once, on the
shard that owns the output tile.

Sharding layout (forward step):
  A (m, k)  -> P('x', 'y')     row blocks x, k blocks y
  B (k, n)  -> P('y', None)    k blocks y (n replicated within a row of the
                               mesh; the scatter re-shards n over y)
  C (m, n)  -> P('x', 'y')

Exactness across shards: the int32 dot-product bound is on the *global* k
(k_total <= 2^17, include/gemmul8.hpp:20-equivalent), so summing int32
partials over shards cannot overflow; residues add homomorphically
(sum mod m == sum of partial residues mod m).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import tables
from ..core import encode as enc
from ..core import reconstruct as rec
from ..core import slicegemm as sg
from ..types import F64Bits


def make_mesh(n_devices: Optional[int] = None, shape=None,
              axis_names=("x", "y")) -> Mesh:
    """Build a 2D device mesh. With no shape, factor n_devices as close to
    square as possible (x*y = n)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if shape is None:
        x = int(np.floor(np.sqrt(n)))
        while n % x:
            x -= 1
        shape = (x, n // x)
    return jax.make_mesh(shape, axis_names, devices=devs[:shape[0] * shape[1]])


def _encode_local(x, num_moduli, axis, axis_name, use_pallas=False,
                  n_shards: int = 1):
    if use_pallas:
        # Pallas kernels per shard: raw stats, combined exactly over the
        # k-sharded axis (pmax / power-of-two-rescaled psum) so every shard
        # picks the same globally-valid shift, then the fused encode kernel.
        from ..pallas import kernels as pk

        mant_bits = 53 if isinstance(x, F64Bits) else 24
        k_total = x.shape[axis] * n_shards
        emax, nrm2, af = pk.fast_sft_pallas(x, num_moduli, axis,
                                            return_stats=True)
        emax, nrm2, af = enc.combine_stats(emax, nrm2, af, axis_name)
        sft = enc.sft_from_stats(emax, nrm2, af, k_total, num_moduli,
                                 mant_bits)
        return pk.encode_slices_pallas(x, sft, num_moduli, axis), sft
    if isinstance(x, F64Bits):
        return enc.encode_fast_f64(x, num_moduli, axis, axis_name)
    return enc.encode_fast_f32(x, num_moduli, axis, axis_name)


def _sharded_body(a, b, num_moduli: int, out_kind: str, ny: int,
                  use_pallas: bool = False):
    """Per-shard body (inside shard_map). a: local (m/x, k/y); b: local
    (k/y, n). Returns local C tile (m/x, n/y)."""
    a8, sft_a = _encode_local(a, num_moduli, axis=1, axis_name="y",
                              use_pallas=use_pallas, n_shards=ny)
    b8, sft_b = _encode_local(b, num_moduli, axis=0, axis_name="y",
                              use_pallas=use_pallas, n_shards=ny)
    c32_partial = sg.slice_products(a8, b8)          # (L, m/x, n) int32
    # exact integer reduce-scatter over the k axis, scattering n
    c32 = jax.lax.psum_scatter(c32_partial, "y", scatter_dimension=2,
                               tiled=True)           # (L, m/x, n/y)
    # slice this shard's n-block of the (replicated) column shifts
    n_local = c32.shape[2]
    j = jax.lax.axis_index("y").astype(jnp.int32)
    sft_b_tile = jax.lax.dynamic_slice(
        sft_b, (jnp.int32(0), j * jnp.int32(n_local)), (1, n_local))
    if use_pallas:
        from ..pallas import kernels as pk

        # fused mod-reduce + CRT + rounding per shard (the jnp chain would
        # round-trip every int32 intermediate through HBM)
        return pk.reconstruct_pallas(c32, sft_a, sft_b_tile, num_moduli,
                                     out_kind)
    r = sg.mod_reduce(c32, num_moduli)
    return rec.reconstruct(r, sft_a, sft_b_tile, num_moduli, out_kind)


@lru_cache(maxsize=None)
def _build_sharded(mesh, num_moduli: int, out_kind: str, is_f64_a: bool,
                   is_f64_b: bool, use_pallas: bool = False):
    ny = mesh.shape["y"]
    a_spec = F64Bits(P("x", "y"), P("x", "y")) if is_f64_a else P("x", "y")
    b_spec = F64Bits(P("y", None), P("y", None)) if is_f64_b else P("y", None)
    if out_kind == "f64":
        out_spec = F64Bits(P("x", "y"), P("x", "y"))
    else:
        out_spec = P("x", "y")
    fn = jax.shard_map(
        partial(_sharded_body, num_moduli=num_moduli, out_kind=out_kind,
                ny=ny, use_pallas=use_pallas),
        mesh=mesh, in_specs=(a_spec, b_spec), out_specs=out_spec,
        check_vma=False)
    return jax.jit(fn)


def gemm_sharded(a, b, mesh: Mesh, num_moduli: int = 14,
                 out_dtype: Optional[str] = None,
                 use_pallas: Optional[bool] = None):
    """Emulated GEMM 2D-sharded over `mesh` (fast mode).

    a: (m, k) F64Bits or f32 array; b: (k, n) same. m must divide by
    mesh.x, k by mesh.y, n by mesh.y. Returns C sharded P('x','y')."""
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"inner dims mismatch: {a.shape} x {b.shape}")
    if k > tables.MAX_K:
        raise ValueError("global k exceeds 2^17 int32-exactness bound")
    nx, ny = mesh.shape["x"], mesh.shape["y"]
    if m % nx or k % ny or n % ny:
        raise ValueError(f"shapes ({m},{k},{n}) must divide mesh {nx}x{ny}")
    is64a, is64b = isinstance(a, F64Bits), isinstance(b, F64Bits)
    out_kind = out_dtype or ("f64" if (is64a or is64b) else "f32")
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    fn = _build_sharded(mesh, num_moduli, out_kind, is64a, is64b, use_pallas)
    # place operands
    a_sh = jax.device_put(a, _sharding_for(mesh, P("x", "y"), is64a))
    b_sh = jax.device_put(b, _sharding_for(mesh, P("y", None), is64b))
    return fn(a_sh, b_sh)


def _sharding_for(mesh, spec, is_f64: bool):
    ns = NamedSharding(mesh, spec)
    if is_f64:
        return F64Bits(ns, ns)
    return ns
