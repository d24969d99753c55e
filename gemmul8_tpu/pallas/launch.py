"""Device-kind-keyed launch configuration for the Pallas kernels.

The C3 analog of the reference's GEMMul8_ARCH-keyed launch tables
(/root/reference/GEMMul8/src/common.hpp:11-20, gemmul8.cu:206-224): block
shapes were tuned on TPU v5e (scripts/tune_kernels.py / tune_matmul.py);
a different TPU generation gets a conservative generic profile instead of
silently running v5e blocks into its VMEM limits.

Bit-contract note: the fast-mode statistics REDUCTION CHUNK (the 2048
along the contraction axis) is part of the shift's bit contract (the
block-wise online norm merge) and is therefore FIXED across profiles —
only row/tile counts, which are pure tuning, vary per device kind.
"""

from __future__ import annotations

import functools

import jax

# the reduction-chunk width every profile shares (bit contract — see
# pallas.kernels.fast_sft_pallas and fast_encode_fused_pallas)
STATS_CHUNK = 2048

# Tuned on v5e at 8192^2/14 (tune_kernels.py round-4 sweeps; see
# PERF_NOTES.md "stats row blocks went per-axis").
_V5E = {
    "stats_ax1": (512, STATS_CHUNK),
    "stats_ax0": (1024, STATS_CHUNK),
    "enc_vpu": (64, 512),
    "enc_mxu": (8, 4096),
    "rec_vpu": (32, 256),
    "rec_mxu": (8, 4096),
    "matmul": (1024, 512, 8192),
    "magmax": (1024, 1024, 8192),
    "mag7": (512, 1024),
}

# Conservative fallback for unknown chips: half-width second dims keep
# VMEM footprints within the universal 16 MB scoped budget even without
# the vmem_limit override; k-tile 4096 halves operand residency. Correct
# everywhere, merely slower than a tuned profile.
_GENERIC = {
    "stats_ax1": (256, STATS_CHUNK),
    "stats_ax0": (256, STATS_CHUNK),
    "enc_vpu": (32, 256),
    "enc_mxu": (8, 2048),
    "rec_vpu": (32, 256),
    "rec_mxu": (8, 2048),
    "matmul": (512, 512, 4096),
    "magmax": (512, 512, 4096),
    "mag7": (256, 512),
}

# device_kind (lowercased substring) -> profile. v6e gets the v5e blocks
# as a starting point (same Mosaic tiling rules, larger VMEM — the v5e
# shapes are legal and near-optimal until tuned on hardware).
_PROFILES = (
    ("v5 lite", _V5E),
    ("v5e", _V5E),
    ("v6 lite", _V5E),
    ("v6e", _V5E),
    # CPU interpret mode (tests): block shape only affects grid slicing,
    # use the tuned shapes so interpret-mode parity covers the real config
    ("cpu", _V5E),
)


@functools.lru_cache(maxsize=None)
def _profile_for(kind: str) -> dict:
    k = kind.lower()
    for sub, prof in _PROFILES:
        if sub in k:
            return prof
    return _GENERIC


def device_kind() -> str:
    """Current device kind string ('cpu' off-TPU)."""
    if jax.default_backend() != "tpu":
        return "cpu"
    return jax.devices()[0].device_kind


def get(name: str, kind: str | None = None):
    """Launch block for kernel `name` on the current (or given) device
    kind. Names: stats_ax1, stats_ax0, enc_vpu, enc_mxu, rec_vpu,
    rec_mxu, matmul, magmax."""
    prof = _profile_for(kind if kind is not None else device_kind())
    return prof[name]
