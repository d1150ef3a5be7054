"""Pallas TPU kernels for the SVGF filter-chain stencils.

Each kernel is a drop-in replacement for its pure-XLA twin in
svgf_tpu.render.svgf (which stays the semantic reference and the CPU
fallback). `resolve_pallas(mode)` implements the config.use_pallas policy.
"""

import jax

from svgf_tpu.kernels.atrous_pallas import (
    atrous_chain_pallas,
    atrous_iteration_pallas,
)
from svgf_tpu.kernels.moments_pallas import filter_moments_pallas
from svgf_tpu.kernels.taa_pallas import taa_pallas
from svgf_tpu.kernels.temporal_pallas import (
    pack_prev_planes,
    temporal_filter_pallas,
)


def _is_tpu_backend() -> bool:
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    return "TPU" in dev.device_kind or dev.platform == "tpu"


def resolve_pallas(mode: str) -> tuple[bool, bool]:
    """Map config.use_pallas to (enabled, interpret).

    "auto" enables the kernels only on a TPU backend (including tunneled
    backends whose device_kind reports a TPU) so CPU tests and the
    virtual-device sharding dryruns transparently use the XLA stencils.
    """
    if mode == "on":
        return True, False
    if mode == "off":
        return False, False
    if mode == "interpret":
        return True, True
    if mode == "auto":
        return _is_tpu_backend(), False
    raise ValueError(f"use_pallas must be auto/on/off/interpret, got {mode!r}")


__all__ = [
    "atrous_chain_pallas",
    "atrous_iteration_pallas",
    "filter_moments_pallas",
    "taa_pallas",
    "temporal_filter_pallas",
    "pack_prev_planes",
    "resolve_pallas",
]
