"""Sampling utilities: deterministic RNG fields, discrete CDF sampling,
MIS heuristics (reference Common.cuh:256-295, 348-459, 1571-1574).

The reference seeds a PCG stream from wall-clock time per pixel
(PathTrace.cuh:589-592) — non-deterministic across runs. Here every random
draw is a full-image field generated from a `jax.random` key folded per
(frame, bounce, use-site), which makes renders bit-reproducible and
gradients well-defined (SURVEY.md §7.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from svgf_tpu.ops.geometry import PI, basis_from_z, dot, normalize


class RngStream:
    """Hands out independent uniform fields from a base key, one per call.

    Call order is static under jit (python-side counter), so every use site
    gets a stable, distinct fold — the analogue of the reference's per-site
    RNG advances, without the time dependence.
    """

    def __init__(self, key: jax.Array):
        self.key = key
        self._n = 0

    def uniform(self, shape) -> jax.Array:
        self._n += 1
        return jax.random.uniform(jax.random.fold_in(self.key, self._n), shape)

    def uniform2(self, shape) -> jax.Array:
        return jnp.stack([self.uniform(shape), self.uniform(shape)], axis=-1)


def power_heuristic(pdf0, pdf1):
    """(Common.cuh:1571-1574), in the overflow-stable ratio form.

    pdf0^2/(pdf0^2+pdf1^2) overflows fp32 for pdf ~ 1e20 (grazing light
    samples), yielding inf/inf = NaN that the reference scrubs to black
    (PathTrace.cuh:348) and that poisons gradients. 1/(1+(pdf1/pdf0)^2) has
    the correct limits everywhere: ratio overflow -> heuristic 0.
    """
    r = pdf1 / jnp.maximum(pdf0, 1e-30)
    ph = 1.0 / (1.0 + r * r)
    return jnp.where(pdf0 <= 0.0, 0.0, ph)


def sample_uniform_index(size: int, rand):
    """clamp(int(rand*size), 0, size-1) (Common.cuh:235-239)."""
    return jnp.clip((rand * size).astype(jnp.int32), 0, size - 1)


def sample_triangle_uv(ruv):
    """Uniform triangle barycentrics (Common.cuh:229-234)."""
    s = jnp.sqrt(ruv[..., 0])
    return jnp.stack([1.0 - s, ruv[..., 1] * s], axis=-1)


def sample_sphere(ruv):
    """(Common.cuh:399-405)."""
    z = 2.0 * ruv[..., 1] - 1.0
    r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    phi = 2.0 * PI * ruv[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_hemisphere_cosine(normal, ruv):
    """(Common.cuh:721-729)."""
    z = jnp.sqrt(ruv[..., 1])
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * ruv[..., 0]
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    bx, by, bz = basis_from_z(normal)
    return normalize(
        local[..., 0:1] * bx + local[..., 1:2] * by + local[..., 2:3] * bz
    )


def sample_hemisphere_cosine_pdf(normal, direction):
    """(Common.cuh:731-738)."""
    cosw = dot(normal, direction)
    return jnp.where(cosw <= 0, 0.0, cosw / PI)


def upper_bound_segment(cdf: jax.Array, start, count, x):
    """Vectorized std::upper_bound over a CDF segment (Common.cuh:348-371).

    Finds the first index in [start, start+count) with cdf[idx] > x, via a
    fixed-iteration lockstep binary search (each lane may have a different
    segment). Returns indices relative to the whole `cdf` array.
    """
    n = cdf.shape[0]
    lo = jnp.broadcast_to(start, x.shape).astype(jnp.int32)
    hi = (lo + count).astype(jnp.int32)
    import math

    for _ in range(max(1, math.ceil(math.log2(max(n, 2))) + 1)):
        live = lo < hi
        mid = (lo + hi) // 2
        v = cdf[jnp.clip(mid, 0, n - 1)]
        right = live & (x >= v)
        lo = jnp.where(right, mid + 1, lo)
        hi = jnp.where(live & ~right, mid, hi)
    # reference post-adjust (:365-367)
    v_lo = cdf[jnp.clip(lo, 0, n - 1)]
    lo = jnp.where((lo < start + count) & (v_lo <= x), lo + 1, lo)
    return lo


def sample_discrete(cdf: jax.Array, start, count, rand):
    """SampleDiscrete (Common.cuh:374-387): returns index in [0, count)."""
    n = cdf.shape[0]
    last = cdf[jnp.clip(start + count - 1, 0, n - 1)]
    r = jnp.clip(rand * last, 0.0, last - 1e-5)
    idx = upper_bound_segment(cdf, start, count, r) - start
    return jnp.clip(idx, 0, count - 1)


def sample_discrete_pdf(cdf: jax.Array, start, count, idx):
    """(Common.cuh:407-411): probability mass of element idx."""
    n = cdf.shape[0]
    hi = cdf[jnp.clip(start + idx, 0, n - 1)]
    lo = jnp.where(idx == 0, 0.0, cdf[jnp.clip(start + idx - 1, 0, n - 1)])
    last = cdf[jnp.clip(start + count - 1, 0, n - 1)]
    return (hi - lo) / last
