"""Pallas TPU kernel for the spatial moments fallback (Filter.cuh:430-525).

Why a kernel: the 7x7 cross-bilateral XLA fallback materializes 49 shifted
copies of 6 image planes through HBM. Here each grid step DMAs one
halo-extended tile of the 12 input planes into VMEM, evaluates all 49 taps
on-chip, and writes 4 output planes once.

Boundary handling: the wrapper zero-pads by the halo; a zero normal makes
the edge-stopping weight vanish (0^phi_normal), reproducing the inside-mask
exclusion exactly (same trick as atrous_pallas).

Matches render.svgf.filter_moments bit-for-bit up to float reassociation
(parity tests: tests/test_kernels.py::test_moments_pallas_*).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svgf_tpu.kernels.atrous_pallas import TILE_H, TILE_W, _pow

_LUM = (0.2126, 0.7152, 0.0722)
_RADIUS = 3  # Filter.cuh:465


def _moments_kernel(inp_hbm, out_hbm, scratch, out_vmem, sem, osem,
                    *, phi_colour, phi_normal, th, tw, halo, eh, ew):
    i = pl.program_id(0)
    j = pl.program_id(1)

    copy = pltpu.make_async_copy(
        inp_hbm.at[:, pl.ds(i * th, eh), pl.ds(j * tw, ew)], scratch, sem
    )
    copy.start()
    copy.wait()

    # planes: 0-3 colour rgb+var (read RAW, no [0,1] clamp — Half4ToVec4
    # :450), 4-5 moments, 6 depth, 7 depth-deriv, 8-10 normal, 11 history
    def plane(k, dy=0, dx=0):
        return scratch[k, halo + dy : halo + dy + th, halo + dx : halo + dx + tw]

    c_rgb = (plane(0), plane(1), plane(2))
    c_var = plane(3)
    l_c = _LUM[0] * c_rgb[0] + _LUM[1] * c_rgb[1] + _LUM[2] * c_rgb[2]
    z_raw = plane(6)
    invalid = z_raw == 0.0
    z_c = jnp.where(invalid, 1e30, z_raw)
    zd = plane(7)
    n_c = (plane(8), plane(9), plane(10))
    hist = plane(11)
    phi_depth = jnp.maximum(zd, 1e-8) * 3.0

    sum_w = jnp.zeros((th, tw), jnp.float32)
    acc = [jnp.zeros((th, tw), jnp.float32) for _ in range(5)]  # rgb + 2 moments

    for dy in range(-_RADIUS, _RADIUS + 1):
        for dx in range(-_RADIUS, _RADIUS + 1):
            p_rgb = (plane(0, dy, dx), plane(1, dy, dx), plane(2, dy, dx))
            l_p = _LUM[0] * p_rgb[0] + _LUM[1] * p_rgb[1] + _LUM[2] * p_rgb[2]
            z_p = plane(6, dy, dx)
            z_p = jnp.where(z_p == 0.0, 1e30, z_p)
            ndot = (
                n_c[0] * plane(8, dy, dx)
                + n_c[1] * plane(9, dy, dx)
                + n_c[2] * plane(10, dy, dx)
            )
            w_n = _pow(jnp.clip(ndot, 0.0, 1.0), phi_normal)
            dist = float((dx * dx + dy * dy) ** 0.5)
            pd = phi_depth * dist
            w_z = jnp.where(
                pd == 0.0, 0.0, jnp.abs(z_c - z_p) / jnp.where(pd == 0.0, 1.0, pd)
            )
            w_l = jnp.abs(l_c - l_p) / phi_colour
            w = jnp.exp(-jnp.maximum(w_l, 0.0) - jnp.maximum(w_z, 0.0)) * w_n
            sum_w = sum_w + w
            acc[0] = acc[0] + w * p_rgb[0]
            acc[1] = acc[1] + w * p_rgb[1]
            acc[2] = acc[2] + w * p_rgb[2]
            acc[3] = acc[3] + w * plane(4, dy, dx)
            acc[4] = acc[4] + w * plane(5, dy, dx)

    inv = 1.0 / jnp.maximum(sum_w, 1e-6)
    f_m0 = acc[3] * inv
    f_m1 = acc[4] * inv
    variance = (f_m1 - f_m0 * f_m0) * (4.0 / jnp.maximum(hist, 1.0))

    # fallback only for short history on valid-depth pixels (Filter.cuh:444,
    # documented fix for the dead `zCenter.x < 0` env check — see svgf.py)
    use_fb = (hist < 4.0) & ~invalid
    out_vmem[0] = jnp.where(use_fb, acc[0] * inv, c_rgb[0])
    out_vmem[1] = jnp.where(use_fb, acc[1] * inv, c_rgb[1])
    out_vmem[2] = jnp.where(use_fb, acc[2] * inv, c_rgb[2])
    out_vmem[3] = jnp.where(use_fb, variance, c_var)
    wr = pltpu.make_async_copy(
        out_vmem, out_hbm.at[:, pl.ds(i * th, th), pl.ds(j * tw, tw)], osem
    )
    wr.start()
    wr.wait()


@functools.partial(
    jax.jit, static_argnames=("phi_colour", "phi_normal", "interpret")
)
def filter_moments_pallas(color, moments, gbuf, history_len,
                          phi_colour: float, phi_normal: float,
                          interpret: bool = False):
    """Drop-in Pallas replacement for svgf.filter_moments.

    color: (H, W, 4) rgb+var; moments: (H, W, 2); history_len: (H, W) i32.
    Returns (H, W, 4).
    """
    h, w = color.shape[:2]
    halo = _RADIUS
    th, tw = TILE_H, TILE_W
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    planes = jnp.stack(
        [
            color[..., 0].astype(jnp.float32),
            color[..., 1].astype(jnp.float32),
            color[..., 2].astype(jnp.float32),
            color[..., 3].astype(jnp.float32),
            moments[..., 0].astype(jnp.float32),
            moments[..., 1].astype(jnp.float32),
            gbuf.depth.astype(jnp.float32),
            gbuf.depth_deriv.astype(jnp.float32),
            gbuf.normal[..., 0].astype(jnp.float32),
            gbuf.normal[..., 1].astype(jnp.float32),
            gbuf.normal[..., 2].astype(jnp.float32),
            history_len.astype(jnp.float32),
        ],
        axis=0,
    )
    eh = -(-(th + 2 * halo) // 8) * 8
    ew = -(-(tw + 2 * halo) // 128) * 128
    padded = jnp.pad(
        planes,
        ((0, 0), (halo, (eh - th - halo) + hp - h), (halo, (ew - tw - halo) + wp - w)),
    )

    grid = (hp // th, wp // tw)
    out = pl.pallas_call(
        functools.partial(
            _moments_kernel, phi_colour=phi_colour, phi_normal=phi_normal,
            th=th, tw=tw, halo=halo, eh=eh, ew=ew,
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((12, eh, ew), jnp.float32),
            pltpu.VMEM((4, th, tw), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(padded)
    return jnp.moveaxis(out[:, :h, :w], 0, -1)
