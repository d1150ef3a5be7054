"""Pallas TPU kernel for the spatial moments fallback (Filter.cuh:430-525).

Why a kernel: the 7x7 cross-bilateral XLA fallback materializes 49 shifted
copies of 6 image planes through HBM (~11 ms at 1080p on v5e). Here each
grid step DMAs one halo-extended tile of the 12 input planes into VMEM,
evaluates all 49 taps on-chip, and writes 4 output planes once.

Perf notes (v5e, 1080p):
  * input DMAs are double-buffered across grid steps;
  * the fallback only applies to pixels with history < 4 (Filter.cuh:444).
    After temporal warm-up almost all tiles have no such pixel, so the
    kernel short-circuits to a pass-through copy when the tile's minimum
    history is >= 4 — the steady-state cost is pure bandwidth;
  * luminance / depth fixups hoisted out of the tap loop; per-tap divisions
    replaced by per-center reciprocal multiplies (same as atrous_pallas).

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

from svgf_tpu.kernels.atrous_pallas import _pow

_LUM = (0.2126, 0.7152, 0.0722)
_RADIUS = 3  # Filter.cuh:465

TILE_H = 128
TILE_W = 256


def _moments_kernel(inp_hbm, out_hbm, scratch, pre, shift, out_vmem, sem, osem,
                    *, phi_colour, phi_normal, th, tw, halo, eh, ew, nh, nw):
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * nw + j

    def start_dma(slot, ti, tj):
        pltpu.make_async_copy(
            inp_hbm.at[:, pl.ds(ti * th, eh), pl.ds(tj * tw, ew)],
            scratch.at[slot], sem.at[slot],
        ).start()

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        start_dma(0, i, j)

    pltpu.make_async_copy(
        inp_hbm.at[:, pl.ds(i * th, eh), pl.ds(j * tw, ew)],
        scratch.at[slot], sem.at[slot],
    ).wait()

    @pl.when(t + 1 < nh * nw)
    def _():
        tn = t + 1
        start_dma(jax.lax.rem(tn, 2), tn // nw, jax.lax.rem(tn, nw))

    # planes: 0-3 colour rgb+var (read RAW, no [0,1] clamp — Half4ToVec4
    # :450), 4-5 moments, 6 depth, 7 depth-deriv, 8-10 normal, 11 history
    def plane(k, dy=0, dx=0):
        return scratch[slot, k, halo + dy : halo + dy + th, halo + dx : halo + dx + tw]

    hist = plane(11)
    zc_raw = plane(6)
    invalid = zc_raw == 0.0
    # short history on a valid-depth pixel anywhere in the tile?
    needs_fallback = jnp.any((hist < 4.0) & ~invalid)

    @pl.when(jnp.logical_not(needs_fallback))
    def _():
        out_vmem[0] = plane(0)
        out_vmem[1] = plane(1)
        out_vmem[2] = plane(2)
        out_vmem[3] = plane(3)

    @pl.when(needs_fallback)
    def _():
        # pre planes over the extended tile: 0-2 rgb raw, 3-4 moments,
        # 5 lum, 6 z fixed, 7-9 normal (see atrous_pallas for the
        # shift-buffer rationale: sublane-misaligned reads are ~4x aligned)
        pre[0] = scratch[slot, 0]
        pre[1] = scratch[slot, 1]
        pre[2] = scratch[slot, 2]
        pre[3] = scratch[slot, 4]
        pre[4] = scratch[slot, 5]
        pre[5] = (
            _LUM[0] * scratch[slot, 0]
            + _LUM[1] * scratch[slot, 1]
            + _LUM[2] * scratch[slot, 2]
        )
        zr = scratch[slot, 6]
        pre[6] = jnp.where(zr == 0.0, 1e30, zr)
        pre[7] = scratch[slot, 8]
        pre[8] = scratch[slot, 9]
        pre[9] = scratch[slot, 10]

        c_rgb = (plane(0), plane(1), plane(2))
        c_var = plane(3)

        def ctr(k):
            return pre[k, halo : halo + th, halo : halo + tw]

        l_c = ctr(5)
        z_c = ctr(6)
        zd = plane(7)
        n_c = (ctr(7), ctr(8), ctr(9))
        inv_pd = pl.reciprocal(jnp.maximum(zd, 1e-8) * 3.0, approx=False)
        inv_l = 1.0 / phi_colour

        sum_w = jnp.zeros((th, tw), jnp.float32)
        acc = [jnp.zeros((th, tw), jnp.float32) for _ in range(5)]

        for dy in range(-_RADIUS, _RADIUS + 1):
            shift[...] = pre[:, halo + dy : halo + dy + th, :]

            def sp(k, dx):
                return shift[k, :, halo + dx : halo + dx + tw]

            for dx in range(-_RADIUS, _RADIUS + 1):
                l_p = sp(5, dx)
                z_p = sp(6, dx)
                ndot = n_c[0] * sp(7, dx) + n_c[1] * sp(8, dx) + n_c[2] * sp(9, dx)
                w_n = _pow(jnp.clip(ndot, 0.0, 1.0), phi_normal)
                if dx == 0 and dy == 0:
                    w_z = jnp.zeros((th, tw), jnp.float32)
                else:
                    inv_dist = float(1.0 / (dx * dx + dy * dy) ** 0.5)
                    w_z = jnp.abs(z_c - z_p) * inv_pd * inv_dist
                w_l = jnp.abs(l_c - l_p) * inv_l
                w = jnp.exp(-w_l - w_z) * w_n
                sum_w = sum_w + w
                acc[0] = acc[0] + w * sp(0, dx)
                acc[1] = acc[1] + w * sp(1, dx)
                acc[2] = acc[2] + w * sp(2, dx)
                acc[3] = acc[3] + w * sp(3, dx)
                acc[4] = acc[4] + w * sp(4, dx)

        inv = pl.reciprocal(jnp.maximum(sum_w, 1e-6), approx=False)
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

    nh, nw = hp // th, wp // tw
    out = pl.pallas_call(
        functools.partial(
            _moments_kernel, phi_colour=phi_colour, phi_normal=phi_normal,
            th=th, tw=tw, halo=halo, eh=eh, ew=ew, nh=nh, nw=nw,
        ),
        grid=(nh, nw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 12, eh, ew), jnp.float32),
            pltpu.VMEM((10, eh, ew), jnp.float32),
            pltpu.VMEM((10, th, ew), jnp.float32),
            pltpu.VMEM((4, th, tw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(padded)
    return jnp.moveaxis(out[:, :h, :w], 0, -1)
