"""Pallas TPU kernel for the TAA + sRGB stage (Filter.cuh:288-357).

Why a kernel: the XLA version pads the frame 8 times (one per neighbor) and
runs the YUV encode on 9 whole-image copies through HBM (~1.7 ms at 1080p
on v5e). Here each tile DMAs a 1-pixel-halo block of the 7 input planes
(filtered rgb + TAA history rgba) once, does the whole 3x3 clamp + mix +
sRGB on-chip, and writes 4 output planes.

Boundary handling: the wrapper edge-pads by 1 (the reference's imageLoad
coordinate clamp, Filter.cuh:73-74, is exactly edge clamping).

Matches render.svgf.taa bit-for-bit up to float reassociation (tested in
tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svgf_tpu.kernels.atrous_pallas import TILE_H, TILE_W
from svgf_tpu.render.svgf import _YUV_DEC as _DEC
from svgf_tpu.render.svgf import _YUV_ENC as _ENC


def _encode(rgb):
    # explicit x*x — a float-exponent jnp.power lowers to a transcendental
    # pow in Mosaic (27 of them per pixel dominated the kernel)
    r2 = []
    for c in rgb:
        cm = jnp.maximum(c, 0.0)
        r2.append(cm * cm)
    return [m[0] * r2[0] + m[1] * r2[1] + m[2] * r2[2] for m in _ENC]


def _taa_kernel(inp_hbm, out_hbm, scratch, out_vmem, sem, osem, *, th, tw, eh, ew):
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        inp_hbm.at[:, pl.ds(i * th, eh), pl.ds(j * tw, ew)], scratch, sem
    )
    copy.start()
    copy.wait()

    def rgb01(dy, dx):
        return [
            jnp.clip(scratch[k, 1 + dy : 1 + dy + th, 1 + dx : 1 + dx + tw], 0.0, 1.0)
            for k in range(3)
        ]

    in0 = rgb01(0, 0)
    last = [
        jnp.clip(scratch[k, 1 : 1 + th, 1 : 1 + tw], 0.0, 1.0) for k in (3, 4, 5, 6)
    ]

    mix_rate = jnp.minimum(last[3], 0.5)
    aa = []
    for c in range(3):
        a2 = last[c] * last[c]
        aa.append(jnp.sqrt(jnp.maximum(a2 + (in0[c] * in0[c] - a2) * mix_rate, 1e-12)))

    aa_yuv = _encode(aa)
    c_yuv = _encode(in0)

    # 3x3 neighborhood min/max in YUV: first 5 = center + plus-neighbors,
    # last 4 = diagonals (Filter.cuh:310-338)
    plus = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    diag = [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    min_c = list(c_yuv)
    max_c = list(c_yuv)
    for dy, dx in plus:
        p = _encode(rgb01(dy, dx))
        for k in range(3):
            min_c[k] = jnp.minimum(min_c[k], p[k])
            max_c[k] = jnp.maximum(max_c[k], p[k])
    dmin = [jnp.full((th, tw), jnp.inf, jnp.float32)] * 3
    dmax = [jnp.full((th, tw), -jnp.inf, jnp.float32)] * 3
    for dy, dx in diag:
        p = _encode(rgb01(dy, dx))
        for k in range(3):
            dmin[k] = jnp.minimum(dmin[k], p[k])
            dmax[k] = jnp.maximum(dmax[k], p[k])
    for k in range(3):
        min_c[k] = 0.5 * min_c[k] + 0.5 * jnp.minimum(dmin[k], min_c[k])
        max_c[k] = 0.5 * max_c[k] + 0.5 * jnp.maximum(dmax[k], max_c[k])

    clamped = [jnp.clip(aa_yuv[k], min_c[k], max_c[k]) for k in range(3)]
    rgb = [
        jnp.sqrt(jnp.maximum(m[0] * clamped[0] + m[1] * clamped[1] + m[2] * clamped[2],
                             1e-12))
        for m in _DEC
    ]
    ok = jnp.isfinite(rgb[0]) & jnp.isfinite(rgb[1]) & jnp.isfinite(rgb[2])
    for c in range(3):
        v = jnp.where(ok, rgb[c], 0.0)
        v = jnp.maximum(v, 0.0)
        safe = jnp.maximum(v, 0.0031308)
        srgb = jnp.where(
            v <= 0.0031308, 12.92 * v, 1.055 * jnp.power(safe, 1.0 / 2.4) - 0.055
        )
        out_vmem[c] = jnp.clip(srgb, 0.0, 1.0)
    out_vmem[3] = jnp.ones((th, tw), jnp.float32)

    wr = pltpu.make_async_copy(
        out_vmem, out_hbm.at[:, pl.ds(i * th, th), pl.ds(j * tw, tw)], osem
    )
    wr.start()
    wr.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def taa_pallas(filtered, history, interpret: bool = False):
    """Drop-in Pallas replacement for svgf.taa.

    filtered: (H, W, 4) wavelet output; history: (H, W, 4) previous TAA
    output. Returns (H, W, 4) sRGB + alpha=1.
    """
    h, w = filtered.shape[:2]
    th, tw = TILE_H, TILE_W
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    planes = jnp.stack(
        [
            filtered[..., 0].astype(jnp.float32),
            filtered[..., 1].astype(jnp.float32),
            filtered[..., 2].astype(jnp.float32),
            history[..., 0].astype(jnp.float32),
            history[..., 1].astype(jnp.float32),
            history[..., 2].astype(jnp.float32),
            history[..., 3].astype(jnp.float32),
        ],
        axis=0,
    )
    # edge pad = the reference's imageLoad coordinate clamp; then round the
    # far edges up to the DMA tile grid
    planes = jnp.pad(planes, ((0, 0), (1, 1), (1, 1)), mode="edge")
    eh = -(-(th + 2) // 8) * 8
    ew = -(-(tw + 2) // 128) * 128
    planes = jnp.pad(
        planes, ((0, 0), (0, (eh - th - 2) + hp - h), (0, (ew - tw - 2) + wp - w))
    )

    grid = (hp // th, wp // tw)
    out = pl.pallas_call(
        functools.partial(_taa_kernel, th=th, tw=tw, eh=eh, ew=ew),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((7, eh, ew), jnp.float32),
            pltpu.VMEM((4, th, tw), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(planes)
    return jnp.moveaxis(out[:, :h, :w], 0, -1)
