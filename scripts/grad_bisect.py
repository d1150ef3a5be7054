"""Bisect where a non-finite camera gradient enters the pipeline.

Runs tiny-resolution grads of successively deeper pipeline prefixes w.r.t.
cam_frame and reports which stage first produces a non-finite gradient.
Usage: JAX_PLATFORMS=cpu python scripts/grad_bisect.py
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from svgf_tpu.config import RenderConfig, SVGFConfig, TracingConfig
from svgf_tpu.render.gbuffer import camera_rays, gbuffer_first_hit, raster_gbuffer
from svgf_tpu.render.pathtrace import pathtrace
from svgf_tpu.render.pipeline import render_frame
from svgf_tpu.render.types import TemporalState
from svgf_tpu.scenes.cornell import cornell_box

W, H = 24, 16
config = RenderConfig(
    width=W, height=H, state_dtype="float32", use_pallas="off",
    tracing=TracingConfig(bounces=1),
    svgf=SVGFConfig(spatial_filter_steps=1),
)
scene = cornell_box()
scene.cameras[0].aspect = W / H
arrays = scene.flatten()
cam = 0


def check(name, fn):
    g = jax.jit(jax.grad(fn))(arrays.cam_frame)
    g = np.asarray(g)
    finite = np.isfinite(g).all()
    print(f"{name:32s} finite={finite}  |g|max={np.abs(g[np.isfinite(g)]).max():.3g}"
          + ("" if finite else f"  n_nonfinite={np.size(g) - np.isfinite(g).sum()}"))
    return finite


def mk_scene(cf):
    return dataclasses.replace(arrays, cam_frame=cf)


def loss_gbuffer(cf):
    sc = mk_scene(cf)
    g = raster_gbuffer(sc, cam, H, W)
    return jnp.mean(g.position ** 2) + jnp.mean(g.normal ** 2) + jnp.mean(g.depth ** 2)


def loss_gbuffer_motion(cf):
    sc = mk_scene(cf)
    g = raster_gbuffer(sc, cam, H, W)
    return jnp.mean(g.motion ** 2)


def loss_trace(cf):
    sc = mk_scene(cf)
    key = jax.random.key(0)
    ro, rd = camera_rays(sc.cam_frame[cam], sc.cam_proj[cam], H, W)
    rad, _, _ = pathtrace(sc, ro, rd, key, bounces=1)
    return jnp.mean(rad ** 2)


def loss_trace_hybrid(cf):
    sc = mk_scene(cf)
    key = jax.random.key(0)
    g = raster_gbuffer(sc, cam, H, W)
    fh = gbuffer_first_hit(g)
    ro, rd = camera_rays(sc.cam_frame[cam], sc.cam_proj[cam], H, W)
    rad, _, _ = pathtrace(sc, ro, rd, key, bounces=1, first_hit=fh)
    return jnp.mean(rad ** 2)


def loss_frame1(cf):
    sc = mk_scene(cf)
    state = TemporalState.initial(H, W, jnp.float32)
    out, _ = render_frame(sc, state, config)
    return jnp.mean(out.final ** 2)


def loss_frame2(cf):
    sc = mk_scene(cf)
    state = TemporalState.initial(H, W, jnp.float32)
    out1, state = render_frame(sc, state, config)
    out2, _ = render_frame(sc, state, config)
    return jnp.mean(out2.final ** 2)


for name, fn in [
    ("gbuffer pos/normal/depth", loss_gbuffer),
    ("gbuffer motion", loss_gbuffer_motion),
    ("trace (no hybrid)", loss_trace),
    ("trace (hybrid primary)", loss_trace_hybrid),
    ("full frame 1", loss_frame1),
    ("full frame 2 (temporal)", loss_frame2),
]:
    check(name, fn)
