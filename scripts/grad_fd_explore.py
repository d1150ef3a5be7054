"""Explore FD-vs-analytic camera-gradient agreement with edge masking.
JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/grad_fd_explore.py
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from svgf_tpu.config import RenderConfig, SVGFConfig, TracingConfig
from svgf_tpu.render.gbuffer import raster_gbuffer
from svgf_tpu.render.pipeline import render_frame
from svgf_tpu.render.types import TemporalState
from svgf_tpu.scenes.cornell import cornell_box

w, h = 40, 32
config = RenderConfig(
    width=w, height=h, state_dtype="float32", use_pallas="off",
    tracing=TracingConfig(bounces=1),
    svgf=SVGFConfig(spatial_filter_steps=1),
)
scene = cornell_box()
scene.cameras[0].aspect = w / h
arrays = scene.flatten()

# interior mask: away from instance-id / depth edges at the base camera
g0 = raster_gbuffer(arrays, 0, h, w)
inst = np.asarray(g0.instance)
depth = np.asarray(g0.depth)
edge = np.zeros((h, w), bool)
edge[:, 1:] |= inst[:, 1:] != inst[:, :-1]
edge[:, :-1] |= inst[:, 1:] != inst[:, :-1]
edge[1:, :] |= inst[1:, :] != inst[:-1, :]
edge[:-1, :] |= inst[1:, :] != inst[:-1, :]
edge[:, 1:] |= np.abs(depth[:, 1:] - depth[:, :-1]) > 0.1
edge[1:, :] |= np.abs(depth[1:, :] - depth[:-1, :]) > 0.1
for _ in range(2):   # dilate
    e2 = edge.copy()
    e2[1:, :] |= edge[:-1, :]; e2[:-1, :] |= edge[1:, :]
    e2[:, 1:] |= edge[:, :-1]; e2[:, :-1] |= edge[:, 1:]
    edge = e2
mask = jnp.asarray(~edge, jnp.float32)[..., None]
print("interior pixels:", int(mask.sum()), "/", h * w)

target = jnp.zeros((h, w, 3), jnp.float32)


def loss_depth(cam_frame):
    sc = dataclasses.replace(arrays, cam_frame=cam_frame)
    g = raster_gbuffer(sc, 0, h, w)
    return jnp.sum(mask[..., 0] * (g.depth - 2.0) ** 2) / jnp.sum(mask)


def loss_final(cam_frame):
    sc = dataclasses.replace(arrays, cam_frame=cam_frame)
    state = TemporalState.initial(h, w, jnp.float32)
    out, _ = render_frame(sc, state, config)
    return jnp.sum(mask * (out.final - target) ** 2) / jnp.sum(mask)


for name, loss in [("depth", loss_depth), ("final", loss_final)]:
    gfun = jax.jit(jax.grad(loss))
    jl = jax.jit(loss)
    g = np.asarray(gfun(arrays.cam_frame))
    f = np.asarray(arrays.cam_frame)
    for comp in (0, 2):
        for eps in (3e-3, 1e-3):
            fp = f.copy(); fp[0, comp, 3] += eps
            fm = f.copy(); fm[0, comp, 3] -= eps
            fd = (float(jl(jnp.asarray(fp))) - float(jl(jnp.asarray(fm)))) / (2 * eps)
            an = float(g[0, comp, 3])
            rel = abs(fd - an) / max(abs(fd), abs(an), 1e-9)
            print(f"{name} comp={comp} eps={eps:g}: fd={fd:+.5g} an={an:+.5g} rel={rel:.3f}")
