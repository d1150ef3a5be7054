"""Camera-pose gradients (north star: gradients w.r.t. materials, lights,
CAMERA). Ray generation (render/gbuffer.py:27) is smooth in cam_frame;
discrete hit ids are treated as constants (SURVEY §7.1). Finite-difference
check over a 2-frame orbit."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from svgf_tpu.config import RenderConfig, SVGFConfig, TracingConfig
from svgf_tpu.render.pipeline import render_frame
from svgf_tpu.render.types import TemporalState
from svgf_tpu.scenes.cornell import cornell_box


def _loss_fn(config, arrays, target):
    def loss(cam_frame):
        sc = dataclasses.replace(arrays, cam_frame=cam_frame)
        state = TemporalState.initial(config.height, config.width, jnp.float32)
        out1, state = render_frame(sc, state, config)       # frame 0
        out2, _ = render_frame(sc, state, config)           # frame 1 (temporal on)
        return jnp.mean((out2.final - target) ** 2)

    return loss


def test_camera_gradient_finite_difference():
    w, h = 40, 32
    config = RenderConfig(
        width=w, height=h, state_dtype="float32", use_pallas="off",
        tracing=TracingConfig(bounces=1),
        svgf=SVGFConfig(spatial_filter_steps=1),
    )
    scene = cornell_box()
    scene.cameras[0].aspect = w / h
    arrays = scene.flatten()
    target = jnp.zeros((h, w, 3), jnp.float32)

    loss = _loss_fn(config, arrays, target)
    g = jax.jit(jax.grad(loss))(arrays.cam_frame)
    g = np.asarray(g)
    assert np.isfinite(g).all(), "non-finite camera gradient"
    assert np.abs(g).max() > 0, "camera gradient is identically zero"

    # central finite differences on the camera position (translation column)
    f = np.asarray(arrays.cam_frame)
    jloss = jax.jit(loss)
    for comp in (0, 2):  # x and z translation
        eps = 3e-3
        fp = f.copy(); fp[0, comp, 3] += eps
        fm = f.copy(); fm[0, comp, 3] -= eps
        fd = (float(jloss(jnp.asarray(fp))) - float(jloss(jnp.asarray(fm)))) / (2 * eps)
        an = float(g[0, comp, 3])
        # path tracing is stochastic-but-deterministic (fixed seed): the FD
        # baseline shares the seed, so agreement should be tight relative to
        # the gradient scale
        assert np.isfinite(fd)
        denom = max(abs(fd), abs(an), 1e-6)
        assert abs(fd - an) / denom < 0.15, (
            f"cam grad mismatch comp {comp}: fd={fd:.6g} analytic={an:.6g}"
        )
