"""Multi-frame orbit gradients (BASELINE config #5; SURVEY §7.2 step 8).

Differentiates a final-frame loss through an UNROLLED 4-frame orbit —
temporal state (EMA recurrence, history clamps, iteration-0 feedback)
threaded across frames, camera moving every frame — w.r.t. material colour,
material emission, and a camera translation applied to every pose. This is
exactly the regime where the EMA recurrence x radiance clamps x masked
reprojection would produce NaNs or exploding gradients if any backward rule
were unguarded (VERDICT r4 missing item 2).

FD checks follow tests/test_camera_grad.py: pathwise gradients exclude
visibility-boundary terms (hit selection is stop-grad, SURVEY §7.1), so the
camera FD comparison masks silhouette/disocclusion pixels; material grads
are smooth everywhere and need no mask.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from svgf_tpu.config import RenderConfig, SVGFConfig, TracingConfig
from svgf_tpu.core.camera import look_at_frame
from svgf_tpu.render.pipeline import render_frame
from svgf_tpu.render.types import TemporalState
from svgf_tpu.scenes.cornell import cornell_box

W, H = 40, 32
N_FRAMES = 4


def _orbit_poses():
    """Small horizontal orbit around the box (a few px/frame of motion)."""
    poses = []
    for k in range(N_FRAMES):
        a = 0.03 * k
        eye = [3.4 * np.sin(a), 0.0, 3.4 * np.cos(a)]
        poses.append(np.asarray(look_at_frame(eye=eye, target=[0, 0, 0]),
                                np.float32))
    return poses


def _setup():
    config = RenderConfig(
        width=W, height=H, state_dtype="float32", use_pallas="off",
        tracing=TracingConfig(bounces=2),
        svgf=SVGFConfig(spatial_filter_steps=1),
    )
    scene = cornell_box()
    scene.cameras[0].aspect = W / H
    return config, scene.flatten(), _orbit_poses()


def _run(arrays, config, poses, mat_colour, mat_emission, cam_delta):
    """Unrolled orbit: frame k renders pose k with prev pose k-1; the
    temporal state (colour/moments/history/TAA) carries across frames."""
    state = TemporalState.initial(config.height, config.width, jnp.float32)
    out = None
    for k in range(N_FRAMES):
        fk = jnp.asarray(poses[k]).at[:3, 3].add(cam_delta)
        pk = jnp.asarray(poses[max(k - 1, 0)]).at[:3, 3].add(cam_delta)
        sc = dataclasses.replace(
            arrays,
            mat_colour=mat_colour,
            mat_emission=mat_emission,
            cam_frame=arrays.cam_frame.at[0].set(fk),
            cam_prev_frame=arrays.cam_prev_frame.at[0].set(pk),
        )
        out, state = render_frame(sc, state, config)
    return out


def test_orbit_gradients_finite_and_nonzero():
    config, arrays, poses = _setup()

    def loss(mat_colour, mat_emission, cam_delta):
        out = _run(arrays, config, poses, mat_colour, mat_emission, cam_delta)
        return jnp.mean(out.final ** 2)

    g_col, g_emi, g_cam = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        arrays.mat_colour, arrays.mat_emission, jnp.zeros((3,), jnp.float32)
    )
    for name, g in (("mat_colour", g_col), ("mat_emission", g_emi),
                    ("camera", g_cam)):
        g = np.asarray(g)
        assert np.isfinite(g).all(), f"non-finite {name} gradient over orbit"
        assert np.abs(g).max() > 0, f"{name} gradient identically zero"
    # every surface material the camera sees should carry colour gradient
    assert (np.abs(np.asarray(g_col)).max(axis=1)[:3] > 0).all()


def test_orbit_material_gradient_finite_difference():
    """Central-difference check of d(loss)/d(mat_colour) through the full
    4-frame unroll (materials are smooth — no edge mask needed)."""
    config, arrays, poses = _setup()

    def loss(mat_colour):
        out = _run(arrays, config, poses, mat_colour, arrays.mat_emission,
                   jnp.zeros((3,), jnp.float32))
        return jnp.mean(out.final ** 2)

    jloss = jax.jit(loss)
    g = np.asarray(jax.jit(jax.grad(loss))(arrays.mat_colour))
    assert np.isfinite(g).all()

    base = np.asarray(arrays.mat_colour)
    eps = 1e-3
    for midx, comp in ((0, 0), (1, 0)):  # white wall R, red wall R
        p = base.copy(); p[midx, comp] += eps
        m = base.copy(); m[midx, comp] -= eps
        fd = (float(jloss(jnp.asarray(p))) - float(jloss(jnp.asarray(m)))) / (
            2 * eps
        )
        an = float(g[midx, comp])
        denom = max(abs(fd), abs(an), 1e-7)
        assert abs(fd - an) / denom < 0.08, (
            f"orbit mat grad mismatch [{midx},{comp}]: fd={fd:.6g} an={an:.6g}"
        )


def test_orbit_emission_gradient_finite_difference():
    config, arrays, poses = _setup()

    def loss(mat_emission):
        out = _run(arrays, config, poses, arrays.mat_colour, mat_emission,
                   jnp.zeros((3,), jnp.float32))
        return jnp.mean(out.final ** 2)

    jloss = jax.jit(loss)
    g = np.asarray(jax.jit(jax.grad(loss))(arrays.mat_emission))
    assert np.isfinite(g).all()

    base = np.asarray(arrays.mat_emission)
    eps = 1e-2  # emission ~17; relative step
    midx, comp = 3, 0  # the area light's red emission
    p = base.copy(); p[midx, comp] += eps
    m = base.copy(); m[midx, comp] -= eps
    fd = (float(jloss(jnp.asarray(p))) - float(jloss(jnp.asarray(m)))) / (2 * eps)
    an = float(g[midx, comp])
    denom = max(abs(fd), abs(an), 1e-7)
    assert abs(fd - an) / denom < 0.08, (
        f"orbit emission grad mismatch: fd={fd:.6g} an={an:.6g}"
    )
