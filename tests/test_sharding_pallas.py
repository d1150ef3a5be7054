"""End-to-end coverage of the PRODUCTION Pallas sharded path (VERDICT r4
missing item 3): the row-mesh sharded frame with use_pallas="interpret"
exercises the Pallas temporal band kernel + _row_halo_planes ppermute halo
exchange + the Pallas moments/a-trous/TAA band kernels — the exact code that
runs on a real TPU mesh (where resolve_pallas("auto") turns Pallas ON) —
and asserts parity with the unsharded interpret-mode frame.

Runs on the virtual 8-device CPU mesh (conftest.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svgf_tpu import RenderConfig, SVGFConfig, TracingConfig
from svgf_tpu.parallel import make_row_mesh, make_sharded_step
from svgf_tpu.render.pipeline import render_frame
from svgf_tpu.render.types import TemporalState
from svgf_tpu.scenes import cornell_box

W, H = 64, 64
NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= NDEV
    return make_row_mesh(NDEV)


@pytest.fixture(scope="module")
def scene_arrays():
    scene = cornell_box(aspect=W / H)
    for c in scene.cameras:
        c.aspect = W / H
    return scene.flatten()


def make_config():
    return RenderConfig(
        width=W, height=H, state_dtype="float32",
        use_pallas="interpret",              # production kernels, CPU interpreter
        planar_chain=False,   # compare the per-stage kernels (the band path's
                              # twins) — the planar chain has its own parity
                              # suite (tests/test_planar.py)
        svgf=SVGFConfig(spatial_filter_steps=3),
        tracing=TracingConfig(bounces=2),
    )


def test_sharded_pallas_frame_matches_unsharded(mesh, scene_arrays):
    """Two frames (second exercises reprojection with live history) through
    BOTH the sharded Pallas band path and the unsharded Pallas path."""
    cfg = make_config()

    # unsharded reference (same Pallas kernels, whole-frame layout)
    state_u = TemporalState.initial(H, W, jnp.float32)
    step_u = jax.jit(lambda s: render_frame(scene_arrays, s, cfg))
    out_u1, state_u = step_u(state_u)
    out_u2, state_u = step_u(state_u)

    # sharded production path (band kernels + ppermute halos)
    step_s = make_sharded_step(cfg, mesh)
    state_s = TemporalState.initial(H, W, jnp.float32)
    out_s1, state_s = step_s(scene_arrays, state_s)
    out_s2, state_s = step_s(scene_arrays, state_s)

    # trace is bitwise-reproducible (global-lane RNG); temporal/moments/
    # a-trous agree to float-reassociation tolerance; TAA's YUV clamp is
    # fusion-sensitive on boundary pixels (see test_sharding.py)
    np.testing.assert_allclose(
        np.asarray(out_s1.radiance), np.asarray(out_u1.radiance), atol=1e-6
    )
    for tap in ("temporal", "moments_filtered", "atrous"):
        a = np.asarray(getattr(out_s2, tap))
        b = np.asarray(getattr(out_u2, tap))
        np.testing.assert_allclose(a, b, atol=3e-5, err_msg=tap)
    d = np.abs(np.asarray(out_s2.final) - np.asarray(out_u2.final))
    assert d.mean() < 1e-4
    assert (d > 5e-3).mean() == 0.0

    # carried state agrees too (next frame's temporal inputs)
    np.testing.assert_allclose(
        np.asarray(state_s.color), np.asarray(state_u.color), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_s.moments), np.asarray(state_u.moments), atol=3e-5
    )
    assert (np.asarray(state_s.history_len)
            == np.asarray(state_u.history_len)).all()
