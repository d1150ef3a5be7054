"""Reprojection motion-bound policy (VERDICT r4 weak item 4).

The Pallas temporal kernels bound per-frame motion to
config.reproject_max_motion = (|dy|, |dx|) pixels; larger motion is treated
as a DISOCCLUSION (history reset to 1, alpha=1 — the reference's own
behavior for any failed reprojection test, Filter.cuh:378-387), never as
corruption. The planar kernel supports raising the bound to (32, 127) via
config; the XLA fallback reprojects unbounded.

These tests pin the policy: (a) out-of-bound motion degrades exactly to the
disocclusion path bit-for-bit, (b) raising the bound recovers the XLA
result, (c) the bound ceilings are enforced.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svgf_tpu.config import RenderConfig, SVGFConfig
from svgf_tpu.render.pipeline import filter_chain
from test_planar import H, W, make_config, make_frame_inputs  # noqa: E402 (pytest adds tests/ to sys.path)


def run_chain(radiance, gbuf, state, config):
    f = jax.jit(lambda v: filter_chain(v, gbuf, state, config))
    return f(radiance)


def with_motion(gbuf, mx, my):
    m = np.zeros((H, W, 2), np.float32)
    m[..., 0] = mx
    m[..., 1] = my
    return gbuf._replace(motion=jnp.asarray(m))


def test_out_of_bound_vertical_pan_degrades_to_disocclusion():
    """A fast vertical pan (|my| > bound) on the Pallas path: every pixel is
    treated as disoccluded — history 1, temporal colour = clipped radiance —
    with no corruption (the XLA fallback would reproject it)."""
    radiance, gbuf, state = make_frame_inputs(seed=1, max_motion=(0, 0))
    gbuf = with_motion(gbuf, 0.0, 12.0)   # > default bound of 8 rows
    cfg = make_config(use_pallas="interpret", planar_chain=True)
    tres, *_ = run_chain(radiance, gbuf, state, cfg)

    hist = np.asarray(tres.history_len)
    assert (hist == 1).all(), "out-of-bound motion must reset history"
    np.testing.assert_allclose(
        np.asarray(tres.color[..., :3]),
        np.clip(np.asarray(radiance), 0.0, 1.0),
        atol=1e-6,
    )
    assert np.isfinite(np.asarray(tres.color)).all()


def test_raised_bound_recovers_reprojection():
    """The same pan with reproject_max_motion raised to (16, 127) matches
    the XLA unbounded gather exactly."""
    radiance, gbuf, state = make_frame_inputs(seed=2, max_motion=(0, 0))
    gbuf = with_motion(gbuf, -90.0, 12.0)  # beyond the r4 bound (8, 63)
    cfg_p = make_config(use_pallas="interpret", planar_chain=True)
    cfg_p = dataclasses.replace(cfg_p, reproject_max_motion=(16, 127))
    cfg_x = make_config(use_pallas="off")

    tres_p, *_ = run_chain(radiance, gbuf, state, cfg_p)
    tres_x, *_ = run_chain(radiance, gbuf, state, cfg_x)
    np.testing.assert_allclose(
        np.asarray(tres_p.color), np.asarray(tres_x.color), atol=3e-5
    )
    np.testing.assert_array_equal(
        np.asarray(tres_p.history_len), np.asarray(tres_x.history_len)
    )


def test_bench_motion_within_default_bound():
    """The benchmark's orbit motion field sits inside the default bound —
    the headline number measures real reprojection, not mass disocclusion."""
    import bench

    _, gbuf, _ = bench.make_bench_inputs(128, 256)
    m = np.asarray(gbuf.motion)
    by, bx = RenderConfig().reproject_max_motion
    assert np.abs(m[..., 1]).max() <= by
    assert np.abs(m[..., 0]).max() <= bx


def test_bound_ceilings_enforced():
    from svgf_tpu.kernels import planar as PL

    radiance, gbuf, state = make_frame_inputs(seed=3, max_motion=(0, 0))
    cfg = make_config(use_pallas="interpret", planar_chain=True)
    cfg = dataclasses.replace(cfg, reproject_max_motion=(64, 200))
    with pytest.raises(AssertionError):
        run_chain(radiance, gbuf, state, cfg)
    assert PL.BOUND_Y_MAX == 32 and PL.BOUND_X_MAX == 127
