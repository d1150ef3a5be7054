"""Pallas kernels == pure-JAX reference implementations (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from svgf_tpu.kernels import atrous_iteration_pallas
from svgf_tpu.render import svgf
from svgf_tpu.render.types import GBuffer

H, W = 96, 160


def make_inputs(seed=0, with_background=False):
    rng = np.random.default_rng(seed)
    n = rng.standard_normal((H, W, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    depth = rng.uniform(1, 5, (H, W)).astype(np.float32)
    if with_background:
        mask = rng.uniform(size=(H, W)) < 0.2
        depth = np.where(mask, 0.0, depth)   # invalid/background pixels
        n = np.where(mask[..., None], 0.0, n)
    g = GBuffer.zeros(H, W)._replace(
        depth=jnp.asarray(depth),
        depth_deriv=jnp.asarray(rng.uniform(1e-4, 1e-2, (H, W)), jnp.float32),
        normal=jnp.asarray(n, jnp.float32),
        instance=jnp.zeros((H, W), jnp.int32),
    )
    img = jnp.asarray(rng.uniform(0, 1, (H, W, 4)), jnp.float32)
    return img, g


@pytest.mark.parametrize("step", [1, 2, 4, 8])
def test_atrous_pallas_matches_reference(step):
    img, g = make_inputs()
    ref = svgf.atrous_iteration(img, g, step, 10.0, 128.0)
    out = atrous_iteration_pallas(img, g, step, 10.0, 128.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_atrous_pallas_background_passthrough():
    img, g = make_inputs(seed=3, with_background=True)
    ref = svgf.atrous_iteration(img, g, 2, 10.0, 128.0)
    out = atrous_iteration_pallas(img, g, 2, 10.0, 128.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_atrous_pallas_nonsquare_phi():
    img, g = make_inputs(seed=5)
    # non-power-of-two phi_normal exercises the jnp.power fallback
    ref = svgf.atrous_iteration(img, g, 1, 7.5, 100.0)
    out = atrous_iteration_pallas(img, g, 1, 7.5, 100.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


# ---------------------------------------------------------------------------
# moments fallback kernel (Filter.cuh:430-525 twin)
# ---------------------------------------------------------------------------

from svgf_tpu.kernels import filter_moments_pallas  # noqa: E402


def make_moments_inputs(seed=0, with_background=False):
    rng = np.random.default_rng(seed)
    img, g = make_inputs(seed, with_background)
    moments = jnp.asarray(rng.uniform(0, 0.6, (H, W, 2)), jnp.float32)
    history = jnp.asarray(rng.integers(1, 10, (H, W)), jnp.int32)
    return img, moments, g, history


def test_moments_pallas_matches_reference():
    img, moments, g, history = make_moments_inputs()
    ref = svgf.filter_moments(img, moments, g, history, 10.0, 128.0)
    out = filter_moments_pallas(img, moments, g, history, 10.0, 128.0,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_moments_pallas_background_and_long_history():
    img, moments, g, history = make_moments_inputs(seed=7, with_background=True)
    # long-history pixels must pass through untouched (Filter.cuh:518-523)
    history = jnp.where(history > 5, 100, history)
    ref = svgf.filter_moments(img, moments, g, history, 10.0, 128.0)
    out = filter_moments_pallas(img, moments, g, history, 10.0, 128.0,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_moments_pallas_steady_state_skip():
    """All history >= 4: the tile-skip fast path must equal pass-through."""
    img, moments, g, _ = make_moments_inputs(seed=9)
    history = jnp.full((H, W), 24, jnp.int32)
    ref = svgf.filter_moments(img, moments, g, history, 10.0, 128.0)
    out = filter_moments_pallas(img, moments, g, history, 10.0, 128.0,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


# ---------------------------------------------------------------------------
# temporal reprojection kernel (Filter.cuh:359-404 twin, bounded motion)
# ---------------------------------------------------------------------------

from svgf_tpu.kernels import (  # noqa: E402
    pack_prev_planes,
    taa_pallas,
    temporal_filter_pallas,
)
from svgf_tpu.kernels.temporal_pallas import BOUND_Y  # noqa: E402


def make_temporal_inputs(seed=0):
    rng = np.random.default_rng(seed)
    img, g = make_inputs(seed)
    # in-bound motion (|my| <= 8, |mx| <= 63), integer-valued after trunc
    motion = np.trunc(
        rng.uniform(-1, 1, (H, W, 2)) * np.array([40.0, 7.0])
    ).astype(np.float32)
    g = g._replace(
        motion=jnp.asarray(motion),
        instance=jnp.asarray(rng.integers(0, 3, (H, W)), jnp.int32),
    )
    # previous frame: 70% of pixels share geometry with the current frame
    share = rng.uniform(size=(H, W)) < 0.7
    n_prev = np.where(
        share[..., None], np.asarray(g.normal),
        rng.standard_normal((H, W, 3)),
    )
    n_prev /= np.linalg.norm(n_prev, axis=-1, keepdims=True)
    prev_g = GBuffer.zeros(H, W)._replace(
        depth=jnp.asarray(
            np.where(share, np.asarray(g.depth), rng.uniform(1, 5, (H, W))),
            jnp.float32,
        ),
        normal=jnp.asarray(n_prev, jnp.float32),
        instance=jnp.asarray(
            np.where(share, np.asarray(g.instance), rng.integers(0, 3, (H, W))),
            jnp.int32,
        ),
    )
    prev_color = jnp.asarray(rng.uniform(0, 1, (H, W, 4)), jnp.float32)
    prev_moments = jnp.asarray(rng.uniform(0, 0.5, (H, W, 2)), jnp.float32)
    prev_hist = jnp.asarray(rng.integers(1, 24, (H, W)), jnp.int32)
    return img[..., :3], g, prev_g, prev_color, prev_moments, prev_hist


def _assert_temporal_equal(out, ref):
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.moments), np.asarray(ref.moments),
                               atol=2e-6)
    np.testing.assert_array_equal(np.asarray(out.history_len),
                                  np.asarray(ref.history_len))
    np.testing.assert_array_equal(np.asarray(out.reprojected),
                                  np.asarray(ref.reprojected))


def test_temporal_pallas_matches_reference():
    cur, g, prev_g, prev_color, prev_moments, prev_hist = make_temporal_inputs()
    ref = svgf.temporal_filter(cur, prev_color, g, prev_g, prev_moments,
                               prev_hist, 0.8, 0.9, 24)
    packed = pack_prev_planes(prev_color, prev_g, prev_moments, prev_hist)
    out = temporal_filter_pallas(cur, packed, g, 0.8, 0.9, 24, interpret=True)
    _assert_temporal_equal(out, ref)


def test_temporal_pallas_band_halo_layout():
    """band_halo=True with explicitly prepended halo rows == flat layout."""
    cur, g, prev_g, prev_color, prev_moments, prev_hist = make_temporal_inputs(3)
    packed = pack_prev_planes(prev_color, prev_g, prev_moments, prev_hist)
    flat = temporal_filter_pallas(cur, packed, g, 0.8, 0.9, 24, interpret=True)
    ext = jnp.pad(packed, ((0, 0), (BOUND_Y, BOUND_Y), (0, 0)))
    band = temporal_filter_pallas(cur, ext, g, 0.8, 0.9, 24, row0=0,
                                  h_total=H, band_halo=True, interpret=True)
    _assert_temporal_equal(band, flat)


def test_temporal_pallas_out_of_bound_motion_is_disocclusion():
    """Motion beyond (BOUND_Y, BOUND_X) must behave like a failed
    reprojection (the documented deviation from the unbounded XLA gather)."""
    cur, g, prev_g, prev_color, prev_moments, prev_hist = make_temporal_inputs(4)
    big = jnp.asarray(np.full((H, W, 2), 80.0, np.float32))
    g = g._replace(motion=big)
    packed = pack_prev_planes(prev_color, prev_g, prev_moments, prev_hist)
    out = temporal_filter_pallas(cur, packed, g, 0.8, 0.9, 24, interpret=True)
    assert not bool(np.asarray(out.reprojected).any())
    assert int(np.asarray(out.history_len).max()) == 1


# ---------------------------------------------------------------------------
# TAA kernel (Filter.cuh:288-357 twin)
# ---------------------------------------------------------------------------


def test_taa_pallas_matches_reference():
    rng = np.random.default_rng(11)
    filt = jnp.asarray(rng.uniform(0, 1, (H, W, 4)), jnp.float32)
    hist = jnp.asarray(rng.uniform(0, 1, (H, W, 4)), jnp.float32)
    ref = svgf.taa(filt, hist)
    out = taa_pallas(filt, hist, interpret=True)
    # tolerance: the YUV decode takes sqrt near zero, which amplifies float
    # reassociation differences (d/dx sqrt -> inf at 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


# ---------------------------------------------------------------------------
# dense intersection kernel
# ---------------------------------------------------------------------------


def test_intersect_pallas_matches_dense():
    import jax
    from svgf_tpu.kernels.intersect_pallas import intersect_dense_pallas
    from svgf_tpu.ops.intersect import intersect_dense
    from svgf_tpu.render.gbuffer import camera_rays
    from svgf_tpu.scenes.cornell import cornell_box

    scene = cornell_box()
    scene.cameras[0].aspect = 1.0
    arrays = scene.flatten()
    ro, rd = camera_rays(arrays.cam_frame[0], arrays.cam_proj[0], 48, 48)
    # add some oblique secondary-style rays
    key = jax.random.key(3)
    rd2 = jax.random.normal(key, rd.shape)
    rd2 = rd2 / jnp.linalg.norm(rd2, axis=-1, keepdims=True)
    for rdir in (rd, rd2):
        ref = intersect_dense(arrays, ro, rdir)
        out = intersect_dense_pallas(arrays, ro, rdir, interpret=True)
        # rays through shared triangle edges can flip the winning primitive
        # — or the hit verdict itself when u+v lands within 1 ulp of the
        # simplex edge — under different fp contraction (Mosaic vs XLA);
        # require exact agreement on all but a vanishing fraction of lanes
        hit = np.asarray(ref.dist) < 1e29
        hit_out = np.asarray(out.dist) < 1e29
        same_prim = (np.asarray(out.prim) == np.asarray(ref.prim)) & (
            np.asarray(out.instance) == np.asarray(ref.instance)
        )
        agree = (same_prim | ~hit) & (hit == hit_out)
        assert agree.mean() > 0.995, f"prim mismatch on {(~agree).mean():.2%}"
        np.testing.assert_allclose(
            np.asarray(out.dist)[agree], np.asarray(ref.dist)[agree],
            rtol=1e-5, atol=1e-5,
        )
        m = hit & agree
        np.testing.assert_array_equal(np.asarray(out.instance)[m],
                                      np.asarray(ref.instance)[m])
        np.testing.assert_allclose(np.asarray(out.u)[m], np.asarray(ref.u)[m],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.v)[m], np.asarray(ref.v)[m],
                                   atol=1e-5)
        # even on prim-disagreeing lanes the distance must be near-identical
        # (verdict-flip lanes are excluded: one side is the miss sentinel)
        both = hit & hit_out
        np.testing.assert_allclose(np.asarray(out.dist)[both],
                                   np.asarray(ref.dist)[both], atol=1e-3)


def test_intersect_pallas_only_instance_and_tmax():
    import jax
    from svgf_tpu.kernels.intersect_pallas import intersect_dense_pallas
    from svgf_tpu.ops.intersect import intersect_dense
    from svgf_tpu.render.gbuffer import camera_rays
    from svgf_tpu.scenes.cornell import cornell_box

    scene = cornell_box()
    scene.cameras[0].aspect = 1.0
    arrays = scene.flatten()
    ro, rd = camera_rays(arrays.cam_frame[0], arrays.cam_proj[0], 32, 32)
    ref = intersect_dense(arrays, ro, rd, only_instance=0)
    out = intersect_dense_pallas(arrays, ro, rd, only_instance=0, interpret=True)
    np.testing.assert_allclose(np.asarray(out.dist), np.asarray(ref.dist),
                               rtol=1e-5, atol=1e-5)
    ref_t = intersect_dense(arrays, ro, rd, tmax=2.5)
    out_t = intersect_dense_pallas(arrays, ro, rd, tmax=2.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out_t.dist), np.asarray(ref_t.dist),
                               rtol=1e-5, atol=1e-5)


def test_intersect_pallas_gradients_flow():
    """t/u/v must stay differentiable w.r.t. the ray origin (camera path)."""
    import jax
    from svgf_tpu.kernels.intersect_pallas import intersect_dense_pallas
    from svgf_tpu.render.gbuffer import camera_rays
    from svgf_tpu.scenes.cornell import cornell_box

    scene = cornell_box()
    scene.cameras[0].aspect = 1.0
    arrays = scene.flatten()
    ro, rd = camera_rays(arrays.cam_frame[0], arrays.cam_proj[0], 16, 16)

    def loss(o):
        h = intersect_dense_pallas(arrays, o, rd, interpret=True)
        return jnp.sum(jnp.where(h.dist < 1e29, h.dist, 0.0))

    g = np.asarray(jax.grad(loss)(ro))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
