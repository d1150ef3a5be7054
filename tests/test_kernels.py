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
