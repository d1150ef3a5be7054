"""Planar fast path (kernels.planar) == XLA reference chain.

The planar chain is the production single-chip filter path on TPU; these
tests run its real kernels through the Pallas interpreter on CPU and assert
parity with pipeline.filter_chain's pure-XLA route (use_pallas="off"),
stage by stage and end-to-end across frames (planar cross-frame state vs
legacy image-layout state).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from svgf_tpu.config import RenderConfig, SVGFConfig, TracingConfig
from svgf_tpu.render.pipeline import filter_chain, render_frame
from svgf_tpu.render.types import GBuffer, TemporalState
from svgf_tpu.scenes import cornell_box

H, W = 96, 160


def make_config(**kw):
    return RenderConfig(
        width=W, height=H, state_dtype="float32",
        svgf=kw.pop("svgf", SVGFConfig(spatial_filter_steps=3)),
        tracing=kw.pop("tracing", TracingConfig(bounces=2)),
        **kw,
    )


def make_frame_inputs(seed=0, with_background=False, max_motion=(6, 40)):
    """Radiance + G-buffer + a warmed-up TemporalState with motion inside
    the planar reprojection bound (the XLA fallback gathers unbounded)."""
    rng = np.random.default_rng(seed)
    n = rng.standard_normal((H, W, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    depth = rng.uniform(1, 5, (H, W)).astype(np.float32)
    inst = rng.integers(0, 3, (H, W)).astype(np.int32)
    if with_background:
        mask = rng.uniform(size=(H, W)) < 0.2
        depth = np.where(mask, 0.0, depth)
        n = np.where(mask[..., None], 0.0, n)
        inst = np.where(mask, -1, inst)
    my, mx = max_motion
    motion = np.stack(
        [
            np.trunc(rng.uniform(-mx, mx, (H, W))),
            np.trunc(rng.uniform(-my, my, (H, W))),
        ],
        axis=-1,
    ).astype(np.float32)
    gbuf = GBuffer.zeros(H, W)._replace(
        depth=jnp.asarray(depth),
        depth_deriv=jnp.asarray(rng.uniform(1e-4, 1e-2, (H, W)), jnp.float32),
        normal=jnp.asarray(n, jnp.float32),
        instance=jnp.asarray(inst),
        motion=jnp.asarray(motion),
    )
    radiance = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    # previous state: partially matching geometry so some pixels reproject
    hist = rng.integers(1, 24, (H, W)).astype(np.int32)
    state = TemporalState.initial(H, W, jnp.float32)._replace(
        color=jnp.asarray(rng.uniform(0, 1, (H, W, 4)), jnp.float32),
        moments=jnp.asarray(rng.uniform(0, 0.5, (H, W, 2)), jnp.float32),
        history_len=jnp.asarray(hist),
        taa_history=jnp.asarray(rng.uniform(0, 1, (H, W, 4)), jnp.float32),
        gbuffer=gbuf,  # same geometry: depth/normal/mesh tests pass in-place
    )
    return radiance, gbuf, state


def chain_outputs(radiance, gbuf, state, config):
    f = jax.jit(lambda v: filter_chain(v, gbuf, state, config))
    tres, moments_out, atrous_out, final, feedback = f(radiance)
    return {
        "temporal": tres.color, "t_moments": tres.moments,
        "t_hist": tres.history_len, "t_valid": tres.reprojected,
        "moments": moments_out, "atrous": atrous_out,
        "final": final, "feedback": feedback,
    }


def assert_stage_parity(a, b):
    for k in a:
        x, y = np.asarray(a[k]), np.asarray(b[k])
        if x.dtype == bool:
            np.testing.assert_array_equal(x, y, err_msg=k)
        elif k in ("temporal", "t_moments", "t_hist"):
            np.testing.assert_allclose(x, y, atol=3e-5, err_msg=k)
        else:
            # downstream of the variance-guided weights (phi_l ~ 1/sqrt(
            # 1e-10+var)) a reassociation-level input diff amplifies on
            # isolated near-zero-variance pixels; TAA's YUV clamp boundary
            # is additionally fusion-sensitive
            d = np.abs(x - y)
            assert d.mean() < 1e-4, (k, d.mean())
            assert (d > 2e-2).mean() == 0.0, (k, d.max())


def test_planar_chain_matches_xla():
    radiance, gbuf, state = make_frame_inputs()
    cfg_p = make_config(use_pallas="interpret", planar_chain=True)
    cfg_x = make_config(use_pallas="off")
    assert_stage_parity(
        chain_outputs(radiance, gbuf, state, cfg_p),
        chain_outputs(radiance, gbuf, state, cfg_x),
    )


def test_planar_chain_background_and_edges():
    radiance, gbuf, state = make_frame_inputs(seed=5, with_background=True)
    cfg_p = make_config(use_pallas="interpret", planar_chain=True)
    cfg_x = make_config(use_pallas="off")
    assert_stage_parity(
        chain_outputs(radiance, gbuf, state, cfg_p),
        chain_outputs(radiance, gbuf, state, cfg_x),
    )


def test_planar_chain_no_atrous_no_taa():
    radiance, gbuf, state = make_frame_inputs(seed=2)
    sv = SVGFConfig(spatial_filter_steps=0, enable_taa=False)
    cfg_p = make_config(use_pallas="interpret", planar_chain=True, svgf=sv)
    cfg_x = make_config(use_pallas="off", svgf=sv)
    a = chain_outputs(radiance, gbuf, state, cfg_p)
    b = chain_outputs(radiance, gbuf, state, cfg_x)
    for k in ("temporal", "moments", "final", "feedback"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), atol=3e-5, err_msg=k
        )


def test_planar_render_frame_two_frames_matches_xla():
    """End-to-end: the planar cross-frame state (assemble_prev + planar TAA
    history) carries exactly what the legacy state carries."""
    scene = cornell_box(aspect=W / H)
    scene.cameras[0].aspect = W / H
    arrays = scene.flatten()

    cfg_p = make_config(use_pallas="interpret", planar_chain=True,
                        use_pallas_intersect="off")
    cfg_x = make_config(use_pallas="off")

    def run(cfg, state0):
        step = jax.jit(lambda s: render_frame(arrays, s, cfg))
        out1, st = step(state0)
        # planar output state has a different pytree structure -> new jit
        step2 = jax.jit(lambda s: render_frame(arrays, s, cfg))
        out2, st = step2(st)
        return out1, out2, st

    _, out2p, stp = run(cfg_p, TemporalState.initial_planar(H, W, jnp.float32))
    _, out2x, stx = run(cfg_x, TemporalState.initial(H, W, jnp.float32))

    np.testing.assert_allclose(
        np.asarray(out2p.radiance), np.asarray(out2x.radiance), atol=1e-6
    )
    # frame-2 taps: reassociation diffs in frame-1's carried state compound
    # through the EMA + variance-guided weights on isolated pixels
    for tap in ("temporal", "moments_filtered", "atrous"):
        d = np.abs(
            np.asarray(getattr(out2p, tap)) - np.asarray(getattr(out2x, tap))
        )
        assert d.mean() < 1e-4, (tap, d.mean())
        assert (d > 2e-2).mean() == 0.0, (tap, d.max())
    d = np.abs(np.asarray(out2p.final) - np.asarray(out2x.final))
    assert d.mean() < 1e-4 and (d > 5e-3).mean() == 0.0
    # metrics agree (planar metrics are computed from planes)
    for f in ("disoccluded_pct", "mean_history", "mean_variance"):
        np.testing.assert_allclose(
            float(getattr(out2p.metrics, f)), float(getattr(out2x.metrics, f)),
            atol=1e-3, err_msg=f,
        )


def test_planar_packed_fp16_state_matches_xla():
    """Production state dtype (fp16): the planar path carries the
    PAIR-PACKED prev form (6 f32 planes of fp16 pairs); the XLA path stores
    its legacy fields at fp16. Both quantize the carried state identically,
    so frame-2 results agree to reassociation tolerance — this pins the
    in-kernel fp16 bit-unpack (kernels.planar._f16_bits_to_f32) exactly."""
    scene = cornell_box(aspect=W / H)
    scene.cameras[0].aspect = W / H
    arrays = scene.flatten()

    cfg_p = make_config(use_pallas="interpret", planar_chain=True,
                        use_pallas_intersect="off")
    cfg_p = dataclasses.replace(cfg_p, state_dtype="float16")
    cfg_x = dataclasses.replace(make_config(use_pallas="off"),
                                state_dtype="float16")

    def run(cfg, state0):
        step = jax.jit(lambda s: render_frame(arrays, s, cfg))
        out1, st = step(state0)
        step2 = jax.jit(lambda s: render_frame(arrays, s, cfg))
        out2, st = step2(st)
        return out2

    out2p = run(cfg_p, TemporalState.initial_planar(H, W, jnp.float16))
    out2x = run(cfg_x, TemporalState.initial(H, W, jnp.float16))

    from svgf_tpu.kernels.planar import N_PREV_PACKED  # packed form in use
    st0 = TemporalState.initial_planar(H, W, jnp.float16)
    assert st0.planar.prev.shape[0] == N_PREV_PACKED

    for tap in ("temporal", "moments_filtered", "atrous"):
        d = np.abs(
            np.asarray(getattr(out2p, tap)) - np.asarray(getattr(out2x, tap))
        )
        assert d.mean() < 2e-4, (tap, d.mean())
        assert (d > 2e-2).mean() == 0.0, (tap, d.max())
    d = np.abs(np.asarray(out2p.final) - np.asarray(out2x.final))
    assert d.mean() < 2e-4 and (d > 2e-2).mean() == 0.0


def test_planar_checkpoint_roundtrip(tmp_path):
    """Planar state -> mode-agnostic checkpoint -> legacy state resume."""
    from svgf_tpu.io import load_checkpoint, save_checkpoint

    scene = cornell_box(aspect=W / H)
    scene.cameras[0].aspect = W / H
    arrays = scene.flatten()
    cfg_p = make_config(use_pallas="interpret", planar_chain=True,
                        use_pallas_intersect="off")
    step = jax.jit(lambda s: render_frame(arrays, s, cfg_p))
    _, st = step(TemporalState.initial_planar(H, W, jnp.float32))
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, st, height=H, width=W)
    lst = load_checkpoint(p)
    assert lst.color.shape == (H, W, 4)
    assert int(lst.frame_idx) == 1
    # resumed legacy state re-enters the planar path (pack_prev_from_state)
    out, _ = jax.jit(lambda s: render_frame(arrays, s, cfg_p))(lst)
    assert np.isfinite(np.asarray(out.final)).all()
