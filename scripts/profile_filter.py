"""Micro-profile of the Pallas filter chain at 1080p: splits each stage into
kernel vs packing/layout cost so the <6 ms optimization work targets the
right line (VERDICT r3 item 3). Uses bench.py's steady-state inputs and
timing methodology (K in-jit iterations, fetch barrier, min of reps)."""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(__file__.rsplit("/", 2)[0], ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_bench_inputs, timed  # noqa: E402


def log(*a):
    print(*a, flush=True)


def main():
    from svgf_tpu.config import RenderConfig, SVGFConfig
    from svgf_tpu.kernels import (
        atrous_chain_pallas,
        filter_moments_pallas,
        pack_prev_planes,
        taa_pallas,
        temporal_filter_pallas,
    )
    from svgf_tpu.render.pipeline import filter_chain

    w, h = 1920, 1080
    log(f"devices: {jax.devices()}")
    config = RenderConfig(width=w, height=h,
                          svgf=SVGFConfig(spatial_filter_steps=5))
    sv = config.svgf

    ident = jax.jit(lambda x: x + 0.0)
    fetch = timed(ident, jnp.ones((8, 128), jnp.float32), 1, reps=5)
    log(f"fetch overhead {fetch*1e3:.1f} ms")

    radiance, gbuf, state = make_bench_inputs(h, w)
    packed = jax.jit(pack_prev_planes)(
        state.color.astype(jnp.float32), state.gbuffer,
        state.moments.astype(jnp.float32), state.history_len,
    )
    K = 5

    def t(name, fn, x):
        lp = jax.jit(lambda v: jax.lax.fori_loop(0, K, lambda i, u: fn(u), v))
        ms = timed(lp, x, K, reps=10, fetch_overhead=fetch) * 1e3
        log(f"  {name:34s} {ms:7.3f} ms")
        return ms

    log("== temporal ==")
    t("pack_prev_planes", lambda v: v + pack_prev_planes(
        v, state.gbuffer, state.moments.astype(jnp.float32),
        state.history_len)[0][..., None] * 0.0,
      state.color.astype(jnp.float32))
    tres = None

    def temporal_full(v):
        r = temporal_filter_pallas(
            v, packed, gbuf,
            depth_threshold=sv.depth_threshold,
            normal_threshold=sv.normal_threshold,
            history_base_length=sv.history_length,
        )
        return r.color[..., :3]
    t("temporal kernel (pre-packed)", temporal_full, radiance)

    tres = jax.jit(lambda v: temporal_filter_pallas(
        v, packed, gbuf, depth_threshold=sv.depth_threshold,
        normal_threshold=sv.normal_threshold,
        history_base_length=sv.history_length))(radiance)

    log("== moments ==")
    t("moments kernel", lambda v: filter_moments_pallas(
        v, tres.moments, gbuf, tres.history_len,
        phi_colour=sv.phi_colour, phi_normal=sv.phi_normal), tres.color)

    mom = jax.jit(lambda v: filter_moments_pallas(
        v, tres.moments, gbuf, tres.history_len,
        phi_colour=sv.phi_colour, phi_normal=sv.phi_normal))(tres.color)

    log("== a-trous ==")
    for steps in (1, 2, 5):
        t(f"atrous chain steps={steps}", lambda v, s=steps: atrous_chain_pallas(
            v, gbuf, steps=s, phi_colour=sv.phi_colour,
            phi_normal=sv.phi_normal)[0], mom)

    log("== taa ==")
    t("taa kernel", lambda v: taa_pallas(
        v, state.taa_history.astype(jnp.float32)), mom)

    log("== whole chain (pipeline.filter_chain) ==")
    t("filter_chain", lambda v: filter_chain(v, gbuf, state, config)[3][..., :3],
      radiance)


if __name__ == "__main__":
    main()
