"""Quick TPU timing of the planar filter chain (bench.py methodology)."""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(__file__.rsplit("/", 2)[0], ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_bench_inputs, timed  # noqa: E402


def main():
    from svgf_tpu.config import RenderConfig, SVGFConfig
    from svgf_tpu.render.pipeline import filter_chain
    import dataclasses

    w, h = 1920, 1080
    print(f"devices: {jax.devices()}", flush=True)
    config = RenderConfig(width=w, height=h,
                          svgf=SVGFConfig(spatial_filter_steps=5))

    ident = jax.jit(lambda x: x + 0.0)
    fetch = timed(ident, jnp.ones((8, 128), jnp.float32), 1, reps=6)
    print(f"fetch overhead {fetch*1e3:.1f} ms", flush=True)

    radiance, gbuf, state = make_bench_inputs(h, w)
    K = 10

    def t(name, cfg):
        fn = lambda v: filter_chain(v, gbuf, state, cfg)[3][..., :3]
        lp = jax.jit(lambda v: jax.lax.fori_loop(0, K, lambda i, u: fn(u), v))
        ms = timed(lp, radiance, K, reps=10, fetch_overhead=fetch) * 1e3
        print(f"  {name:28s} {ms:7.3f} ms", flush=True)

    t("planar full chain", config)
    t("planar temporal+moments", dataclasses.replace(
        config, svgf=SVGFConfig(spatial_filter_steps=0, enable_taa=False)))
    t("planar t+m+1 atrous", dataclasses.replace(
        config, svgf=SVGFConfig(spatial_filter_steps=1, enable_taa=False)))
    t("planar t+m+5 atrous", dataclasses.replace(
        config, svgf=SVGFConfig(spatial_filter_steps=5, enable_taa=False)))

    # ---- piece-level: each planar component in isolation ----
    from svgf_tpu.kernels import planar as PL

    lo = PL.make_layout(h, w)
    sv = config.svgf
    cur = jax.jit(lambda r: PL.pack_current(r, gbuf, lo))(radiance)
    prev, taa_h = state.planar.prev, state.planar.taa
    tout = jax.jit(lambda c: PL.temporal_planar(
        c, prev, lo, sv.depth_threshold, sv.normal_threshold,
        sv.history_length))(cur)
    m4 = jax.jit(lambda t_: PL.moments_planar(
        t_, cur, lo, sv.phi_colour, sv.phi_normal))(tout)

    def tp(name, fn, x0):
        """fn: (x0, scalar) -> array; scalar-chained K-iteration loop (the
        scalar perturbation defeats CSE; its x0.at[] add costs ~0.1 ms at
        these sizes — subtract mentally for the smallest pieces). The
        result is reduced with a FULL sum so XLA cannot slice-DCE pure
        stack/concat producers (the r5 assemble_prev "0.000 ms" artifact)."""
        def body(i, s):
            y = fn(x0, s)
            return jnp.sum(y).astype(jnp.float32) * 1e-20
        lp = jax.jit(lambda s: jax.lax.fori_loop(0, K, body, s))
        ms = timed(lp, jnp.float32(0), K, reps=10, fetch_overhead=fetch) * 1e3
        print(f"  {name:28s} {ms:7.3f} ms", flush=True)

    def jig(x, s):  # tiny scalar-dependent perturbation (one full copy)
        return x.at[(0,) * x.ndim].add(s)

    tp("pack_current", lambda x, s: PL.pack_current(jig(x, s), gbuf, lo),
       radiance)
    tp("temporal_planar kernel", lambda x, s: PL.temporal_planar(
        jig(x, s), prev, lo, sv.depth_threshold, sv.normal_threshold,
        sv.history_length), cur)
    tp("moments_planar kernel", lambda x, s: PL.moments_planar(
        jig(x, s), cur, lo, sv.phi_colour, sv.phi_normal), tout)
    tp("atrous x1 planar", lambda x, s: PL.atrous_chain_planar_v2(
        jig(x, s), cur, lo, 1, sv.phi_colour, sv.phi_normal)[0], m4)
    tp("atrous x1 noshift", lambda x, s: PL.atrous_chain_planar_v2(
        jig(x, s), cur, lo, 1, sv.phi_colour, sv.phi_normal,
        shift_mode="never")[0], m4)
    tp("atrous x5 planar", lambda x, s: PL.atrous_chain_planar_v2(
        jig(x, s), cur, lo, 5, sv.phi_colour, sv.phi_normal)[0], m4)
    tp("atrous x5 noshift", lambda x, s: PL.atrous_chain_planar_v2(
        jig(x, s), cur, lo, 5, sv.phi_colour, sv.phi_normal,
        shift_mode="never")[0], m4)
    tp("taa planar", lambda x, s: PL.taa_planar(jig(x, s), taa_h, lo), m4)
    tp("assemble_prev", lambda x, s: PL.assemble_prev(
        cur, jig(x, s), x[0:3], jnp.float32), tout)

    t("legacy per-stage chain", dataclasses.replace(config, planar_chain=False))


if __name__ == "__main__":
    main()
