"""Probe: moments_planar floor with ZERO fallback pixels vs bench input.

Separates the per-pass cost (DMA + pass-through writes) from the gated
49-tap fallback work, to decide where the remaining temporal+moments
milliseconds live.
"""

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
    from svgf_tpu.kernels import planar as PL

    w, h = 1920, 1080
    print(f"devices: {jax.devices()}", flush=True)
    sv = SVGFConfig()
    ident = jax.jit(lambda x: x + 0.0)
    fetch = timed(ident, jnp.ones((8, 128), jnp.float32), 1, reps=6)
    print(f"fetch overhead {fetch*1e3:.1f} ms", flush=True)

    radiance, gbuf, state = make_bench_inputs(h, w)
    lo = PL.make_layout(h, w)
    cur = jax.jit(lambda r: PL.pack_current(r, gbuf, lo))(radiance)
    prev = state.planar.prev
    tout = jax.jit(
        lambda c: PL.temporal_planar(c, prev, lo, sv.depth_threshold,
                                     sv.normal_threshold, sv.history_length)
    )(cur)
    # variant with history forced to cap: no fallback cell triggers
    tout_cap = tout.at[PL.T_HIST].set(
        jnp.full((lo.hpad, lo.wpad), 24.0, jnp.float32))
    # variant with history < 4 EVERYWHERE: every cell triggers
    tout_all = tout.at[PL.T_HIST].set(
        jnp.full((lo.hpad, lo.wpad), 1.0, jnp.float32))

    K = 10

    def tp(name, fn, x0):
        def body(i, s):
            y = fn(x0, s)
            return jnp.sum(y).astype(jnp.float32) * 1e-20
        lp = jax.jit(lambda s: jax.lax.fori_loop(0, K, body, s))
        ms = timed(lp, jnp.float32(0), K, reps=10, fetch_overhead=fetch) * 1e3
        print(f"  {name:32s} {ms:7.3f} ms", flush=True)

    def jig(x, s):
        return x.at[(0,) * x.ndim].add(s)

    tp("moments (bench input)", lambda x, s: PL.moments_planar(
        jig(x, s), cur, lo, sv.phi_colour, sv.phi_normal), tout)
    tp("moments (no fallback)", lambda x, s: PL.moments_planar(
        jig(x, s), cur, lo, sv.phi_colour, sv.phi_normal), tout_cap)
    tp("moments (all fallback)", lambda x, s: PL.moments_planar(
        jig(x, s), cur, lo, sv.phi_colour, sv.phi_normal), tout_all)
    tp("temporal kernel", lambda x, s: PL.temporal_planar(
        jig(x, s), prev, lo, sv.depth_threshold, sv.normal_threshold,
        sv.history_length), cur)


if __name__ == "__main__":
    main()
