"""Isolate the moments-fallback kernel cost: time filter_moments_pallas at
1080p with (a) history all >= 4 (every tile short-circuits: pure bandwidth),
(b) history all < 4 (every tile runs the 49-tap fallback), (c) the bench.py
disocclusion pattern. Gives per-tile fallback cost = ((b) - (a)) / n_tiles.
"""

import os
import sys
import time

import numpy as np

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
    from svgf_tpu.kernels import filter_moments_pallas, temporal_filter_pallas
    from svgf_tpu.kernels.temporal_pallas import pack_prev_planes
    from svgf_tpu.config import SVGFConfig

    w, h = 1920, 1080
    sv = SVGFConfig()
    print(f"devices: {jax.devices()}", flush=True)

    ident = jax.jit(lambda x: x + 0.0)
    fetch = timed(ident, jnp.ones((8, 128), jnp.float32), 1, reps=6)
    print(f"fetch overhead {fetch*1e3:.1f} ms", flush=True)

    radiance, gbuf, state = make_bench_inputs(h, w)
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 1, (h, w, 4)), jnp.float32)
    mom = jnp.asarray(rng.uniform(0, 0.5, (h, w, 2)), jnp.float32)

    K = 10

    def t(name, hist):
        hist = jnp.asarray(hist, jnp.int32)
        fn = lambda v: filter_moments_pallas(
            v, mom, gbuf, hist, phi_colour=sv.phi_colour,
            phi_normal=sv.phi_normal)
        lp = jax.jit(lambda v: jax.lax.fori_loop(0, K, lambda i, u: fn(u), v))
        ms = timed(lp, color, K, reps=10, fetch_overhead=fetch) * 1e3
        print(f"  {name:30s} {ms:7.3f} ms", flush=True)
        return ms

    a = t("all history=24 (pass-through)", np.full((h, w), 24))
    b = t("all history=1 (all fallback)", np.full((h, w), 1))
    hist_bench = np.full((h, w), 24)
    hist_bench[:, int(0.55 * w):int(0.58 * w)] = 1
    hist_bench[:, -64:] = 1  # right-edge disocclusion band (pan)
    c = t("bench-like bands", hist_bench)
    n_tiles = (-(-h // 128)) * (-(-w // 256))
    print(f"tiles={n_tiles}; per-tile fallback cost ~ {(b-a)/n_tiles*1e3:.1f} us",
          flush=True)


if __name__ == "__main__":
    main()
