"""Benchmark: 1080p SVGF denoise (full filter chain) ms/frame on one chip.

Baseline: the reference claims ~6 ms/frame for the filter stages on an
unspecified NVIDIA GPU (reference README.md:7; BASELINE.md). vs_baseline is
baseline_ms / our_ms (>1 = faster than the reference claim).

Timing methodology: on this platform `block_until_ready` returns before the
remote device finishes, so every measurement runs K iterations inside one
jit (lax.fori_loop) and fetches a scalar from the result — the fetch is the
only reliable completion barrier. The measured fetch round trip is
subtracted.

Prints exactly ONE JSON line on stdout; progress goes to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fetch(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def timed(fn, x, iters_inside, reps=3, fetch_overhead=0.0):
    best = 1e9
    o = fn(x)
    _fetch(o)  # warm/compile
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(x)
        _fetch(o)
        best = min(best, time.perf_counter() - t0)
    return max(best - fetch_overhead, 1e-9) / iters_inside


def main():
    import jax
    import jax.numpy as jnp

    from svgf_tpu.render import svgf
    from svgf_tpu.render.types import GBuffer

    w, h = 1920, 1080
    steps = 5
    log(f"devices: {jax.devices()}")

    # measured fetch round trip (empty computation)
    ident = jax.jit(lambda x: x + 0.0)
    xsmall = jnp.ones((8, 128), jnp.float32)
    fetch_overhead = timed(ident, xsmall, 1, reps=5)
    log(f"fetch overhead: {fetch_overhead*1e3:.1f} ms")

    rng = np.random.default_rng(0)
    n = rng.standard_normal((h, w, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    gbuf = GBuffer.zeros(h, w)._replace(
        depth=jnp.asarray(rng.uniform(1.0, 5.0, (h, w)), jnp.float32),
        depth_deriv=jnp.asarray(rng.uniform(1e-4, 1e-2, (h, w)), jnp.float32),
        normal=jnp.asarray(n, jnp.float32),
        instance=jnp.zeros((h, w), jnp.int32),
        motion=jnp.asarray(rng.uniform(-2, 2, (h, w, 2)), jnp.float32),
    )
    img = jnp.asarray(rng.uniform(0, 1, (h, w, 4)), jnp.float32)
    prev_moments = jnp.asarray(rng.uniform(0, 0.5, (h, w, 2)), jnp.float32)
    prev_hist = jnp.asarray(rng.integers(1, 24, (h, w)), jnp.int32)

    try:
        from svgf_tpu.kernels import atrous_iteration_pallas as atrous

        def atrous_fn(x, s):
            return atrous(x, gbuf, s, 10.0, 128.0)

        # make sure the Pallas kernel actually compiles on this backend
        _fetch(atrous_fn(img, 1))
        log("using Pallas a-trous kernel")
    except Exception as e:  # pragma: no cover
        log(f"Pallas a-trous unavailable ({type(e).__name__}); XLA fallback")

        def atrous_fn(x, s):
            return svgf.atrous_iteration(x, gbuf, s, 10.0, 128.0)

    def chain(cur):
        t = svgf.temporal_filter(
            cur[..., :3], cur, gbuf, gbuf, prev_moments, prev_hist, 0.8, 0.9, 24
        )
        m = svgf.filter_moments(t.color, t.moments, gbuf, t.history_len, 10.0, 128.0)
        x = m
        for i in range(steps):
            x = atrous_fn(x, 1 << i)
        return svgf.taa(x, x)

    K = 5
    many = jax.jit(lambda x: jax.lax.fori_loop(0, K, lambda i, v: chain(v), x))
    filter_ms = timed(many, img, K, reps=3, fetch_overhead=fetch_overhead) * 1e3
    log(f"filter chain: {filter_ms:.3f} ms/frame (K={K} in-jit iters)")

    baseline_ms = 6.0
    print(json.dumps({
        "metric": "svgf_denoise_1080p",
        "value": round(filter_ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(baseline_ms / filter_ms, 2),
    }))


if __name__ == "__main__":
    main()
