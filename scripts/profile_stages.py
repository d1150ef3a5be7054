"""Per-stage filter-chain profiling on the real chip.

Times each SVGF stage in isolation (K iterations inside one jit, fetch as the
completion barrier — same methodology as bench.py) so the hotspot is always
visible. Mirrors the reference's per-frame timer prints (App.cu:697-731).

Usage: python scripts/profile_stages.py [height width]
"""

import sys
import time

import numpy as np


def _fetch(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def timed(fn, x, iters_inside, reps=3, fetch_overhead=0.0):
    best = 1e9
    _fetch(fn(x))
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(fn(x))
        best = min(best, time.perf_counter() - t0)
    return max(best - fetch_overhead, 1e-9) / iters_inside


def main():
    import jax
    import jax.numpy as jnp

    from svgf_tpu.render import svgf
    from svgf_tpu.render.types import GBuffer

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    print(f"devices: {jax.devices()}  frame: {w}x{h}")

    ident = jax.jit(lambda x: x + 0.0)
    fetch_overhead = timed(ident, jnp.ones((8, 128), jnp.float32), 1, reps=5)
    print(f"fetch overhead: {fetch_overhead*1e3:.2f} ms")

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

    K = 10

    def loop(fn):
        return jax.jit(lambda x: jax.lax.fori_loop(0, K, lambda i, v: fn(v), x))

    def report(name, fn):
        try:
            ms = timed(loop(fn), img, K, fetch_overhead=fetch_overhead) * 1e3
            print(f"{name:34s} {ms:8.3f} ms")
            return ms
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__}: {e}")
            return float("nan")

    # --- individual stages ---
    def temporal(c4):
        return svgf.temporal_filter(
            c4[..., :3], c4, gbuf, gbuf, prev_moments, prev_hist, 0.8, 0.9, 24
        ).color

    # gather in isolation (the suspected hotspot inside temporal)
    motion = gbuf.motion
    r = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    py = jnp.clip(r + motion[..., 1].astype(jnp.int32), 0, h - 1)
    px = jnp.clip(c + motion[..., 0].astype(jnp.int32), 0, w - 1)

    def gather12(c4):
        packed = jnp.concatenate(
            [c4, c4, c4], axis=-1
        )  # 12 channels, same payload as temporal's packed gather
        flat = packed.reshape(h * w, 12)
        out = flat[py * w + px]
        return out[..., :4]

    def moments_xla(c4):
        return svgf.filter_moments(c4, prev_moments, gbuf, prev_hist, 10.0, 128.0)

    def atrous_xla_1(c4):
        return svgf.atrous_iteration(c4, gbuf, 1, 10.0, 128.0)

    def taa_xla(c4):
        return svgf.taa(c4, c4)

    report("temporal (XLA, packed gather)", temporal)
    report("  gather alone (12ch f32)", gather12)
    report("moments 7x7 (XLA)", moments_xla)
    report("atrous step=1 (XLA)", atrous_xla_1)
    report("taa (XLA)", taa_xla)

    from svgf_tpu.kernels import (
        atrous_iteration_pallas,
        pack_prev_planes,
        taa_pallas,
        temporal_filter_pallas,
    )
    from svgf_tpu.kernels.moments_pallas import filter_moments_pallas

    packed_prev = pack_prev_planes(img, gbuf, prev_moments, prev_hist)

    def temporal_pl(c4):
        return temporal_filter_pallas(
            c4[..., :3], packed_prev, gbuf,
            depth_threshold=0.8, normal_threshold=0.9, history_base_length=24,
        ).color

    report("temporal (Pallas)", temporal_pl)
    report("  pack_prev_planes alone",
           lambda c4: pack_prev_planes(c4, gbuf, prev_moments, prev_hist)[0])
    report("taa (Pallas)", lambda c4: taa_pallas(c4, c4))

    def moments_pl(c4):
        return filter_moments_pallas(c4, prev_moments, gbuf, prev_hist, 10.0, 128.0)

    report("moments 7x7 (Pallas)", moments_pl)
    for s in (1, 16):
        report(
            f"atrous step={s} (Pallas)",
            lambda c4, s=s: atrous_iteration_pallas(c4, gbuf, s, 10.0, 128.0),
        )

    def atrous_chain5(c4):
        x = c4
        for i in range(5):
            x = atrous_iteration_pallas(x, gbuf, 1 << i, 10.0, 128.0)
        return x

    report("atrous chain x5 (Pallas)", atrous_chain5)


if __name__ == "__main__":
    main()
