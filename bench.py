"""Benchmark: 1080p SVGF denoise (full filter chain) ms/frame on one chip.

Baseline: the reference claims ~6 ms/frame for the filter stages on an
unspecified NVIDIA GPU (reference README.md:7; BASELINE.md). vs_baseline is
baseline_ms / our_ms (>1 = faster than the reference claim).

What is measured: `svgf_tpu.render.pipeline.filter_chain` — the EXACT code
path render_frame runs (temporal -> moments -> 5x a-trous -> TAA, Pallas
kernels dispatched per config.use_pallas="auto") — on a steady-state orbit
frame: a smooth depth/normal G-buffer with depth edges, a smooth
orbit-camera motion field (|mx| <= 40 px, |my| <= 6 px), previous-frame
state matching the current G-buffer (reprojection mostly valid), history at
the cap except a ~3% disoccluded band (history 1-3, exercising the moments
fallback). First-frame / warm-up behavior is reported separately by
scripts/profile_stages.py.

Timing methodology: on this platform `block_until_ready` returns before the
remote device finishes, so every measurement runs K iterations inside one
jit (lax.fori_loop) and fetches a scalar from the result — the fetch is the
only reliable completion barrier. The measured fetch round trip is
subtracted.

Prints exactly ONE JSON line on stdout; progress goes to stderr.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fetch(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def timed(fn, x, iters_inside, reps=10, fetch_overhead=0.0):
    """min of `reps` timings (median via timed_dist). r3's temporal+moments
    number swung 2.6 -> 5.0 ms with no code change at reps=3; >=10 reps with
    the min statistic is required to separate drift from regression."""
    return timed_dist(fn, x, iters_inside, reps, fetch_overhead)[0]


def timed_dist(fn, x, iters_inside, reps=10, fetch_overhead=0.0):
    samples = []
    o = fn(x)
    _fetch(o)  # warm/compile
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(x)
        _fetch(o)
        samples.append(time.perf_counter() - t0)
    samples.sort()
    med = samples[len(samples) // 2]
    best = samples[0]
    return (
        max(best - fetch_overhead, 1e-9) / iters_inside,
        max(med - fetch_overhead, 1e-9) / iters_inside,
    )


def make_bench_inputs(h, w):
    """Steady-state orbit frame: smooth geometry + depth edges + smooth
    motion + warmed-up temporal state."""
    import jax.numpy as jnp

    from svgf_tpu.render.types import GBuffer, TemporalState

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u, v = xx / w, yy / h

    # smooth depth with a few object edges (instance changes + depth jumps).
    # Instance bands run HORIZONTAL: the mostly-horizontal orbit motion then
    # crosses an instance/depth edge only near the few band boundaries, so
    # the realized temporal-rejection rate stays at the documented ~3-6%
    # (diagonal bands made reprojection cross an edge almost everywhere,
    # silently inflating the moments-fallback share far past the documented
    # disocclusion contract — r5 fix).
    depth = 2.0 + 1.5 * np.sin(3 * u * np.pi) * np.cos(2 * v * np.pi) + v
    instance = (np.floor(6 * v) % 4).astype(np.int32)
    depth = depth + 0.7 * instance
    depth_deriv = np.abs(np.gradient(depth, axis=1)) + 1e-4

    theta = 0.7 * u + 0.2 * v
    nrm = np.stack(
        [np.sin(theta), np.cos(theta), 0.5 + 0.3 * np.sin(5 * v)], axis=-1
    )
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)

    # orbit-camera motion: mostly-horizontal pan with parallax by depth
    mx = np.trunc(28.0 / depth * (0.8 + 0.4 * u))
    my = np.trunc(4.0 * (v - 0.5))
    motion = np.stack([mx, my], axis=-1).astype(np.float32)

    gbuf = GBuffer.zeros(h, w)._replace(
        depth=jnp.asarray(depth, jnp.float32),
        depth_deriv=jnp.asarray(depth_deriv, jnp.float32),
        normal=jnp.asarray(nrm, jnp.float32),
        instance=jnp.asarray(instance),
        motion=jnp.asarray(motion),
    )

    # history at cap except a disoccluded band (the screen edge revealed by
    # the pan + a moving-object band), ~3% of pixels
    hist = np.full((h, w), 24, np.int32)
    band = slice(int(0.55 * w), int(0.58 * w))
    hist[:, band] = rng.integers(1, 4, (h, hist[:, band].shape[1]))
    radiance = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)

    state = TemporalState.initial(h, w, jnp.float32)._replace(
        color=jnp.asarray(rng.uniform(0, 1, (h, w, 4)), jnp.float32),
        moments=jnp.asarray(rng.uniform(0, 0.5, (h, w, 2)), jnp.float32),
        history_len=jnp.asarray(hist),
        taa_history=jnp.asarray(rng.uniform(0, 1, (h, w, 4)), jnp.float32),
        gbuffer=gbuf,  # previous == current geometry: reprojection validates
    )
    # attach the planar cross-frame state (what production frames carry on
    # the TPU fast path — kernels.planar; packed once here, outside timing)
    # at the production default state dtype (fp16, like the reference's
    # fp16 buffers App.cu:763-773 — RenderConfig.state_dtype)
    from svgf_tpu.kernels import planar as PL
    from svgf_tpu.render.types import PlanarState

    lo = PL.make_layout(h, w)
    state = state._replace(
        planar=PlanarState(
            prev=PL.pack_prev_from_state(
                state.color, gbuf, state.moments, state.history_len, lo,
                dtype=jnp.float16,
            ),
            taa=PL.pack_taa_from_state(state.taa_history, lo,
                                       dtype=jnp.float16),
        )
    )
    return jnp.asarray(radiance), gbuf, state


def main():
    import jax
    import jax.numpy as jnp

    from svgf_tpu.config import RenderConfig, SVGFConfig
    from svgf_tpu.render.pipeline import filter_chain

    # persistent compile cache: the 1080p render_frame compile is ~3 min on
    # the tunneled TPU backend; repeat runs (and the driver's run) are warm
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache_tpu")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    w, h = 1920, 1080
    log(f"devices: {jax.devices()}")

    config = RenderConfig(
        width=w, height=h,
        svgf=SVGFConfig(spatial_filter_steps=5),
    )

    # measured fetch round trip (empty computation)
    ident = jax.jit(lambda x: x + 0.0)
    xsmall = jnp.ones((8, 128), jnp.float32)
    fetch_overhead = timed(ident, xsmall, 1, reps=5)
    log(f"fetch overhead: {fetch_overhead*1e3:.1f} ms")

    radiance, gbuf, state = make_bench_inputs(h, w)

    from svgf_tpu.kernels import resolve_pallas

    log(f"use_pallas=auto -> {resolve_pallas(config.use_pallas)}")

    def chain(cur):
        _, _, _, final, _ = filter_chain(cur, gbuf, state, config)
        return final[..., :3]

    # K in-jit iterations: the fetch completion barrier varies 25-50 ms on
    # this tunneled backend, so at K=5 it contributed +-1 ms to the per-
    # frame estimate; K=20 dilutes the barrier to <0.1 ms/frame (r5).
    K = 20
    many = jax.jit(lambda x: jax.lax.fori_loop(0, K, lambda i, v: chain(v), x))
    filter_ms, filter_ms_med = [
        v * 1e3
        for v in timed_dist(many, radiance, K, reps=12,
                            fetch_overhead=fetch_overhead)
    ]
    log(f"filter chain: {filter_ms:.3f} ms/frame min, {filter_ms_med:.3f} med "
        f"(K={K} in-jit iters, 12 reps)")

    # per-stage breakdown (recorded in the BENCH JSON so stage-level
    # regressions are visible to the driver — VERDICT r4 item 9)
    stage_ms = {}

    def stage(key, name, fn):
        lp = jax.jit(lambda x: jax.lax.fori_loop(0, K, lambda i, v: fn(v), x))
        try:
            ms = timed(lp, radiance, K, reps=10, fetch_overhead=fetch_overhead) * 1e3
            log(f"  {name:24s} {ms:7.3f} ms")
            stage_ms[key] = round(ms, 3)
        except Exception as e:  # pragma: no cover
            log(f"  {name:24s} FAILED {type(e).__name__}")

    cfg0 = dataclasses.replace(config, svgf=SVGFConfig(spatial_filter_steps=0,
                                                       enable_taa=False))
    stage("temporal_moments_ms", "temporal+moments",
          lambda v: filter_chain(v, gbuf, state, cfg0)[3][..., :3])
    cfg3 = dataclasses.replace(config, svgf=SVGFConfig(spatial_filter_steps=5,
                                                       enable_taa=False))
    stage("temporal_moments_atrous5_ms", "+ 5x a-trous",
          lambda v: filter_chain(v, gbuf, state, cfg3)[3][..., :3])

    # ---- trace stage: 1080p 1spp 3-bounce MIS (reference conditions,
    # src/Tracing.h:28-38) on the Cornell box; Mrays/s/chip (BASELINE.md) ----
    trace_stats = {}
    try:
        trace_stats = bench_trace(w, h, fetch_overhead)
    except Exception as e:  # pragma: no cover
        log(f"trace bench FAILED: {type(e).__name__}: {e}")

    # ---- large-scene clustered intersector (104k-tri terrain): coherent
    # primary + scrambled bounce rays + f64 agreement (VERDICT r4 item 4) ----
    large = {}
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        import bench_large
        large = bench_large.run(n=230)
    except Exception as e:  # pragma: no cover
        log(f"large-scene bench FAILED: {type(e).__name__}: {e}")

    # ---- sharding evidence (virtual 8-device CPU mesh, subprocess so the
    # TPU-backend process stays clean) ----
    sharding = {}
    try:
        import subprocess
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)   # skip TPU-tunnel registration
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "scripts", "bench_sharding.py")],
            capture_output=True, text=True, timeout=1500, env=env,
        )
        if r.returncode == 0 and r.stdout.strip():
            sharding = json.loads(r.stdout.strip().splitlines()[-1])
        else:
            log(f"sharding bench rc={r.returncode}: {r.stderr[-400:]}")
    except Exception as e:  # pragma: no cover
        log(f"sharding bench FAILED: {type(e).__name__}: {e}")

    baseline_ms = 6.0
    print(json.dumps({
        "metric": "svgf_denoise_1080p",
        "value": round(filter_ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(baseline_ms / filter_ms, 2),
        "value_median": round(filter_ms_med, 3),
        "reps": 12,
        "stages": stage_ms,
        **trace_stats,
        "large_scene": large,
        "sharding": sharding,
    }))


def _state_scalar(state):
    """A scalar leaf to fetch as the completion barrier (planar states
    have no legacy color field)."""
    return state.color if state.color is not None else state.planar.prev


def bench_trace(w, h, fetch_overhead):
    """Time render_frame (all six stages) and the trace stage alone at 1080p
    on the Cornell box; report ms/frame and Mrays/s/chip.

    Mrays/s uses the MEASURED ray count (FrameMetrics.rays_traced: active
    lanes of every intersect invocation accumulated inside the trace —
    VERDICT r3 item 10), not a per-pixel formula, so lane compaction and
    masked-trace skips cannot inflate it.
    """
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from svgf_tpu.config import RenderConfig, SVGFConfig, TracingConfig
    from svgf_tpu.render.pipeline import render_frame
    from svgf_tpu.render.types import TemporalState
    from svgf_tpu.scenes.cornell import cornell_box

    config = RenderConfig(
        width=w, height=h,
        tracing=TracingConfig(batch=1, bounces=3, clamp=10.0),
        svgf=SVGFConfig(spatial_filter_steps=5),
        trace_chunks=48,  # r5 sweep optimum (scripts/profile_trace.py;
                          # small wavefronts win since the single-
                          # batched-intersect bounce rework)
        state_dtype="float16",
        keep_taps=False,   # perf path: don't keep every stage live (config.py)
    )
    scene = cornell_box()
    scene.cameras[0].aspect = w / h
    arrays = scene.flatten()

    from svgf_tpu.kernels import resolve_pallas

    init = (
        TemporalState.initial_planar
        if resolve_pallas(config.use_pallas)[0] and config.planar_chain
        else TemporalState.initial
    )
    state0 = init(h, w, jnp.dtype(config.state_dtype))

    def frame(st):
        out, new = render_frame(arrays, st, config)
        return new, out.metrics.rays_traced

    step = jax.jit(frame, donate_argnums=(0,))
    log("compiling 1080p render_frame (cornell)...")
    t_c0 = time.perf_counter()
    state, nrays = step(state0)
    _fetch(_state_scalar(state))
    compile_s = time.perf_counter() - t_c0
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache_tpu")
    cache_warm = os.path.isdir(cache_dir) and bool(os.listdir(cache_dir))
    log(f"render_frame compile+first-run: {compile_s:.1f}s "
        f"(persistent cache {'present' if cache_warm else 'cold'})")
    total_rays = int(nrays)   # measured (steady for a static camera)
    best = 1e9
    for _ in range(7):
        t0 = time.perf_counter()
        state, nrays = step(state)
        _fetch(_state_scalar(state))
        best = min(best, time.perf_counter() - t0)
    frame_ms = (best - fetch_overhead) * 1e3

    # trace+gbuffer alone: filter stages off
    cfg_t = dc.replace(
        config, svgf=SVGFConfig(spatial_filter_steps=0, enable_taa=False)
    )

    def trace_only(st):
        out, new = render_frame(arrays, st, cfg_t)
        return new, out.metrics.rays_traced

    step_t = jax.jit(trace_only, donate_argnums=(0,))
    log("compiling trace-only step...")
    state_t, nrays_t = step_t(init(h, w, jnp.dtype(config.state_dtype)))
    _fetch(_state_scalar(state_t))
    total_rays = int(nrays_t)
    best_t = 1e9
    for _ in range(7):
        t0 = time.perf_counter()
        state_t, nrays_t = step_t(state_t)
        _fetch(_state_scalar(state_t))
        best_t = min(best_t, time.perf_counter() - t0)
    trace_ms = (best_t - fetch_overhead) * 1e3

    mrays = total_rays / (trace_ms * 1e-3) / 1e6
    log(f"1080p frame (6 stages, cornell): {frame_ms:.2f} ms/frame")
    log(f"1080p trace+gbuffer: {trace_ms:.2f} ms  "
        f"({total_rays/1e6:.1f} Mrays measured -> {mrays:.1f} Mrays/s/chip)")
    return {
        "compile_s_render_frame_1080p": round(compile_s, 1),
        "compile_cache_present": cache_warm,
        "frame_ms_1080p_cornell": round(frame_ms, 2),
        "trace_ms_1080p_cornell": round(trace_ms, 2),
        "mrays_per_s_per_chip": round(mrays, 1),
        "rays_per_frame_measured": total_rays,
        "rays_accounting": "measured",
    }


if __name__ == "__main__":
    main()
