"""Sharding evidence for bench.py (VERDICT r3 item 6 / r2 item 8).

Runs on the VIRTUAL 8-device CPU mesh (the pre-hardware scaling harness —
BASELINE.md north star wants Mrays/s at 1 chip / 1 host / N hosts; this
produces the communication-structure evidence that harness is ready):

  * collective op counts + byte volumes from the compiled HLO of the row
    (8,) and tile (2x4 host x chip) frame steps,
  * wall ms per step on the virtual mesh (CPU — structure evidence, not a
    perf number),
  * analytic halo volume per a-trous step.

Prints ONE JSON object on stdout; bench.py embeds it under "sharding".
Run standalone: python scripts/bench_sharding.py [--full]
"""

import json
import os
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1}


def _shape_bytes(shape_str: str) -> int:
    """'f32[8,135,1920,4]' -> byte count (0 for tuples/unparsable)."""
    m = re.match(r"(\w+)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def hlo_collectives(hlo_text: str) -> dict:
    """Count collective ops and sum their output bytes from HLO text."""
    out: dict = {}
    pat = re.compile(
        r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*((?:\([^)]*\)|[\w\[\],]+(?:\{[0-9,*]*\})?))\s+"
        r"(all-gather|all-reduce|collective-permute|all-to-all|"
        r"reduce-scatter|all-gather-start|collective-permute-start)\(",
        re.M,
    )
    for m in pat.finditer(hlo_text):
        shape, op = m.groups()
        ent = out.setdefault(op, {"count": 0, "bytes": 0})
        ent["count"] += 1
        if shape.startswith("("):
            ent["bytes"] += sum(
                _shape_bytes(s) for s in re.findall(r"\w+\[[0-9,]*\]", shape)
            )
        else:
            ent["bytes"] += _shape_bytes(shape)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from svgf_tpu.config import RenderConfig, SVGFConfig, TracingConfig
    from svgf_tpu.parallel import make_row_mesh, make_tile_mesh
    from svgf_tpu.parallel.sharded import make_sharded_step
    from svgf_tpu.parallel.tiled import make_tiled_step
    from svgf_tpu.render.types import TemporalState
    from svgf_tpu.scenes import cornell_box

    full = "--full" in sys.argv
    # small-but-proportioned frame: CPU compile budget; the collective
    # STRUCTURE (which ops, which arrays) is resolution-independent
    w, h = (1920, 1080) if full else (512, 256)
    cfg = RenderConfig(
        width=w, height=h, state_dtype="float32",
        tracing=TracingConfig(bounces=2, batch=1),
        svgf=SVGFConfig(spatial_filter_steps=3),
        trace_chunks=1,
    )
    scene = cornell_box(aspect=w / h)
    for cam in scene.cameras:
        cam.aspect = w / h
    arrays = scene.flatten()

    result = {"mesh_devices": len(jax.devices()), "frame": [h, w]}

    for name, mesh, make in (
        ("row8", make_row_mesh(8), make_sharded_step),
        ("tile2x4", make_tile_mesh(2, 4, ("host", "chip")), make_tiled_step),
    ):
        step = make(cfg, mesh)
        state = TemporalState.initial(h, w, jnp.float32)
        log(f"compiling {name} ...")
        lowered = step.lower(arrays, state)
        compiled = lowered.compile()
        colls = hlo_collectives(compiled.as_text())
        # one warm step, then time 3
        out, state = step(arrays, state)
        jax.block_until_ready(state.color)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out, state = step(arrays, state)
            jax.block_until_ready(state.color)
            best = min(best, time.perf_counter() - t0)
        result[name] = {
            "collectives": colls,
            "step_ms_cpu_virtual": round(best * 1e3, 1),
        }
        log(f"  {name}: {best*1e3:.1f} ms/step, collectives={colls}")

    # analytic halo volume per a-trous step at 1080p on the row mesh:
    # 2*step rows x W x 4ch f32, exchanged both directions per shard edge
    halos = {}
    for i in range(5):
        step_sz = 1 << i
        halos[f"step{step_sz}"] = 2 * (2 * step_sz) * 1920 * 4 * 4
    result["atrous_halo_bytes_per_shard_edge_1080p"] = halos
    result["note"] = (
        "virtual 8-device CPU mesh; collective counts/bytes from compiled "
        "HLO at the listed frame size; CPU step ms is structure evidence, "
        "not TPU perf"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
