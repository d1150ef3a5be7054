"""Pallas dense ray-triangle intersection kernel.

The XLA dense intersector (ops.intersect.intersect_dense) streams (R, 128)
Moller-Trumbore temporaries through HBM every chunk step — at 1080p that is
GBs of traffic per scene intersect and the frame is ~100% trace-bound
(BENCH_r02). This kernel keeps the WHOLE padded world-triangle soup resident
in VMEM (9 x T floats: 16k tris = 576 KB) and tiles rays over the grid, so
per ray the only HBM traffic is 8 floats in + 4 values out while all
(ray x triangle) math stays on the VPU. Arithmetic intensity ~100 flops/byte
-> compute-bound, which is the speed-of-light regime for this op.

Layout (r4 rework): every per-ray array is LANE-major — rays live on the
128-wide lane dimension ((3, R) origins/directions, (2, R) t0+active,
(4, R) out), so a ray tile's DMA is a few KB instead of the 128x-padded MB
the r3 (R, 3) layout cost (~15 us/grid-step of pure copy, 8 ms/intersect at
1080p). Inside the kernel the MT temporaries are (TC tris x RS rays):
triangles on sublanes (via 10 small (1,TC)->(TC,1) transposes per triangle
chunk), rays on lanes.

Semantics mirror intersect_dense exactly (reference Common.cuh:509-536
Moller-Trumbore + nearest-hit selection with first-minimum tie-break).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_LENGTH = 1e30

# rays per grid step / rays per inner sub-tile / triangles per inner step.
# A TPU grid step has ~2-3 us fixed overhead, so ray tiles are large; the
# (TC, RS) Moller-Trumbore temporaries stay VMEM-sized.
_RT = 4096
_RS = 512
_TC = 256


def _kernel(tri_ref, valid_ref, ro_ref, rd_ref, ta_ref, out_ref,
            *, n_chunks, tc):
    """One ray tile (RT rays, on lanes) against every triangle chunk.

    tri_ref: (9, T) VMEM — v0xyz, v1xyz, v2xyz rows, T = n_chunks*tc
    valid_ref: (1, T) f32 — 1.0 for real triangles (0 = padding / filtered)
    ro_ref/rd_ref: (3, RT); ta_ref: (2, RT) rows = (t0, active);
    out_ref: (4, RT) rows = (t, u, v, tri_index).

    Tile / sub-tile early-out: a tile (or RS-ray sub-tile) whose rays are
    ALL inactive (dead lanes after termination/RR, or a masked re-trace)
    skips the triangle loop — the wavefront analogue of SIMT divergence
    exit (PathTrace.cuh:558-621); masked traces are nearly free.
    """
    t00 = ta_ref[0:1, :]                       # (1, RT)
    out_ref[0:1, :] = t00
    out_ref[1:4, :] = jnp.zeros((3, out_ref.shape[1]), jnp.float32)
    live_tile = jnp.any(ta_ref[1, :] > 0.0)

    @pl.when(live_tile)
    def _live():
        def chunk(c, _):
            sl = pl.ds(c * tc, tc)
            # triangles onto sublanes: 10 small (1,tc)->(tc,1) transposes,
            # hoisted out of the ray sub-tile loop
            comp = [
                jnp.transpose(tri_ref[k, sl][None, :], (1, 0)) for k in range(9)
            ]
            (v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z) = comp
            val = jnp.transpose(valid_ref[0, sl][None, :], (1, 0)) > 0.5
            e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
            e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z

            def sub(s, _):
                rows = pl.ds(s * _RS, _RS)
                live = jnp.any(ta_ref[1, rows] > 0.0)

                @pl.when(live)
                def _go():
                    rox = ro_ref[0:1, rows]
                    roy = ro_ref[1:2, rows]
                    roz = ro_ref[2:3, rows]
                    rdx = rd_ref[0:1, rows]
                    rdy = rd_ref[1:2, rows]
                    rdz = rd_ref[2:3, rows]
                    # h = rd x e2 -> (tc, RS)
                    hx = rdy * e2z - rdz * e2y
                    hy = rdz * e2x - rdx * e2z
                    hz = rdx * e2y - rdy * e2x
                    a = e1x * hx + e1y * hy + e1z * hz
                    parallel = jnp.abs(a) < 1e-8
                    f = 1.0 / jnp.where(parallel, 1.0, a)
                    sx, sy, sz = rox - v0x, roy - v0y, roz - v0z
                    u = f * (sx * hx + sy * hy + sz * hz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = f * (rdx * qx + rdy * qy + rdz * qz)
                    t = f * (e2x * qx + e2y * qy + e2z * qz)
                    hit = (
                        (~parallel) & (u >= 0) & (u <= 1) & (v >= 0)
                        & (u + v <= 1) & (t > 1e-8) & val
                    )
                    t = jnp.where(hit, t, MAX_LENGTH)

                    tmin = jnp.min(t, axis=0, keepdims=True)      # (1, RS)
                    srow = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                    first = jnp.min(
                        jnp.where(t == tmin, srow, jnp.int32(2 ** 30)),
                        axis=0, keepdims=True,
                    )
                    sel = srow == first
                    uc = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
                    vc = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
                    ic = (first + c * tc).astype(jnp.float32)

                    bt = out_ref[0:1, rows]
                    closer = tmin < bt
                    out_ref[0:1, rows] = jnp.where(closer, tmin, bt)
                    out_ref[1:2, rows] = jnp.where(closer, uc, out_ref[1:2, rows])
                    out_ref[2:3, rows] = jnp.where(closer, vc, out_ref[2:3, rows])
                    out_ref[3:4, rows] = jnp.where(closer, ic, out_ref[3:4, rows])
                return 0

            jax.lax.fori_loop(0, out_ref.shape[1] // _RS, sub, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _intersect_rays(tris9, valid, ro, rd, t0, act, interpret=False):
    """(t, u, v, idx) of the nearest valid triangle per ray.

    tris9: (9, T) with T a multiple of 128; valid: (T,) f32; ro/rd (R,3);
    t0 (R,); act (R,) f32 — fully-inactive ray tiles are skipped.
    """
    T = tris9.shape[1]
    R = ro.shape[0]
    tc = _TC if T >= _TC else T      # T is a multiple of 128 (soup padding)
    n_chunks = -(-T // tc)
    tpad = n_chunks * tc - T
    if tpad:
        tris9 = jnp.concatenate([tris9, jnp.zeros((9, tpad), tris9.dtype)], axis=1)
        valid = jnp.concatenate([valid, jnp.zeros((tpad,), valid.dtype)], axis=0)
        T = T + tpad
    pad = (-R) % _RT
    ro_t = ro.T
    rd_t = rd.T
    ta = jnp.stack([t0, act])
    if pad:
        ro_t = jnp.concatenate([ro_t, jnp.zeros((3, pad), ro.dtype)], axis=1)
        rd_t = jnp.concatenate([rd_t, jnp.ones((3, pad), rd.dtype)], axis=1)
        ta = jnp.concatenate([ta, jnp.zeros((2, pad), ta.dtype)], axis=1)
    Rp = ro_t.shape[1]
    grid = (Rp // _RT,)

    out = pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks, tc=tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, T), lambda i: (0, 0)),
            pl.BlockSpec((1, T), lambda i: (0, 0)),
            pl.BlockSpec((3, _RT), lambda i: (0, i)),
            pl.BlockSpec((3, _RT), lambda i: (0, i)),
            pl.BlockSpec((2, _RT), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((4, _RT), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((4, Rp), jnp.float32),
        interpret=interpret,
    )(tris9, valid.reshape(1, T), ro_t, rd_t, ta)

    return out[0, :R], out[1, :R], out[2, :R], out[3, :R].astype(jnp.int32)


def intersect_dense_pallas(scene, ro, rd, active=None, any_hit=False,
                           tmax=None, only_instance=None, interpret=False):
    """Drop-in Pallas twin of ops.intersect.intersect_dense (same Hit out)."""
    from svgf_tpu.ops.intersect import Hit

    R = ro.shape[0]
    tw = scene.world_tris9.shape[1]
    if only_instance is not None:
        valid = (scene.world_tri_inst == only_instance).astype(jnp.float32)
    else:
        valid = (scene.world_tri_inst >= 0).astype(jnp.float32)

    t0 = jnp.full((R,), MAX_LENGTH, jnp.float32)
    if tmax is not None:
        t0 = jnp.broadcast_to(tmax, (R,)).astype(jnp.float32)
    act = (
        jnp.ones((R,), jnp.float32)
        if active is None
        else active.astype(jnp.float32)
    )

    # The kernel only SELECTS the nearest triangle (discrete, constant under
    # differentiation — SURVEY §7.1); t/u/v are then recomputed for the
    # winning triangle in plain JAX so they stay differentiable w.r.t. the
    # ray (camera pose) and the geometry, exactly like the XLA intersector.
    tb, _, _, ib = _intersect_rays(
        jax.lax.stop_gradient(scene.world_tris9), valid,
        jax.lax.stop_gradient(ro), jax.lax.stop_gradient(rd),
        t0, act, interpret=interpret,
    )
    ok = tb < t0
    ib = jnp.clip(ib, 0, tw - 1)

    from svgf_tpu.ops.gather import take_rows
    from svgf_tpu.ops.geometry import ray_triangle_comp_raw

    # ONE MXU one-hot gathers the winning triangle's 9 vertex floats AND its
    # prim/instance/material ids (ids ride the f32 matmul exactly, < 2^24)
    cat = jnp.concatenate(
        [
            scene.world_tris9.T,
            scene.world_tri_prim.astype(jnp.float32)[:, None],
            scene.world_tri_inst.astype(jnp.float32)[:, None],
            scene.world_tri_mat.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )
    rows = take_rows(cat, ib)                                   # (R, 12)
    w9 = rows[:, :9].T
    prim_id = rows[:, 9].astype(jnp.int32)
    inst_id = rows[:, 10].astype(jnp.int32)
    mat_id = rows[:, 11].astype(jnp.int32)
    roc = (ro[:, 0], ro[:, 1], ro[:, 2])
    rdc = (rd[:, 0], rd[:, 1], rd[:, 2])
    # RAW values: the kernel's hit verdict is authoritative; re-masking here
    # could flip borderline (edge/ulp) lanes to a spurious miss
    t2, u2, v2 = ray_triangle_comp_raw(
        roc, rdc, (w9[0], w9[1], w9[2]), (w9[3], w9[4], w9[5]), (w9[6], w9[7], w9[8])
    )
    hit = Hit(
        dist=jnp.where(ok, t2, t0),
        u=jnp.where(ok, u2, 0.0),
        v=jnp.where(ok, v2, 0.0),
        prim=prim_id,
        instance=jnp.where(ok, inst_id, 0),
        material=mat_id,
    )
    if active is not None:
        hit = hit._replace(dist=jnp.where(active, hit.dist, t0))
    return hit
