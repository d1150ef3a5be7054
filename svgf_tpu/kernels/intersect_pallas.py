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


def _kernel(tri_ref, ro_ref, rd_ref, ta_ref, out_ref, *, n_chunks, tc):
    """One ray tile (RT rays, on lanes) against every triangle chunk.

    tri_ref: (13, T) VMEM — rows 0-8 v0xyz v1xyz v2xyz, 9 valid (1.0 = real
    triangle), 10 prim, 11 inst, 12 mat; T = n_chunks*tc.
    ro_ref/rd_ref: (3, RT); ta_ref: (2, RT) rows = (t0, active);
    out_ref: (16, RT) rows = [t u v col | v0xyz v1xyz v2xyz | prim inst mat].

    The winner's 9 vertex floats and its ids are selected IN-KERNEL while
    they are VMEM-resident (masked select-sum per improving chunk) — the r4
    wrapper's MXU one-hot row-gather for them cost ~0.4 ms per call at
    1080p-chunk lane counts, most of the all-inactive fixed cost.

    Tile / sub-tile early-out: a tile (or RS-ray sub-tile) whose rays are
    ALL inactive (dead lanes after termination/RR, or a masked re-trace)
    skips the triangle loop — the wavefront analogue of SIMT divergence
    exit (PathTrace.cuh:558-621).
    """
    t00 = ta_ref[0:1, :]                       # (1, RT)
    out_ref[0:1, :] = t00
    out_ref[1:16, :] = jnp.zeros((15, out_ref.shape[1]), jnp.float32)
    live_tile = jnp.any(ta_ref[1, :] > 0.0)

    @pl.when(live_tile)
    def _live():
        def chunk(c, _):
            sl = pl.ds(c * tc, tc)
            # triangles onto sublanes: 13 small (1,tc)->(tc,1) transposes,
            # hoisted out of the ray sub-tile loop
            comp = [
                jnp.transpose(tri_ref[k, sl][None, :], (1, 0)) for k in range(9)
            ]
            val = jnp.transpose(tri_ref[9, sl][None, :], (1, 0)) > 0.5
            ids = [
                jnp.transpose(tri_ref[k, sl][None, :], (1, 0))
                for k in (10, 11, 12)
            ]

            def sub(s, _):
                rows = pl.ds(s * _RS, _RS)
                live = jnp.any(ta_ref[1, rows] > 0.0)

                @pl.when(live)
                def _go():
                    tmin, uc, vc, ic, sel = _mt_rows(
                        comp, val, ro_ref, rd_ref, rows, c * tc
                    )
                    bt = out_ref[0:1, rows]
                    closer = tmin < bt
                    any_closer = jnp.any(closer)

                    @pl.when(any_closer)
                    def _upd():
                        out_ref[0:1, rows] = jnp.where(closer, tmin, bt)
                        out_ref[1:2, rows] = jnp.where(
                            closer, uc, out_ref[1:2, rows]
                        )
                        out_ref[2:3, rows] = jnp.where(
                            closer, vc, out_ref[2:3, rows]
                        )
                        out_ref[3:4, rows] = jnp.where(
                            closer, ic, out_ref[3:4, rows]
                        )
                        for jj, cj in enumerate(comp + ids):
                            r = 4 + jj
                            wv = jnp.sum(
                                jnp.where(sel, cj, 0.0), axis=0, keepdims=True
                            )
                            out_ref[r : r + 1, rows] = jnp.where(
                                closer, wv, out_ref[r : r + 1, rows]
                            )
                return 0

            jax.lax.fori_loop(0, out_ref.shape[1] // _RS, sub, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk, 0)


@functools.partial(jax.jit, static_argnames=("t_real", "interpret"))
def _intersect_rays(tri13, ro, rd, t0, act, t_real=None, interpret=False):
    """Nearest valid hit per ray + the winner's vertex/id rows.

    tri13: (13, T) packed [v0-v2 xyz | valid prim inst mat] with T a
    multiple of 128; ro/rd (R,3); t0 (R,); act (R,) f32 — fully-inactive
    ray tiles are skipped. t_real (static): the REAL triangle count — the
    MT loop covers only ceil(t_real/8)*8 columns, so tiny scenes (Cornell:
    36 tris in a 128-col soup) don't burn 3x their ray-triangle work on
    padding. Returns (t, u, v, w9 (9, R), prim, inst, mat).
    """
    T = tri13.shape[1]
    R = ro.shape[0]
    if t_real is not None and 0 < t_real < T:
        t_eff = min(T, -(-t_real // 8) * 8)
    else:
        t_eff = T
    tc = _TC if t_eff >= _TC else t_eff
    n_chunks = -(-t_eff // tc)
    tpad = n_chunks * tc - T
    if tpad > 0:
        tri13 = jnp.concatenate(
            [tri13, jnp.zeros((13, tpad), tri13.dtype)], axis=1
        )
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
            pl.BlockSpec((13, T), lambda i: (0, 0)),
            pl.BlockSpec((3, _RT), lambda i: (0, i)),
            pl.BlockSpec((3, _RT), lambda i: (0, i)),
            pl.BlockSpec((2, _RT), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((16, _RT), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((16, Rp), jnp.float32),
        interpret=interpret,
    )(tri13, ro_t, rd_t, ta)

    return (
        out[0, :R], out[1, :R], out[2, :R],
        out[4:13, :R],
        out[13, :R].astype(jnp.int32),
        out[14, :R].astype(jnp.int32),
        out[15, :R].astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Clustered intersector — large scenes (> ops.intersect.DENSE_MAX_TRIS)
# ---------------------------------------------------------------------------
#
# The reference walks a per-ray two-level BVH with a divergent 64-deep stack
# (PathTrace.cuh:90-142, Common.cuh:550-620). The TPU form (accel.clusters):
# the BLAS-leaf-ordered soup is cut into accel.clusters.CLUSTER_TRIS-triangle
# clusters and SUPER_CLUSTERS-cluster superclusters with conservative AABBs;
# per 4096-ray tile the
# kernel slab-tests every ray against every supercluster (vectorized,
# clusters on sublanes x rays on lanes — full (8,128) tiling), descends only
# into hit superclusters, re-tests their 16 clusters, and DMAs + MT-tests
# only clusters some ray can still hit (tnear <= current best t). Triangles
# stay in HBM; VMEM holds one cluster at a time — the working set is O(1)
# in scene size, so this scales to ~1M triangles (clusters.MAX_CLUSTERS).
#
# The kernel also RETURNS the winning triangle's 9 vertex floats and its
# (prim, instance, material) ids: for tables this size the XLA row-gather is
# scalar-slow and the MXU one-hot trick stops paying (ops.gather), but the
# winner's data is already VMEM-resident when it wins — a masked select-sum
# per improving chunk is nearly free.

_SLAB_EPS = 1e-30  # |rd| floor: keeps 1/rd finite, slab test conservative

# rays per clustered grid step: one 64x64-pixel block (render.pathtrace
# BLOCK_H/W). Measured on the 104k-tri stress terrain: 4096-ray tiles beat
# 2048 (17.6 vs 12.6 Mrays/s primary) — smaller tiles repeat the same
# cluster DMAs across more tiles.
_CRT = 4096


def _mt_rows(comp, val, ro_ref, rd_ref, rows, base_col):
    """Moller-Trumbore of one (tc, 1)-component triangle chunk against the
    ray lanes `rows`. Returns (tmin (1,RS), uc, vc, ic, sel (tc,RS), hit any).
    Same math/selection as the dense kernel (Common.cuh:509-536 + nearest
    hit with first-minimum tie-break)."""
    (v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z) = comp
    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    rox = ro_ref[0:1, rows]
    roy = ro_ref[1:2, rows]
    roz = ro_ref[2:3, rows]
    rdx = rd_ref[0:1, rows]
    rdy = rd_ref[1:2, rows]
    rdz = rd_ref[2:3, rows]
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
    tmin = jnp.min(t, axis=0, keepdims=True)
    srow = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    first = jnp.min(
        jnp.where(t == tmin, srow, jnp.int32(2 ** 30)), axis=0, keepdims=True
    )
    sel = srow == first
    uc = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
    vc = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
    ic = (first + base_col).astype(jnp.float32)
    return tmin, uc, vc, ic, sel


def _slab_hits(b_lo, b_hi, ro_rows, inv_rows, act_row, tbest_row):
    """(K, RS) conservative ray-vs-AABB hits. b_lo/b_hi: 3 columns (K, 1);
    ro_rows/inv_rows: 3 rows (1, RS) each. Also requires the box to be
    reachable before each ray's current best t (kills the 1e30 point boxes
    of empty/padding clusters)."""
    tnear = None
    tfar = None
    for k in range(3):
        t1 = (b_lo[k] - ro_rows[k]) * inv_rows[k]
        t2 = (b_hi[k] - ro_rows[k]) * inv_rows[k]
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        tnear = lo if tnear is None else jnp.maximum(tnear, lo)
        tfar = hi if tfar is None else jnp.minimum(tfar, hi)
    return (tnear <= tfar) & (tfar >= 0.0) & (tnear <= tbest_row) & act_row


def _kernel_clustered(cb_ref, sb_ref, oi_ref, pk_hbm,
                      ro_ref, rd_ref, ta_ref, out_ref,
                      invd, scm, clm, tscr, sem,
                      *, n_sc, rt):
    """One 4096-ray tile against the clustered soup (see module section).

    cb_ref: (C, 8) cluster bounds [lo3 hi3 inst_min inst_max] (VMEM)
    sb_ref: (C2, 8) supercluster bounds (VMEM)
    oi_ref: (1, 1) i32 SMEM — only_instance or -1
    pk_hbm: (16, T) HBM — rows 0-8 tri verts, 9 valid, 10 prim, 11 inst,
        12 mat, 13-15 zero pad. 16 rows so the dynamic-offset cluster DMA is
        (8,128)-tile aligned (Mosaic requires 8-aligned sublane shape).
    out_ref: (16, RT) — [t u v col | v0xyz v1xyz v2xyz | prim inst mat]
    """
    from svgf_tpu.accel.clusters import CLUSTER_TRIS as _CL
    from svgf_tpu.accel.clusters import SUPER_CLUSTERS as _SCN

    n_sub = rt // _RS
    out_ref[0:1, :] = ta_ref[0:1, :]
    out_ref[1:16, :] = jnp.zeros((15, rt), jnp.float32)
    live_tile = jnp.any(ta_ref[1, :] > 0.0)

    @pl.when(live_tile)
    def _live():
        oi = oi_ref[0, 0]
        oi_f = oi.astype(jnp.float32)
        for k in range(3):
            d = rd_ref[k : k + 1, :]
            d = jnp.where(
                jnp.abs(d) < _SLAB_EPS,
                jnp.where(d < 0, -_SLAB_EPS, _SLAB_EPS),
                d,
            )
            invd[k : k + 1, :] = 1.0 / d

        def inst_ok(lo_col, hi_col):
            # cluster can contain only_instance (or no restriction)
            return (oi < 0) | ((lo_col <= oi_f) & (hi_col >= oi_f))

        # ---- supercluster pass: (C2, RS) per subtile, fully vectorized ----
        sb_lo = [sb_ref[:, k : k + 1] for k in range(3)]
        sb_hi = [sb_ref[:, 3 + k : 4 + k] for k in range(3)]
        s_ok = inst_ok(sb_ref[:, 6:7], sb_ref[:, 7:8])
        for s in range(n_sub):
            rows = slice(s * _RS, (s + 1) * _RS)
            ro_rows = [ro_ref[k : k + 1, rows] for k in range(3)]
            inv_rows = [invd[k : k + 1, rows] for k in range(3)]
            hits = _slab_hits(
                sb_lo, sb_hi, ro_rows, inv_rows,
                ta_ref[1:2, rows] > 0.0, out_ref[0:1, rows],
            ) & s_ok
            scm[:, s : s + 1] = jnp.any(hits, axis=1, keepdims=True).astype(
                jnp.float32
            )

        # ---- descend into hit superclusters ----
        def sc_body(s2, _):
            sc_hit = jnp.any(scm[pl.ds(s2, 1), :] > 0.0)

            @pl.when(sc_hit)
            def _sc():
                base = s2 * _SCN
                # ONE DMA for the whole supercluster's 16 clusters (128 KB):
                # per-cluster copies serialize ~2.5 us DMA latency each and
                # dominated the r4 first cut; bandwidth is negligible either
                # way. The copy overlaps the cluster-mask slab pass below.
                cp = pltpu.make_async_copy(
                    pk_hbm.at[:, pl.ds(base * _CL, _SCN * _CL)], tscr, sem
                )
                cp.start()
                cb_lo = [cb_ref[pl.ds(base, _SCN), k : k + 1] for k in range(3)]
                cb_hi = [
                    cb_ref[pl.ds(base, _SCN), 3 + k : 4 + k] for k in range(3)
                ]
                c_ok = inst_ok(
                    cb_ref[pl.ds(base, _SCN), 6:7],
                    cb_ref[pl.ds(base, _SCN), 7:8],
                )
                for s in range(n_sub):
                    rows = slice(s * _RS, (s + 1) * _RS)
                    ro_rows = [ro_ref[k : k + 1, rows] for k in range(3)]
                    inv_rows = [invd[k : k + 1, rows] for k in range(3)]
                    hits = _slab_hits(
                        cb_lo, cb_hi, ro_rows, inv_rows,
                        ta_ref[1:2, rows] > 0.0, out_ref[0:1, rows],
                    ) & c_ok
                    clm[:, s : s + 1] = jnp.any(
                        hits, axis=1, keepdims=True
                    ).astype(jnp.float32)
                cp.wait()

                def cl_body(k2, _):
                    cl_hit = jnp.any(clm[pl.ds(k2, 1), :] > 0.0)

                    @pl.when(cl_hit)
                    def _cl():
                        c = base + k2
                        sl = pl.ds(k2 * _CL, _CL)
                        comp = [
                            jnp.transpose(tscr[k, sl][None, :], (1, 0))
                            for k in range(9)
                        ]
                        val = jnp.transpose(tscr[9, sl][None, :], (1, 0)) > 0.5
                        if_oi = (oi < 0) | (
                            jnp.transpose(tscr[11, sl][None, :], (1, 0)) == oi_f
                        )
                        val = val & if_oi
                        ids = [
                            jnp.transpose(tscr[k, sl][None, :], (1, 0))
                            for k in (10, 11, 12)
                        ]
                        for s in range(n_sub):
                            sub_hit = jnp.any(clm[pl.ds(k2, 1), s : s + 1] > 0.0)

                            @pl.when(sub_hit)
                            def _go(s=s):
                                rows = pl.ds(s * _RS, _RS)
                                tmin, uc, vc, ic, sel = _mt_rows(
                                    comp, val, ro_ref, rd_ref, rows,
                                    (c * _CL).astype(jnp.int32),
                                )
                                bt = out_ref[0:1, rows]
                                closer = tmin < bt
                                any_closer = jnp.any(closer)

                                @pl.when(any_closer)
                                def _upd():
                                    out_ref[0:1, rows] = jnp.where(
                                        closer, tmin, bt
                                    )
                                    out_ref[1:2, rows] = jnp.where(
                                        closer, uc, out_ref[1:2, rows]
                                    )
                                    out_ref[2:3, rows] = jnp.where(
                                        closer, vc, out_ref[2:3, rows]
                                    )
                                    out_ref[3:4, rows] = jnp.where(
                                        closer, ic, out_ref[3:4, rows]
                                    )
                                    for j, cj in enumerate(comp + ids):
                                        r = 4 + j
                                        wv = jnp.sum(
                                            jnp.where(sel, cj, 0.0),
                                            axis=0, keepdims=True,
                                        )
                                        out_ref[r : r + 1, rows] = jnp.where(
                                            closer, wv, out_ref[r : r + 1, rows]
                                        )
                    return 0

                jax.lax.fori_loop(0, _SCN, cl_body, 0)
            return 0

        jax.lax.fori_loop(0, n_sc, sc_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _intersect_rays_clustered(packed16, cb, sb, only_inst, ro, rd, t0, act,
                              interpret=False):
    """Nearest valid hit per ray over the clustered soup. packed16: (16, T)
    [v0-v2 xyz | valid prim inst mat | pad] f32. Returns (t, u, v, col,
    w9 (9, R), prim, inst, mat) — winner attributes included (see module
    section). only_inst: traced i32 scalar, -1 = all."""
    from svgf_tpu.accel.clusters import CLUSTER_TRIS as _CL
    from svgf_tpu.accel.clusters import SUPER_CLUSTERS as _SCN

    T = packed16.shape[1]
    C = cb.shape[0]
    C2 = sb.shape[0]
    assert T == C * _CL and C == C2 * _SCN, (T, C, C2)
    R = ro.shape[0]
    pad = (-R) % _CRT
    ro_t = ro.T
    rd_t = rd.T
    ta = jnp.stack([t0, act])
    if pad:
        ro_t = jnp.concatenate([ro_t, jnp.zeros((3, pad), ro.dtype)], axis=1)
        rd_t = jnp.concatenate([rd_t, jnp.ones((3, pad), rd.dtype)], axis=1)
        ta = jnp.concatenate([ta, jnp.zeros((2, pad), ta.dtype)], axis=1)
    Rp = ro_t.shape[1]

    out = pl.pallas_call(
        functools.partial(_kernel_clustered, n_sc=C2, rt=_CRT),
        grid=(Rp // _CRT,),
        in_specs=[
            pl.BlockSpec((C, 8), lambda i: (0, 0)),
            pl.BlockSpec((C2, 8), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((3, _CRT), lambda i: (0, i)),
            pl.BlockSpec((3, _CRT), lambda i: (0, i)),
            pl.BlockSpec((2, _CRT), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((16, _CRT), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((16, Rp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, _CRT), jnp.float32),      # inv ray dirs
            pltpu.VMEM((C2, 8), jnp.float32),       # supercluster hit mask
            pltpu.VMEM((_SCN, 8), jnp.float32),     # cluster hit mask
            pltpu.VMEM((16, _SCN * _CL), jnp.float32),  # packed supercluster
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cb, sb, jnp.reshape(only_inst.astype(jnp.int32), (1, 1)),
      packed16, ro_t, rd_t, ta)

    return (
        out[0, :R], out[1, :R], out[2, :R], out[3, :R].astype(jnp.int32),
        out[4:13, :R], out[13, :R].astype(jnp.int32),
        out[14, :R].astype(jnp.int32), out[15, :R].astype(jnp.int32),
    )


def intersect_clustered_pallas(scene, ro, rd, active=None, any_hit=False,
                               tmax=None, only_instance=None, interpret=False):
    """Large-scene Pallas intersector (meta.soup_leaf_order scenes).

    `any_hit` degrades to closest-hit here (results remain correct for
    occlusion tests — a closest hit IS a hit): per-lane early exit would
    only prune tiles whose EVERY ray has already hit, and the cluster
    `tnear <= t_best` cull already shrinks the search to the found-hit
    distance. No production call site passes any_hit=True today (the NEE
    shadow trace needs the closest hit for sample_lights_pdf_from_hit).

    Drop-in for ops.intersect.intersect_scene's closest-hit contract. The
    hit's t/u/v are recomputed in plain JAX from the winning triangle so they
    stay differentiable w.r.t. the RAY (camera pose); vertex-position
    gradients are cut by design here (the winner's geometry comes out of the
    kernel) — PARITY.md documents the deviation for > DENSE_MAX_TRIS scenes.
    """
    from svgf_tpu.ops.intersect import Hit
    from svgf_tpu.ops.geometry import ray_triangle_comp_raw

    R = ro.shape[0]
    t0 = jnp.full((R,), MAX_LENGTH, jnp.float32)
    if tmax is not None:
        t0 = jnp.broadcast_to(tmax, (R,)).astype(jnp.float32)
    act = (
        jnp.ones((R,), jnp.float32)
        if active is None
        else active.astype(jnp.float32)
    )
    oi = jnp.asarray(-1 if only_instance is None else only_instance, jnp.int32)

    # one (16, T) packed array: aligned single-DMA clusters (XLA CSEs this
    # concat across the several intersect calls of one jitted frame)
    T = scene.world_tris9.shape[1]
    packed16 = jnp.concatenate(
        [
            scene.world_tris9,
            (scene.world_tri_inst >= 0).astype(jnp.float32)[None],
            scene.world_tri_prim.astype(jnp.float32)[None],
            scene.world_tri_inst.astype(jnp.float32)[None],
            scene.world_tri_mat.astype(jnp.float32)[None],
            jnp.zeros((3, T), jnp.float32),
        ]
    )
    tb, _, _, _, w9, prim_id, inst_id, mat_id = _intersect_rays_clustered(
        jax.lax.stop_gradient(packed16),
        jax.lax.stop_gradient(scene.world_cluster_bounds),
        jax.lax.stop_gradient(scene.world_sclust_bounds),
        oi,
        jax.lax.stop_gradient(ro), jax.lax.stop_gradient(rd),
        t0, act, interpret=interpret,
    )
    ok = tb < t0
    roc = (ro[:, 0], ro[:, 1], ro[:, 2])
    rdc = (rd[:, 0], rd[:, 1], rd[:, 2])
    t2, u2, v2 = ray_triangle_comp_raw(
        roc, rdc, (w9[0], w9[1], w9[2]), (w9[3], w9[4], w9[5]),
        (w9[6], w9[7], w9[8])
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
    # differentiation — SURVEY §7.1) and returns the winner's vertex/id rows
    # while they are VMEM-resident; t/u/v are then recomputed in plain JAX
    # so they stay differentiable w.r.t. the ray (camera pose) and the
    # geometry, exactly like the XLA intersector. The packed (13, T) concat
    # is CSE'd by XLA across the several intersect calls of one jitted frame.
    tri13 = jnp.concatenate(
        [
            scene.world_tris9,
            valid[None],
            scene.world_tri_prim.astype(jnp.float32)[None],
            scene.world_tri_inst.astype(jnp.float32)[None],
            scene.world_tri_mat.astype(jnp.float32)[None],
        ]
    )
    tb, _, _, w9, prim_id, inst_id, mat_id = _intersect_rays(
        jax.lax.stop_gradient(tri13),
        jax.lax.stop_gradient(ro), jax.lax.stop_gradient(rd),
        t0, act, t_real=int(scene.meta.n_world_tris), interpret=interpret,
    )
    ok = tb < t0

    from svgf_tpu.ops.geometry import ray_triangle_comp_raw

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
