"""Clustered Pallas intersector (large scenes) vs float64 ground truth.

The comparison baseline is a float64 numpy Moller-Trumbore over the world
soup, NOT intersect_brute_force: f32 MT is unstable for rays that graze a
shared edge/near-parallel triangle, and the two f32 paths legitimately
resolve such edges differently (verified: the f64 winner matches the
clustered kernel where they disagree). Tolerances below allow an edge flip
only when the distances agree to 2e-3 relative.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from svgf_tpu.ops.intersect import intersect_scene, set_pallas_mode


@pytest.fixture(scope="module")
def scene_arrays():
    from svgf_tpu.scenes.stress import stress_scene

    sc = stress_scene(n=96)  # 18,050 world tris: just over DENSE_MAX_TRIS
    arr = sc.flatten()
    return sc, arr


@pytest.fixture(scope="module")
def camera_ray_batch(scene_arrays):
    from svgf_tpu.render.gbuffer import camera_rays

    _, arr = scene_arrays
    ro, rd = camera_rays(arr.cam_frame[0], arr.cam_proj[0], 16, 32)
    return ro.reshape(-1, 3), rd.reshape(-1, 3)


def _brute_f64(arr, ro, rd, only_instance=None, tmax=None):
    """float64 numpy nearest-hit over the padded world soup."""
    w9 = np.asarray(arr.world_tris9, np.float64)
    wi = np.asarray(arr.world_tri_inst)
    ro = np.asarray(ro, np.float64)
    rd = np.asarray(rd, np.float64)
    v0, v1, v2 = w9[0:3].T, w9[3:6].T, w9[6:9].T
    e1, e2 = v1 - v0, v2 - v0
    h = np.cross(rd[:, None, :], e2[None])
    a = (e1[None] * h).sum(-1)
    par = np.abs(a) < 1e-12
    f = 1.0 / np.where(par, 1.0, a)
    s = ro[:, None, :] - v0[None]
    u = f * (s * h).sum(-1)
    q = np.cross(s, e1[None])
    v = f * (q * rd[:, None, :]).sum(-1)
    t = f * (e2[None] * q).sum(-1)
    valid = wi >= 0 if only_instance is None else wi == only_instance
    hit = (~par) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-8)
    hit &= valid[None]
    t = np.where(hit, t, 1e30)
    if tmax is not None:
        t = np.where(t < np.asarray(tmax, np.float64)[:, None], t, 1e30)
    best = t.min(axis=1)
    col = t.argmin(axis=1)
    return best, col


def test_meta_and_cluster_shapes(scene_arrays):
    from svgf_tpu.accel.clusters import CLUSTER_TRIS, SUPER_CLUSTERS

    _, arr = scene_arrays
    assert arr.meta.soup_leaf_order and arr.meta.has_scene_bvh
    T = arr.world_tris9.shape[1]
    C = arr.world_cluster_bounds.shape[0]
    assert T == C * CLUSTER_TRIS
    assert C == arr.world_sclust_bounds.shape[0] * SUPER_CLUSTERS
    cb = np.asarray(arr.world_cluster_bounds)
    nonempty = cb[:, 6] <= cb[:, 7]
    assert nonempty.any()
    assert (cb[nonempty, 0:3] <= cb[nonempty, 3:6]).all()


def test_clustered_matches_f64_truth(scene_arrays, camera_ray_batch):
    _, arr = scene_arrays
    ro, rd = camera_ray_batch
    set_pallas_mode("interpret")
    try:
        hit = intersect_scene(arr, ro, rd)
    finally:
        set_pallas_mode("auto")
    ref_t, _ = _brute_f64(arr, ro, rd)
    got = np.asarray(hit.dist)
    hits = ref_t < 1e29
    assert ((got < 1e29) == hits).all(), "hit/miss sets differ"
    rel = np.abs(got[hits] - ref_t[hits]) / ref_t[hits]
    assert rel.max() < 2e-3, f"max rel dist err {rel.max()}"
    # the overwhelming majority must be exact (non-edge) matches
    assert (rel < 1e-5).mean() > 0.95


def test_clustered_only_instance_and_tmax(scene_arrays, camera_ray_batch):
    _, arr = scene_arrays
    ro, rd = camera_ray_batch
    R = ro.shape[0]
    # rays that look straight up at the light quad (instance 1)
    up = jnp.concatenate(
        [jnp.zeros((R, 1)), jnp.ones((R, 1)), jnp.zeros((R, 1))], axis=1
    )
    o = jnp.asarray(
        np.stack(
            [np.linspace(-1.2, 1.2, R), np.full(R, 0.5), np.linspace(-0.9, 0.9, R)],
            axis=1,
        ),
        jnp.float32,
    )
    set_pallas_mode("interpret")
    try:
        h_only = intersect_scene(arr, o, up, only_instance=1)
        tmax = jnp.full((R,), 1.5, jnp.float32)
        h_tmax = intersect_scene(arr, o, up, tmax=tmax)
        act = jnp.arange(R) % 2 == 0
        h_act = intersect_scene(arr, o, up, active=act)
    finally:
        set_pallas_mode("auto")
    ref_t, _ = _brute_f64(arr, o, up, only_instance=1)
    got = np.asarray(h_only.dist)
    hits = ref_t < 1e29
    assert ((got < 1e29) == hits).all()
    assert np.allclose(got[hits], ref_t[hits], rtol=2e-3)
    assert (np.asarray(h_only.instance)[hits] == 1).all()

    ref_t2, _ = _brute_f64(arr, o, up, tmax=np.full(R, 1.5))
    got2 = np.asarray(h_tmax.dist)
    hit2 = ref_t2 < 1e29
    assert ((got2 < 1.5) == hit2).all()

    # inactive rays keep the miss sentinel
    d_act = np.asarray(h_act.dist)
    assert (d_act[1::2] >= 1e29).all()


def test_clustered_edit_updates_bounds(scene_arrays):
    import dataclasses

    from svgf_tpu.core.edits import update_instance_transform

    sc, arr = scene_arrays
    sc2 = dataclasses.replace(sc)  # same shapes/instances lists
    t = np.eye(4, dtype=np.float32)
    t[1, 3] = 1.2  # light drops from 2.5 to 1.2
    t[0, 0] = t[2, 2] = 1.5
    arr2 = update_instance_transform(sc2, arr, 1, t)
    cb1 = np.asarray(arr.world_cluster_bounds)
    cb2 = np.asarray(arr2.world_cluster_bounds)
    assert not np.array_equal(cb1, cb2)

    R = 64
    o = jnp.asarray(
        np.stack(
            [np.linspace(-0.5, 0.5, R), np.full(R, 0.6), np.zeros(R)], axis=1
        ),
        jnp.float32,
    )
    up = jnp.concatenate(
        [jnp.zeros((R, 1)), jnp.ones((R, 1)), jnp.zeros((R, 1))], axis=1
    )
    set_pallas_mode("interpret")
    try:
        h = intersect_scene(arr2, o, up, only_instance=1)
    finally:
        set_pallas_mode("auto")
    ref_t, _ = _brute_f64(arr2, o, up, only_instance=1)
    hits = ref_t < 1e29
    assert hits.any()
    got = np.asarray(h.dist)
    assert ((got < 1e29) == hits).all()
    assert np.allclose(got[hits], ref_t[hits], rtol=2e-3)
