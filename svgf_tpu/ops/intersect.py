"""Scene intersection — stackless threaded-BVH traversal, vectorized over rays.

The reference traverses a two-level BVH with a per-thread 64-deep stack
(PathTrace.cuh:90-142, Common.cuh:550-620). Divergent per-ray stacks do not
vectorize on a TPU, so the design here is different:

  * each shape's BVH is laid out in DFS order with skip links (accel.bvh);
    traversal state per ray is ONE int (current node) + the running hit —
    a `lax.while_loop` of pure gathers + elementwise math over the whole
    ray batch, ideal for the VPU;
  * the instance level is a static Python loop over instances (object-space
    ray transform per instance, reference IntersectInstance Common.cuh:623-631);
    scenes here have few instances, and every ray traverses the same shape in
    lockstep, so there is no instance divergence at all.

Object-space ray directions are deliberately NOT normalized, so the hit
parameter t stays in world units and compares correctly across instances
(matches reference Common.cuh:627).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svgf_tpu.accel.bvh import MAX_LEAF
from svgf_tpu.ops.geometry import (
    MAX_LENGTH,
    ray_aabb,
    ray_triangle,
    transform_point,
    transform_vector,
)


class Hit(NamedTuple):
    """Per-ray intersection record (reference sceneIntersection, Common.cuh:146-162)."""

    dist: jax.Array      # (R,) f32, MAX_LENGTH = miss
    u: jax.Array         # (R,) f32 barycentric
    v: jax.Array         # (R,) f32
    prim: jax.Array      # (R,) i32 global triangle id
    instance: jax.Array  # (R,) i32
    material: jax.Array  # (R,) i32

    @staticmethod
    def none(shape) -> "Hit":
        z = jnp.zeros(shape, jnp.int32)
        return Hit(
            dist=jnp.full(shape, MAX_LENGTH, jnp.float32),
            u=jnp.zeros(shape, jnp.float32),
            v=jnp.zeros(shape, jnp.float32),
            prim=z,
            instance=z,
            material=z,
        )

    @property
    def valid(self):
        return self.dist < MAX_LENGTH


def traverse_shape(scene, shape_id, ro, rd, hit: Hit, instance_id, material_id,
                   active, any_hit: bool = False) -> Hit:
    """Threaded-BVH traversal of one shape for a batch of object-space rays.

    shape_id / instance_id / material_id: scalar traced ints. `active` masks
    rays that participate; inactive rays keep their current hit untouched.
    """
    node_start = scene.shape_node_start[shape_id]
    node_count = scene.shape_node_count[shape_id]

    inv_rd = 1.0 / rd
    R = ro.shape[0]
    node0 = jnp.where(active, jnp.zeros(R, jnp.int32), node_count)

    def cond(state):
        node, _ = state
        return jnp.any(node < node_count)

    def body(state):
        node, h = state
        live = node < node_count
        g = node_start + jnp.minimum(node, node_count - 1)  # clamped global node id
        lo = scene.bvh_node_min[g]
        hi = scene.bvh_node_max[g]
        t_box = ray_aabb(ro, inv_rd, lo, hi, h.dist)
        box_hit = live & (t_box < MAX_LENGTH)

        count = scene.bvh_tri_count[g]
        first = scene.bvh_tri_first[g]
        is_leaf = count > 0

        # --- leaf: up to MAX_LEAF triangle tests as one (R, K) batch ---
        do_tris = box_hit & is_leaf
        k = jnp.arange(MAX_LEAF, dtype=jnp.int32)
        slot = jnp.maximum(first[:, None], 0) + k[None, :]             # (R, K)
        tri_valid = do_tris[:, None] & (k[None, :] < count[:, None])
        slot = jnp.clip(slot, 0, scene.bvh_tri_order.shape[0] - 1)
        tri = scene.bvh_tri_order[slot]                                 # (R, K)
        verts = scene.tri_pos[tri]                                      # (R, K, 3, 3)
        t, u, v, m = ray_triangle(
            ro[:, None, :], rd[:, None, :],
            verts[..., 0, :], verts[..., 1, :], verts[..., 2, :],
        )
        t = jnp.where(tri_valid & m, t, MAX_LENGTH)                     # (R, K)
        kbest = jnp.argmin(t, axis=-1)
        tbest = jnp.take_along_axis(t, kbest[:, None], axis=-1)[:, 0]
        closer = tbest < h.dist
        sel = lambda a: jnp.take_along_axis(a, kbest[:, None], axis=-1)[:, 0]
        h = Hit(
            dist=jnp.where(closer, tbest, h.dist),
            u=jnp.where(closer, sel(u), h.u),
            v=jnp.where(closer, sel(v), h.v),
            prim=jnp.where(closer, sel(tri), h.prim),
            instance=jnp.where(closer, instance_id, h.instance),
            material=jnp.where(closer, material_id, h.material),
        )

        # --- next node: descend on internal hit, else follow skip link ---
        nxt = jnp.where(box_hit & ~is_leaf, node + 1, scene.bvh_skip[g])
        if any_hit:
            nxt = jnp.where(closer, node_count, nxt)  # first hit ends the lane
        nxt = jnp.where(live, nxt, node)
        return nxt, h

    _, hit = jax.lax.while_loop(cond, body, (node0, hit))
    return hit


def intersect_scene(scene, ro, rd, active=None, any_hit: bool = False,
                    tmax=None, only_instance=None) -> Hit:
    """Closest-hit (or any-hit) intersection of world-space rays with the scene.

    ro, rd: (R, 3). `only_instance`: restrict to one instance id (static int) —
    used by SampleLightsPDF, which re-traces against each light instance
    (reference Common.cuh:635-715 via IntersectInstance).
    """
    R = ro.shape[0]
    hit = Hit.none((R,))
    if tmax is not None:
        hit = hit._replace(dist=jnp.broadcast_to(tmax, (R,)).astype(jnp.float32))
    if active is None:
        active = jnp.ones((R,), jnp.bool_)

    def step(h, i):
        inv = scene.inst_inv_transform[i]
        ro_o = transform_point(inv, ro)
        rd_o = transform_vector(inv, rd)  # NOT normalized (world-unit t)
        h = traverse_shape(
            scene, scene.inst_shape[i], ro_o, rd_o, h,
            i, scene.inst_material[i], active, any_hit=any_hit,
        )
        return h, None

    if only_instance is not None:
        hit, _ = step(hit, jnp.int32(only_instance))
        return hit
    # scan (not a Python loop) so the traversal while_loop compiles ONCE
    n_inst = scene.inst_shape.shape[0]
    hit, _ = jax.lax.scan(step, hit, jnp.arange(n_inst, dtype=jnp.int32))
    return hit


def intersect_brute_force(scene, ro, rd) -> Hit:
    """Reference-check intersector: test every triangle of every instance.

    Validates the BVH traversal in tests; O(rays * tris) per instance.
    """
    R = ro.shape[0]
    hit = Hit.none((R,))
    T = scene.tri_pos.shape[0]
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    n_inst = scene.inst_shape.shape[0]

    def step(hit, i):
        inv = scene.inst_inv_transform[i]
        ro_o = transform_point(inv, ro)
        rd_o = transform_vector(inv, rd)
        s = scene.inst_shape[i]
        t_start = scene.shape_tri_start[s]
        t_count = scene.shape_tri_count[s]
        own = (tri_ids >= t_start) & (tri_ids < t_start + t_count)      # (T,)
        v = scene.tri_pos                                               # (T,3,3)
        t, u, vv, m = ray_triangle(
            ro_o[:, None, :], rd_o[:, None, :],
            v[None, :, 0, :], v[None, :, 1, :], v[None, :, 2, :],
        )
        t = jnp.where(own[None, :] & m, t, MAX_LENGTH)                  # (R,T)
        jbest = jnp.argmin(t, axis=-1)
        tbest = jnp.take_along_axis(t, jbest[:, None], axis=-1)[:, 0]
        closer = tbest < hit.dist
        sel = lambda a: jnp.take_along_axis(a, jbest[:, None], axis=-1)[:, 0]
        hit = Hit(
            dist=jnp.where(closer, tbest, hit.dist),
            u=jnp.where(closer, sel(u), hit.u),
            v=jnp.where(closer, sel(vv), hit.v),
            prim=jnp.where(closer, jbest.astype(jnp.int32), hit.prim),
            instance=jnp.where(closer, i, hit.instance),
            material=jnp.where(closer, scene.inst_material[i], hit.material),
        )
        return hit, None

    hit, _ = jax.lax.scan(step, hit, jnp.arange(n_inst, dtype=jnp.int32))
    return hit
