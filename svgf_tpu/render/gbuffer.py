"""G-buffer primary-visibility pass.

The reference rasterizes 4 MRT targets in OpenGL (resources/shaders/
GBuffer.{vert,frag}, App.cu:378-413). On TPU we produce the identical
channels by casting primary rays at pixel centers — same position/normal/
barycentric/instance targets, motion vectors from reprojecting the hit
through the previous camera (PrevMVP semantics, GBuffer.frag:62-71), and
screen-space depth derivatives (the dFdx/dFdy analogue).

Conventions: pixel rows top-down; motion = (prev_pixel - cur_pixel) in
(x, y) pixels, so reprojection is prev = cur + motion (Filter.cuh:232).
Object motion is NOT tracked (the reference builds PrevMVP from the
*current* instance transform, App.cu:392 — camera motion only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from svgf_tpu.ops.geometry import MAX_LENGTH, normalize, transform_point, transform_vector
from svgf_tpu.ops.intersect import Hit, intersect_scene
from svgf_tpu.ops.lights import _interp
from svgf_tpu.render.types import GBuffer


def camera_rays(cam_frame, cam_proj, h: int, w: int, jitter=None,
                row0=0, h_total=None):
    """Primary rays through pixel centers (+ optional per-pixel jitter).

    Matches reference GetRay (Common.cuh:333-343): unproject NDC through the
    inverse projection, transform by the camera frame. With glm::perspective
    this reduces to dir_cam = ((2u-1)/P00, (2v-1)/P11, -1).

    row0/h_total support row-band rendering on a sharded mesh: rays are for
    global rows [row0, row0+h) of an h_total-row image.
    """
    if h_total is None:
        h_total = h
    r = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + row0
    c = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    if jitter is None:
        jx = jy = 0.0
    else:
        jx, jy = jitter[..., 0], jitter[..., 1]
    u = (c + 0.5 + jx) / w
    v = 1.0 - (r + 0.5 + jy) / h_total     # NDC y is up
    x = (2.0 * u - 1.0) / cam_proj[0, 0]
    y = (2.0 * v - 1.0) / cam_proj[1, 1]
    d = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    d = normalize(d)
    rd = jnp.einsum("ij,hwj->hwi", cam_frame[:3, :3], d)
    ro = jnp.broadcast_to(cam_frame[:3, 3], (h, w, 3))
    return ro.reshape(-1, 3), rd.reshape(-1, 3)


def project_to_pixel(cam_frame, cam_proj, pos, h: int, w: int):
    """World position -> (px, py) pixel coords (y down), perspective divide."""
    view = jnp.linalg.inv(cam_frame)
    p_view = transform_point(view, pos)
    clip = jnp.einsum("ij,...j->...i", cam_proj[:3, :3], p_view) + cam_proj[:3, 3]
    wc = -p_view[..., 2]  # P[3] row = (0,0,-1,0)
    ndc = clip[..., :2] / jnp.where(jnp.abs(wc) < 1e-20, 1e-20, wc)[..., None]
    px = (ndc[..., 0] + 1.0) * 0.5 * w
    py = (1.0 - ndc[..., 1]) * 0.5 * h
    return px, py


def raster_gbuffer(scene, cam_idx: int, h: int, w: int, row0=0, h_total=None) -> GBuffer:
    """Trace primary visibility and fill every G-buffer channel.

    row0/h_total render only the row band [row0, row0+h) of an h_total-row
    image (sharded mesh path)."""
    if h_total is None:
        h_total = h
    frame = scene.cam_frame[cam_idx]
    prev_frame = scene.cam_prev_frame[cam_idx]
    proj = scene.cam_proj[cam_idx]
    ro, rd = camera_rays(frame, proj, h, w, row0=row0, h_total=h_total)
    hit: Hit = intersect_scene(scene, ro, rd)
    ok = hit.dist < MAX_LENGTH

    prim = jnp.clip(hit.prim, 0, scene.tri_pos.shape[0] - 1)
    inst = jnp.clip(hit.instance, 0, scene.inst_shape.shape[0] - 1)
    pos_obj = _interp(scene.tri_pos, prim, hit.u, hit.v)
    pos = transform_point(scene.inst_transform[inst], pos_obj)
    nrm_obj = _interp(scene.tri_nrm, prim, hit.u, hit.v)
    nrm = normalize(transform_vector(scene.inst_normal_transform[inst], nrm_obj))

    cam_pos = frame[:3, 3]
    depth = jnp.linalg.norm(pos - cam_pos, axis=-1)

    px_cur, py_cur = project_to_pixel(frame, proj, pos, h_total, w)
    px_prev, py_prev = project_to_pixel(prev_frame, proj, pos, h_total, w)
    motion = jnp.stack([px_prev - px_cur, py_prev - py_cur], axis=-1)

    z = jnp.where(ok, depth, 0.0).reshape(h, w)
    # dFdx/dFdy analogue: forward differences, clamped at the border
    dzx = jnp.abs(jnp.diff(z, axis=1, append=z[:, -1:]))
    dzy = jnp.abs(jnp.diff(z, axis=0, append=z[-1:, :]))
    depth_deriv = jnp.maximum(dzx, dzy)

    okf = ok[..., None]
    return GBuffer(
        position=jnp.where(okf, pos, 0.0).reshape(h, w, 3),
        normal=jnp.where(okf, nrm, 0.0).reshape(h, w, 3),
        motion=jnp.where(okf, motion, 0.0).reshape(h, w, 2),
        depth=z,
        depth_deriv=jnp.where(ok.reshape(h, w), depth_deriv, 0.0),
        uv=jnp.where(ok[..., None], jnp.stack([hit.u, hit.v], -1), 0.0).reshape(h, w, 2),
        instance=jnp.where(ok, hit.instance, -1).reshape(h, w),
        prim=jnp.where(ok, hit.prim, -1).reshape(h, w),
        material=jnp.where(ok, hit.material, -1).reshape(h, w),
    )


def gbuffer_first_hit(gbuf: GBuffer) -> Hit:
    """MakeFirstIsect (Common.cuh:1542-1568): rebuild the primary-hit record
    from G-buffer channels; empty pixels get a MAX_LENGTH miss."""
    ok = (gbuf.instance >= 0).reshape(-1)
    return Hit(
        dist=jnp.where(ok, gbuf.depth.reshape(-1), MAX_LENGTH).astype(jnp.float32),
        u=gbuf.uv[..., 0].reshape(-1).astype(jnp.float32),
        v=gbuf.uv[..., 1].reshape(-1).astype(jnp.float32),
        prim=jnp.where(ok, gbuf.prim.reshape(-1), 0).astype(jnp.int32),
        instance=jnp.where(ok, gbuf.instance.reshape(-1), 0).astype(jnp.int32),
        material=jnp.where(ok, gbuf.material.reshape(-1), 0).astype(jnp.int32),
    )
