"""Device-side scene-texture sampling + normal mapping.

Reproduces the reference's texture machinery (src/Common.cuh:1327-1418):

  * `sample_texture` = textureSample (Common.cuh:1329-1354): negative
    coords mirrored as 1-x, fractional wrap, NEAREST texel (the reference
    fetches uchar4 at integer coords — no filtering), value / 255.
  * `eval_texture` = EvalTexture (Common.cuh:1386-1394): INVALID_ID slots
    return vec4(1); optional sRGB->linear transfer on rgb only (ToLinear,
    Common.cuh:189-211). NOTE the reference STUBS the actual fetch to
    vec4(1) (Common.cuh:1391, README "doesn't really work with textured
    meshes") — that parity default lives in Scene.flatten(): a scene
    flattened with textures_enabled=False never calls into this module.
  * `apply_normal_map` = EvalNormalMap (Common.cuh:1405-1418) with the
    tangent-frame construction of PathTrace.cuh:182-185 (including its
    quirk: the bitangent crosses the WORLD normal with the OBJECT-space
    tangent before transforming).

All functions are batched over shading lanes; texture ids are gathered
per lane so one mixed batch samples every material's textures in lockstep.
"""

from __future__ import annotations

import jax.numpy as jnp

INVALID_ID = -1


def to_linear(rgb):
    """sRGB -> linear transfer (Common.cuh:189-192)."""
    return jnp.where(
        rgb <= 0.04045,
        rgb / 12.92,
        ((jnp.maximum(rgb, 0.04045) + 0.055) / 1.055) ** 2.4,
    )


def _wrap(c):
    """textureSample coord wrap (Common.cuh:1333-1337): negatives mirrored
    as 1-c, then fractional part."""
    c = jnp.where(c < 0.0, 1.0 - c, c)
    return c - jnp.floor(c)


def sample_texture(textures, tex_id, uv):
    """Nearest-texel fetch from the (K, S, S, 4) uint8 stack -> (R, 4) f32.

    tex_id: (R,) i32 (may be INVALID_ID — caller masks). uv: (R, 2).
    """
    k, h, w = textures.shape[0], textures.shape[1], textures.shape[2]
    u = _wrap(uv[..., 0])
    v = _wrap(uv[..., 1])
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    layer = jnp.clip(tex_id, 0, k - 1)
    texel = textures[layer, y, x]  # (R, 4) u8
    return texel.astype(jnp.float32) / 255.0


def eval_texture(textures, tex_id, uv, linear: bool):
    """EvalTexture (Common.cuh:1386-1394): vec4(1) for INVALID_ID slots,
    optional sRGB->linear on rgb (alpha untouched, Common.cuh:204-211)."""
    val = sample_texture(textures, tex_id, uv)
    if linear:
        val = jnp.concatenate([to_linear(val[..., :3]), val[..., 3:4]], axis=-1)
    has = (tex_id >= 0)[..., None]
    return jnp.where(has, val, 1.0)


def apply_normal_map(textures, normal_tex_id, uv, normal_world, tangent_obj,
                     normal_transform, transform_direction_fn, normalize_fn):
    """EvalNormalMap (Common.cuh:1405-1418) + the PathTrace.cuh:182-185
    tangent frame (TransformDirection normalizes, Common.cuh:305-309):

        T  = TransformDirection(NormalTransform, tangent.xyz)
        B  = TransformDirection(NormalTransform,
                 normalize(cross(N_world, tangent.xyz) * tangent.w))
        n' = normalize(TBN @ normalize(2*tex - 1))       for textured lanes

    normal_world: (R,3) world-space interpolated normal; tangent_obj: (R,4)
    object-space interpolated tangent+handedness; normal_transform: (R,4,4)
    per-lane inverse-transpose instance matrices.
    """
    t_obj = tangent_obj[..., :3]
    w = tangent_obj[..., 3:4]
    T = transform_direction_fn(normal_transform, t_obj)
    b_obj = normalize_fn(jnp.cross(normal_world, t_obj) * w)
    B = transform_direction_fn(normal_transform, b_obj)

    ntex = eval_texture(textures, normal_tex_id, uv, linear=False)[..., :3]
    local = normalize_fn(2.0 * ntex - 1.0)
    mapped = normalize_fn(
        T * local[..., 0:1] + B * local[..., 1:2] + normal_world * local[..., 2:3]
    )
    has = (normal_tex_id >= 0)[..., None]
    return jnp.where(has, mapped, normal_world)
