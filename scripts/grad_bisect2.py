"""Bisect WITHIN _bounce_mis: grads of each intermediate w.r.t. cam_frame.
Usage: JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/grad_bisect2.py
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from svgf_tpu.ops import bsdf as B
from svgf_tpu.ops.intersect import intersect_scene
from svgf_tpu.ops.lights import sample_lights, sample_lights_pdf_from_hit
from svgf_tpu.ops.sampling import RngStream, power_heuristic
from svgf_tpu.render.gbuffer import camera_rays
from svgf_tpu.render.pathtrace import (
    _emission_at_hit,
    _handle_miss,
    _offset_origin,
    _shading_point,
    PathState,
)
from svgf_tpu.ops.geometry import MAX_LENGTH
from svgf_tpu.scenes.cornell import cornell_box

W, H = 24, 16
scene0 = cornell_box()
scene0.cameras[0].aspect = W / H
arrays = scene0.flatten()
cam = 0
key = jax.random.key(0)


def stage(cf, upto):
    sc = dataclasses.replace(arrays, cam_frame=cf)
    ro, rd = camera_rays(sc.cam_frame[cam], sc.cam_proj[cam], H, W)
    R = ro.shape[0]
    if upto == "rays":
        return jnp.mean(rd ** 2)
    hit = intersect_scene(sc, ro, rd)
    if upto == "hit_t":
        return jnp.mean(jnp.where(hit.dist < MAX_LENGTH, hit.dist, 0.0))
    if upto == "hit_uv":
        return jnp.mean(hit.u ** 2 + hit.v ** 2)
    outgoing = -rd
    sh = _shading_point(sc, hit, outgoing)
    if upto == "sh_pos":
        return jnp.mean(sh.position ** 2)
    if upto == "sh_nrm":
        return jnp.mean(sh.normal ** 2)
    mp, normal, position = sh.mp, sh.normal, sh.position
    emit = B.eval_emission(mp, normal, outgoing)
    if upto == "emit":
        return jnp.mean(emit)
    rng = RngStream(jax.random.fold_in(key, 0))
    dir_l = sample_lights(
        sc, position, rng.uniform((R,)), rng.uniform((R,)), rng.uniform2((R,))
    )
    if upto == "dir_l":
        return jnp.mean(dir_l ** 2)
    l_zero = jnp.all(dir_l == 0.0, axis=-1)
    shifted_l = _offset_origin(position, normal, dir_l)
    bsdf_l = B.eval_bsdf_cos(mp, normal, outgoing, dir_l)
    if upto == "bsdf_l":
        return jnp.mean(bsdf_l)
    shade = hit.dist < MAX_LENGTH
    delta = B.is_delta(mp)
    pre_l = shade & ~delta & ~l_zero & jnp.any(bsdf_l != 0.0, axis=-1)
    shadow = intersect_scene(sc, shifted_l, dir_l, active=pre_l)
    lpdf_l = sample_lights_pdf_from_hit(sc, shifted_l, dir_l, shadow)
    if upto == "lpdf_l":
        return jnp.mean(lpdf_l)
    bpdf_l = B.sample_bsdf_cos_pdf(mp, normal, outgoing, dir_l)
    if upto == "bpdf_l":
        return jnp.mean(bpdf_l)
    safe_l = lpdf_l > 0
    misw_l = jnp.where(safe_l, power_heuristic(lpdf_l, bpdf_l), 0.0) / jnp.where(
        safe_l, jnp.maximum(lpdf_l, 1e-20), 1.0
    )
    if upto == "misw_l":
        return jnp.mean(misw_l)
    nee_ok = pre_l & safe_l & (misw_l != 0)
    emis_hit = _emission_at_hit(sc, shadow, -dir_l)
    if upto == "emis_hit":
        return jnp.mean(emis_hit)
    nee = jnp.where(nee_ok[..., None], bsdf_l * emis_hit * misw_l[..., None], 0.0)
    if upto == "nee":
        return jnp.mean(nee)
    # bsdf branch
    dir_b = B.sample_bsdf_cos(mp, normal, outgoing, rng.uniform((R,)), rng.uniform2((R,)))
    if upto == "dir_b":
        return jnp.mean(dir_b ** 2)
    b_zero = jnp.all(dir_b == 0.0, axis=-1)
    shifted_b = _offset_origin(position, normal, dir_b)
    bsdf_b = B.eval_bsdf_cos(mp, normal, outgoing, dir_b)
    bpdf_b = B.sample_bsdf_cos_pdf(mp, normal, outgoing, dir_b)
    if upto == "bpdf_b":
        return jnp.mean(bpdf_b) + jnp.mean(bsdf_b)
    pre_b = shade & ~delta & ~l_zero & ~b_zero & (bpdf_b > 0) & jnp.any(bsdf_b != 0.0, axis=-1)
    mis_hit = intersect_scene(sc, shifted_b, dir_b, active=pre_b)
    lpdf_b = sample_lights_pdf_from_hit(sc, shifted_b, dir_b, mis_hit)
    if upto == "lpdf_b":
        return jnp.mean(lpdf_b)
    safe_b = bpdf_b > 0
    misw_b = jnp.where(safe_b, power_heuristic(bpdf_b, lpdf_b), 0.0) / jnp.where(
        safe_b, jnp.maximum(bpdf_b, 1e-20), 1.0
    )
    if upto == "misw_b":
        return jnp.mean(misw_b)
    hm = jnp.clip(mis_hit.material, 0, sc.mat_type.shape[0] - 1)
    emis_b = jnp.where((mis_hit.dist >= MAX_LENGTH)[..., None], 0.0, sc.mat_emission[hm])
    mis_cond = pre_b & (misw_b != 0)
    misr = jnp.where(mis_cond[..., None], bsdf_b * emis_b * misw_b[..., None], 0.0)
    if upto == "mis":
        return jnp.mean(misr)
    # delta branch
    dir_d = B.sample_delta(mp, normal, outgoing, rng.uniform((R,)))
    pdf_d = B.sample_delta_pdf(mp, normal, outgoing, dir_d)
    w_delta = B.eval_delta(mp, normal, outgoing, dir_d) / jnp.maximum(pdf_d, 1e-20)[..., None]
    if upto == "delta":
        return jnp.mean(w_delta)
    raise ValueError(upto)


for name in ["rays", "hit_t", "hit_uv", "sh_pos", "sh_nrm", "emit", "dir_l",
             "bsdf_l", "lpdf_l", "bpdf_l", "misw_l", "emis_hit", "nee",
             "dir_b", "bpdf_b", "lpdf_b", "misw_b", "mis", "delta"]:
    g = jax.jit(jax.grad(lambda cf, n=name: stage(cf, n)))(arrays.cam_frame)
    g = np.asarray(g)
    fin = np.isfinite(g).all()
    mx = np.abs(g[np.isfinite(g)]).max() if np.isfinite(g).any() else float("nan")
    print(f"{name:10s} finite={fin}  |g|max={mx:.3g}")
