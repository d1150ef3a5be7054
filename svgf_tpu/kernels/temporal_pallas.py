"""Pallas TPU kernel for the SVGF temporal filter (Filter.cuh:359-404).

Why a kernel: reprojection is a per-pixel 2D gather at `pixel + motion`
(LoadPreviousData, Filter.cuh:230-232). XLA lowers arbitrary gathers on TPU
to a scalar loop — measured 57 ms for the 11-channel packed gather at 1080p
on v5e, i.e. ~98% of the whole temporal stage. Mosaic *does* have a fast
register-level dynamic gather (`take_along_axis` within a 128-lane window),
so this kernel restructures reprojection around it:

  * motion is bounded to (BOUND_Y, BOUND_X) = (8, 63) pixels/frame
    (config.reproject_max_motion); larger motion is treated as a
    disocclusion — those pixels would almost always fail the depth/normal
    tests anyway, and the XLA fallback keeps the exact unbounded gather;
  * each tile DMAs a (±8 row, ±64 col) halo-extended block of the 11 packed
    previous-frame planes into VMEM once;
  * for each row offset dy in [-8, 8] the column gather is a
    destination-indexed lane-gather over two adjacent 128-lane windows
    (index = col + mx + 64 spans [1, 254] — always exactly two windows);
    results are merged by a `my == dy` select.  All indices are the
    destination pixel's own, so there is no gather decomposition crossing.
  * a per-tile dynamic [min(my), max(my)] range skips dy values no pixel in
    the tile uses — for smooth camera motion only 2-3 of the 17 row offsets
    run.

The EMA / moments / validity math (the rest of the reference kernel) runs
on the gathered registers in the same kernel, so previous-frame state is
read from HBM exactly once.

Matches render.svgf.temporal_filter bit-for-bit (up to float reassociation)
for pixels whose motion is within the bound; tested in tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svgf_tpu.render.svgf import INVALID_DEPTH

_LUM = (0.2126, 0.7152, 0.0722)

BOUND_Y = 8    # max |row motion| per frame (sublane halo)
BOUND_X = 63   # max |col motion| per frame (lane halo 64)

# packed previous-frame plane indices
_P_DEPTH, _P_INST, _P_NX, _P_NY, _P_NZ = 0, 1, 2, 3, 4
_P_R, _P_G, _P_B, _P_HIST, _P_M1, _P_M2 = 5, 6, 7, 8, 9, 10
N_PREV = 11

TILE_H = 128
TILE_W = 256


def _temporal_kernel(row0_ref, prev_hbm, cur, out, scratch, acc, sem,
                     *, th, tw, h_img, w_img, h_prev,
                     depth_threshold, normal_threshold, history_base_length):
    """cur planes: 0-2 radiance rgb, 3 depth, 4 instance, 5-7 normal,
    8-9 motion x/y. out planes: 0-2 rgb EMA, 3 variance, 4-5 moments,
    6 history, 7 valid. row0_ref: (1, 1) i32 SMEM — the band's global first
    row (TRACED under shard_map: jax.lax.axis_index * band height)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = row0_ref[0, 0]

    copy = pltpu.make_async_copy(
        prev_hbm.at[:, pl.ds(i * th, th + 2 * BOUND_Y), pl.ds(j * tw, tw + 128)],
        scratch, sem,
    )
    copy.start()

    # destination-pixel global coordinates (this tile)
    r_l = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
    c_l = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    r_g = r_l + i * th + row0
    c_g = c_l + j * tw

    # ivec2 cast truncates toward zero (Filter.cuh:232); motion is (x, y)
    mx = cur[8].astype(jnp.int32)
    my = cur[9].astype(jnp.int32)
    px = c_g + mx
    py = r_g + my
    on_screen = (px >= 0) & (px < w_img) & (py >= 0) & (py < h_prev)
    in_bound = (my >= -BOUND_Y) & (my <= BOUND_Y) & (mx >= -BOUND_X) & (mx <= BOUND_X)
    gatherable = on_screen & in_bound

    myc = jnp.clip(my, -BOUND_Y, BOUND_Y)
    my_min = jnp.min(jnp.where(gatherable, myc, BOUND_Y))
    my_max = jnp.max(jnp.where(gatherable, myc, -BOUND_Y))

    copy.wait()

    acc[...] = jnp.zeros((N_PREV, th, tw), jnp.float32)
    for k in range(tw // 128):
        ck = slice(k * 128, (k + 1) * 128)
        # lane index relative to this chunk's two source windows
        rel = (
            jax.lax.broadcasted_iota(jnp.int32, (th, 128), 1)
            + 64
            + jnp.clip(mx[:, ck], -BOUND_X, BOUND_X)
        )
        use_w1 = rel >= 128
        idx0 = jnp.clip(rel, 0, 127)
        idx1 = jnp.clip(rel - 128, 0, 127)
        for dy in range(-BOUND_Y, BOUND_Y + 1):

            @pl.when((dy >= my_min) & (dy <= my_max))
            def _(dy=dy, ck=ck, idx0=idx0, idx1=idx1, use_w1=use_w1):
                mask = myc[:, ck] == dy
                r0 = BOUND_Y + dy
                for ch in range(N_PREV):
                    g0 = jnp.take_along_axis(
                        scratch[ch, r0 : r0 + th, k * 128 : k * 128 + 128],
                        idx0, axis=-1,
                    )
                    g1 = jnp.take_along_axis(
                        scratch[ch, r0 : r0 + th, k * 128 + 128 : k * 128 + 256],
                        idx1, axis=-1,
                    )
                    g = jnp.where(use_w1, g1, g0)
                    acc[ch, :, ck] = jnp.where(mask, g, acc[ch, :, ck])

    # ---- temporal math (Filter.cuh:359-404) on gathered registers ----
    cur_rgb = [jnp.clip(cur[c], 0.0, 1.0) for c in range(3)]

    z_cur = cur[3]
    z_cur = jnp.where(z_cur == 0.0, INVALID_DEPTH, z_cur)
    z_prev = acc[_P_DEPTH]
    z_prev = jnp.where(z_prev == 0.0, INVALID_DEPTH, z_prev)
    depth_ok = jnp.abs(z_prev - z_cur) <= depth_threshold
    mesh_ok = cur[4] == acc[_P_INST]
    ndot = cur[5] * acc[_P_NX] + cur[6] * acc[_P_NY] + cur[7] * acc[_P_NZ]
    normal_ok = ndot >= normal_threshold
    valid = gatherable & depth_ok & mesh_ok & normal_ok

    hist_prev = acc[_P_HIST]
    history = jnp.where(
        valid, jnp.minimum(float(history_base_length), hist_prev + 1.0), 1.0
    )
    alpha = jnp.where(valid, 1.0 / history, 1.0)

    lum = _LUM[0] * cur_rgb[0] + _LUM[1] * cur_rgb[1] + _LUM[2] * cur_rgb[2]
    m1p = jnp.where(valid, acc[_P_M1], 0.0)
    m2p = jnp.where(valid, acc[_P_M2], 0.0)
    m1 = m1p + (lum - m1p) * alpha
    m2 = m2p + (lum * lum - m2p) * alpha
    variance = jnp.maximum(0.0, m2 - m1 * m1)

    for c, pch in enumerate((_P_R, _P_G, _P_B)):
        pc = jnp.where(valid, jnp.clip(acc[pch], 0.0, 1.0), 0.0)
        out[c] = jnp.clip(pc + (cur_rgb[c] - pc) * alpha, 0.0, 1.0)
    out[3] = jnp.clip(variance, 0.0, 1.0)
    out[4] = m1
    out[5] = m2
    out[6] = history
    out[7] = valid.astype(jnp.float32)


def pack_prev_planes(prev_color, prev_gbuf, prev_moments, prev_history):
    """Stack previous-frame state into the (11, H, W) f32 layout the kernel
    gathers from (see _P_* indices)."""
    return jnp.stack(
        [
            prev_gbuf.depth.astype(jnp.float32),
            prev_gbuf.instance.astype(jnp.float32),
            prev_gbuf.normal[..., 0].astype(jnp.float32),
            prev_gbuf.normal[..., 1].astype(jnp.float32),
            prev_gbuf.normal[..., 2].astype(jnp.float32),
            prev_color[..., 0].astype(jnp.float32),
            prev_color[..., 1].astype(jnp.float32),
            prev_color[..., 2].astype(jnp.float32),
            prev_history.astype(jnp.float32),
            prev_moments[..., 0].astype(jnp.float32),
            prev_moments[..., 1].astype(jnp.float32),
        ],
        axis=0,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth_threshold", "normal_threshold", "history_base_length",
        "h_total", "band_halo", "interpret",
    ),
)
def temporal_filter_pallas(
    current,        # (H, W, >=3) current 1spp radiance
    prev_packed,    # (11, Hp, W) packed previous state, pack_prev_planes().
                    # Hp == h_total (single chip, band_halo=False) or
                    # band + 2*BOUND_Y halo rows (sharded path,
                    # band_halo=True; first row = global row0 - BOUND_Y,
                    # zero-filled outside the frame)
    gbuf,           # current GBuffer (depth/instance/normal/motion used)
    depth_threshold: float,
    normal_threshold: float,
    history_base_length: int,
    row0=0,
    h_total: int | None = None,
    band_halo: bool = False,
    interpret: bool = False,
):
    """Drop-in Pallas replacement for svgf.temporal_filter (bounded motion).

    row0 may be a TRACED i32 (sharded bands: jax.lax.axis_index * band
    height) — it reaches the kernel as an SMEM scalar, not a compile-time
    constant. Returns a TemporalResult-compatible tuple
    (color (H,W,4), moments (H,W,2), history i32 (H,W), valid bool (H,W)).
    """
    from svgf_tpu.render.svgf import TemporalResult

    h, w = current.shape[:2]
    h_img = h_total if h_total is not None else h
    halo_rows = band_halo
    h_prev = h_img

    th, tw = TILE_H, TILE_W
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw

    cur_planes = jnp.stack(
        [
            current[..., 0].astype(jnp.float32),
            current[..., 1].astype(jnp.float32),
            current[..., 2].astype(jnp.float32),
            gbuf.depth.astype(jnp.float32),
            gbuf.instance.astype(jnp.float32),
            gbuf.normal[..., 0].astype(jnp.float32),
            gbuf.normal[..., 1].astype(jnp.float32),
            gbuf.normal[..., 2].astype(jnp.float32),
            gbuf.motion[..., 0].astype(jnp.float32),
            gbuf.motion[..., 1].astype(jnp.float32),
        ],
        axis=0,
    )
    cur_planes = jnp.pad(cur_planes, ((0, 0), (0, hp - h), (0, wp - w)))

    # prev planes: add the sublane halo if not already a band+halo layout,
    # plus the 64-col lane halo and tile round-up padding
    pad_top = 0 if halo_rows else BOUND_Y
    pad_bot = (hp - h) + (0 if halo_rows else BOUND_Y)
    prev_padded = jnp.pad(
        prev_packed.astype(jnp.float32),
        ((0, 0), (pad_top, pad_bot), (64, 64 + (wp - w))),
    )

    grid = (hp // th, wp // tw)
    # kernel coordinates: prev row 0 = global row (row0 - BOUND_Y)
    out = pl.pallas_call(
        functools.partial(
            _temporal_kernel,
            th=th, tw=tw, h_img=h_img, w_img=w, h_prev=h_prev,
            depth_threshold=depth_threshold,
            normal_threshold=normal_threshold,
            history_base_length=history_base_length,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (10, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_PREV, th + 2 * BOUND_Y, tw + 128), jnp.float32),
            pltpu.VMEM((N_PREV, th, tw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(row0, jnp.int32), (1, 1)), prev_padded, cur_planes)

    out = out[:, :h, :w]
    color = jnp.moveaxis(out[0:4], 0, -1)
    moments = jnp.moveaxis(out[4:6], 0, -1)
    history = out[6].astype(jnp.int32)
    valid = out[7] > 0.5
    return TemporalResult(color=color, moments=moments, history_len=history,
                          reprojected=valid)
