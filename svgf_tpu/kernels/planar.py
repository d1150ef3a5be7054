"""Planar filter chain — the zero-glue TPU fast path for SVGF.

Round-4 profiling showed the per-stage Pallas kernels spend most of their
wall-clock OUTSIDE the kernels: every stage re-packs (H, W, C) arrays into
channel-planar stacks, pads them, and un-packs its output (minor-dim
transposes are relayouts on TPU, ~0.3-1.4 ms each at 1080p). This module
keeps ONE canonical padded planar layout for the whole chain:

    (C, HPAD, WPAD) float32,  HPAD = roundup(H, TH) + 2*PAD_Y,
                              WPAD = roundup(W, TW) + 2*PAD_X

with zero padding. Zero NORMALS give out-of-image stencil taps weight 0,
reproducing the reference's inside-mask exclusion exactly (Filter.cuh:571);
the temporal kernel's explicit on-screen test covers reprojection; TAA's
edge-clamp semantics (imageLoad coordinate clamp, Filter.cuh:73-74) are
restored by in-kernel halo fix-ups at the image borders.

Per frame the ONLY layout changes are:
  * ONE pack of the current radiance+G-buffer into 11 planes (pack_current);
  * ONE unpack of the final sRGB image back to (H, W, 3).
Everything else — temporal EMA/reprojection, moments fallback, the whole
a-trous chain, TAA, and the next frame's temporal-state assembly — stays
planar. Cross-frame state is planar too (render.types.PlanarState): the
11-plane packed previous frame and the 4-plane TAA history, both stored at
config.state_dtype (the reference stores fp16, App.cu:763-773).

Stage semantics are IDENTICAL to the per-stage kernels in
temporal_pallas/moments_pallas/atrous_pallas/taa_pallas (which remain the
sharded band path and the semantic cross-check); parity is tested in
tests/test_planar.py against the XLA reference chain.

Reference mapping: temporal Filter.cuh:359-404, moments :430-525, a-trous
:527-624 + App.cu:491-514, TAA+sRGB :288-357.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svgf_tpu.kernels.atrous_pallas import _pow
from svgf_tpu.render.svgf import _KERNEL_1D, INVALID_DEPTH
from svgf_tpu.render.svgf import _YUV_DEC as _DEC
from svgf_tpu.render.svgf import _YUV_ENC as _ENC

_LUM = (0.2126, 0.7152, 0.0722)

PAD_Y = 40    # >= max a-trous row halo (32 at step 16) + sublane alignment
PAD_X = 128   # lane-aligned column pad (>= max col halo)
# tile-size caps; make_layout picks exact-fit divisors per resolution (at
# 1080p the naive 128x512 tiling pads 1080->1152 rows and 1920->2048 cols —
# 14% of every kernel's compute wasted on padding; 120x384 tiles fit exactly)
TH_CAP = 128
TW_CAP = 512

# current-frame plane indices (pack_current)
C_R, C_G, C_B, C_Z, C_ZD, C_NX, C_NY, C_NZ, C_INST, C_MX, C_MY = range(11)
N_CUR = 11
# previous-frame packed planes (same order as temporal_pallas._P_*)
P_Z, P_INST, P_NX, P_NY, P_NZ, P_R, P_G, P_B, P_HIST, P_M1, P_M2 = range(11)
N_PREV = 11
# temporal output planes
T_R, T_G, T_B, T_VAR, T_M1, T_M2, T_HIST, T_VALID = range(8)
N_TOUT = 8

BOUND_Y_MAX = 32   # row-motion bound ceiling (PAD_Y - 8, sublane-aligned)
BOUND_X_MAX = 127  # col-motion bound ceiling (gather spans 3 lane windows)


class Layout(NamedTuple):
    h: int
    w: int
    hp: int      # interior rows (multiple of th)
    wp: int      # interior cols (multiple of tw)
    hpad: int    # hp + 2*PAD_Y
    wpad: int    # wp + 2*PAD_X
    th: int      # tile rows (sublane-aligned divisor of hp)
    tw: int      # tile cols (lane-aligned divisor of wp)


def _pick_tile(n: int, unit: int, cap: int) -> tuple[int, int]:
    """(tile, padded) — the largest `unit`-aligned tile <= cap that divides
    the `unit`-rounded extent exactly (minimal padding; unit itself always
    divides, so a tile is always found)."""
    r = -(-n // unit) * unit
    for t in range(cap - cap % unit, unit - 1, -unit):
        if r % t == 0:
            return t, r
    return unit, r


def make_layout(h: int, w: int) -> Layout:
    th, hp = _pick_tile(h, 8, TH_CAP)
    tw, wp = _pick_tile(w, 128, TW_CAP)
    return Layout(h, w, hp, wp, hp + 2 * PAD_Y, wp + 2 * PAD_X, th, tw)


# ---------------------------------------------------------------------------
# Layout conversions (the only per-frame transposes)
# ---------------------------------------------------------------------------


def pack_current(radiance, gbuf, lo: Layout):
    """(H, W, 3) radiance + GBuffer -> (11, HPAD, WPAD) f32, zero-padded."""
    planes = jnp.stack(
        [
            radiance[..., 0].astype(jnp.float32),
            radiance[..., 1].astype(jnp.float32),
            radiance[..., 2].astype(jnp.float32),
            gbuf.depth.astype(jnp.float32),
            gbuf.depth_deriv.astype(jnp.float32),
            gbuf.normal[..., 0].astype(jnp.float32),
            gbuf.normal[..., 1].astype(jnp.float32),
            gbuf.normal[..., 2].astype(jnp.float32),
            gbuf.instance.astype(jnp.float32),
            gbuf.motion[..., 0].astype(jnp.float32),
            gbuf.motion[..., 1].astype(jnp.float32),
        ],
        axis=0,
    )
    return jnp.pad(
        planes,
        ((0, 0), (PAD_Y, lo.hpad - PAD_Y - lo.h), (PAD_X, lo.wpad - PAD_X - lo.w)),
    )


def pack_prev_from_state(color, prev_gbuf, moments, history_len, lo: Layout,
                         dtype=jnp.float32):
    """Legacy (H, W, C) temporal-state fields -> padded planar prev stack
    (fp16 pair-packed when dtype is float16, like assemble_prev).

    Used to ENTER the planar path (frame 0 / resumed legacy checkpoints);
    steady-state frames assemble prev from planar pieces (assemble_prev)."""
    planes = [
        prev_gbuf.depth.astype(jnp.float32),
        prev_gbuf.instance.astype(jnp.float32),
        prev_gbuf.normal[..., 0].astype(jnp.float32),
        prev_gbuf.normal[..., 1].astype(jnp.float32),
        prev_gbuf.normal[..., 2].astype(jnp.float32),
        color[..., 0].astype(jnp.float32),
        color[..., 1].astype(jnp.float32),
        color[..., 2].astype(jnp.float32),
        history_len.astype(jnp.float32),
        moments[..., 0].astype(jnp.float32),
        moments[..., 1].astype(jnp.float32),
    ]
    if jnp.dtype(dtype) == jnp.float16:
        stacked = pack_pairs_f16(planes)   # (6, H, W) f32 pairs
    else:
        stacked = jnp.stack(planes, axis=0).astype(dtype)
    return jnp.pad(
        stacked,
        ((0, 0), (PAD_Y, lo.hpad - PAD_Y - lo.h), (PAD_X, lo.wpad - PAD_X - lo.w)),
    )


def pack_taa_from_state(taa_history, lo: Layout, dtype=jnp.float32):
    planes = jnp.stack([taa_history[..., c].astype(jnp.float32) for c in range(4)])
    if jnp.dtype(dtype) == jnp.float16:
        planes = pack_pairs4_f16(planes)
    else:
        planes = planes.astype(dtype)
    return jnp.pad(
        planes,
        ((0, 0), (PAD_Y, lo.hpad - PAD_Y - lo.h), (PAD_X, lo.wpad - PAD_X - lo.w)),
    )


def assemble_prev(cur, tout, feedback_rgb, dtype):
    """Next frame's packed prev planes — pure planar plane copies, no
    transposes (the planar path's replacement for pack_prev_planes).

    dtype float16 -> the fp16 PAIR-PACKED (6, HPAD, WPAD) f32 layout (the
    temporal gather then moves 6 channels instead of 11 — reprojection is
    gather-bound); any other dtype -> plain (11, HPAD, WPAD) planes."""
    planes = [
        cur[C_Z], cur[C_INST],
        cur[C_NX], cur[C_NY], cur[C_NZ],
        feedback_rgb[0], feedback_rgb[1], feedback_rgb[2],
        tout[T_HIST], tout[T_M1], tout[T_M2],
    ]
    if jnp.dtype(dtype) == jnp.float16:
        return pack_pairs_f16(planes)
    return jnp.stack(planes, axis=0).astype(dtype)


# fp16 pair packing: two logical prev channels ride one f32 plane (low half
# = first channel — little-endian bitcast). The reference stores its
# temporal state fp16 too (App.cu:763-773), so the quantization is the same
# one the legacy fp16 state path applies; values are finite by construction
# (depth <= far plane 1000, colours/moments clamped, history <= 255,
# instance ids exact in fp16 up to 2048).
_PAIRS = ((P_Z, P_INST), (P_NX, P_NY), (P_NZ, P_HIST),
          (P_R, P_G), (P_B, P_M1), (P_M2, None))
N_PREV_PACKED = 6


def pack_pairs_f16(planes11):
    """11 (H, W)-plane list/array -> (6, H, W) f32 of packed fp16 pairs."""
    outs = []
    for a, b in _PAIRS:
        pa = planes11[a].astype(jnp.float16)
        pb = (
            planes11[b].astype(jnp.float16)
            if b is not None
            else jnp.zeros_like(pa)
        )
        outs.append(
            jax.lax.bitcast_convert_type(
                jnp.stack([pa, pb], axis=-1), jnp.float32
            )
        )
    return jnp.stack(outs, axis=0)


def _f16_bits_to_f32(b):
    """uint32 tensor of fp16 BIT PATTERNS (low 16 bits) -> exact f32 values.
    Subnormals handled exactly; inf/nan map to large finite values (inputs
    are finite by construction, see pack_pairs_f16)."""
    sign = (b & 0x8000) << 16
    expo = (b >> 10) & 0x1F
    mant = b & 0x3FF
    normal = jax.lax.bitcast_convert_type(
        (sign | ((expo + 112) << 23) | (mant << 13)).astype(jnp.uint32),
        jnp.float32,
    )
    sgn = jnp.where((b & 0x8000) > 0, -1.0, 1.0)
    # Mosaic has no uint32 -> f32 cast; mant fits in 10 bits, go via int32
    subnormal = mant.astype(jnp.int32).astype(jnp.float32) * (
        sgn * 5.9604644775390625e-8
    )
    return jnp.where(expo == 0, subnormal, normal)


def _unpack_f16_pair(g):
    """(..., ) f32 of packed pairs -> (first, second) f32 values."""
    u = jax.lax.bitcast_convert_type(g, jnp.uint32)
    return _f16_bits_to_f32(u & 0xFFFF), _f16_bits_to_f32(u >> 16)


def pack_pairs4_f16(p4):
    """(4, H, W) float planes -> (2, H, W) f32 fp16-pair planes ([r|g],
    [b|a]). Mosaic has no f16 VMEM type, so fp16-quantized state rides f32
    pair planes everywhere on the planar path."""
    def pair(a, b):
        return jax.lax.bitcast_convert_type(
            jnp.stack([a.astype(jnp.float16), b.astype(jnp.float16)], -1),
            jnp.float32,
        )

    return jnp.stack([pair(p4[0], p4[1]), pair(p4[2], p4[3])], axis=0)


def unpack_hwc(planes, lo: Layout, n: int | None = None):
    """(C, HPAD, WPAD) -> (H, W, C) crop + transpose (tap/product boundary)."""
    p = planes if n is None else planes[:n]
    return jnp.moveaxis(
        p[:, PAD_Y : PAD_Y + lo.h, PAD_X : PAD_X + lo.w], 0, -1
    )


def unpack_plane(planes, idx, lo: Layout):
    return planes[idx, PAD_Y : PAD_Y + lo.h, PAD_X : PAD_X + lo.w]


# ---------------------------------------------------------------------------
# Temporal filter (Filter.cuh:359-404) — planar kernel
# ---------------------------------------------------------------------------


def _temporal_planar_kernel_full(row0_ref, prev_hbm, cur_hbm, alias, out_hbm,
                                 pscr, cscr, acc, out_vmem,
                                 psem, csem, osem,
                                 *, th, tw, h_img, w_img, by, bx, base_off,
                                 depth_threshold, normal_threshold,
                                 history_base_length, nh, nw, packed):
    """One (th, tw) tile: bounded-motion reprojection gather + the full
    temporal math (see kernels.temporal_pallas for the gather design,
    re-laid for the canonical padded planar layout).

    base_off: the tile's column offset inside the prev DMA window. 64 when
    bx <= 63 (the wrapper hands a 64-col-shifted view of prev so the gather
    index iota+64+mx spans exactly TWO aligned 128-lane windows); 128 for
    the raised bound bx <= 127 (three windows)."""
    del alias
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * nw + j
    row0 = row0_ref[0, 0]
    erows = th + 2 * by
    n_win = 2 if base_off == 64 else 3

    def copies(slot, ti, tj):
        return (
            pltpu.make_async_copy(
                prev_hbm.at[:, pl.ds(PAD_Y - by + ti * th, erows),
                            pl.ds(tj * tw, tw + 2 * base_off)],
                pscr.at[slot], psem.at[slot],
            ),
            pltpu.make_async_copy(
                cur_hbm.at[:, pl.ds(PAD_Y + ti * th, th),
                           pl.ds(PAD_X + tj * tw, tw)],
                cscr.at[slot], csem.at[slot],
            ),
        )

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        for c in copies(0, i, j):
            c.start()

    for c in copies(slot, i, j):
        c.wait()

    @pl.when(t + 1 < nh * nw)
    def _():
        tn = t + 1
        for c in copies(jax.lax.rem(tn, 2), tn // nw, jax.lax.rem(tn, nw)):
            c.start()

    cur = cscr[slot]  # (11, th, tw) f32

    # destination-pixel global coordinates
    r_l = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
    c_l = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    r_g = r_l + i * th + row0
    c_g = c_l + j * tw

    # ivec2 cast truncates toward zero (Filter.cuh:232); motion is (x, y)
    mx = cur[C_MX].astype(jnp.int32)
    my = cur[C_MY].astype(jnp.int32)
    px = c_g + mx
    py = r_g + my
    on_screen = (px >= 0) & (px < w_img) & (py >= 0) & (py < h_img)
    in_bound = (my >= -by) & (my <= by) & (mx >= -bx) & (mx <= bx)
    gatherable = on_screen & in_bound

    myc = jnp.clip(my, -by, by)
    mxc = jnp.clip(mx, -bx, bx)
    my_min = jnp.min(jnp.where(gatherable, myc, by))
    my_max = jnp.max(jnp.where(gatherable, myc, -by))

    n_ch = N_PREV_PACKED if packed else N_PREV
    acc[...] = jnp.zeros((n_ch, th, tw), jnp.float32)
    for k in range(tw // 128):
        ck = slice(k * 128, (k + 1) * 128)
        # in-window lane index: tile col k*128 sits at window col
        # base_off + k*128; rel is relative to window base (k*128): spans
        # [base_off - bx, base_off + 127 + bx] -> n_win aligned windows
        rel = (
            jax.lax.broadcasted_iota(jnp.int32, (th, 128), 1)
            + base_off
            + mxc[:, ck]
        )
        win = [jnp.clip(rel - wv * 128, 0, 127) for wv in range(n_win)]
        if n_win == 2:
            use = [rel < 128, rel >= 128]
        else:
            use = [
                (rel >= wv * 128) & (rel < (wv + 1) * 128)
                for wv in range(n_win)
            ]
        for dy in range(-by, by + 1):

            @pl.when((dy >= my_min) & (dy <= my_max))
            def _(dy=dy, ck=ck, win=win, use=use):
                mask = myc[:, ck] == dy
                r0 = by + dy
                for ch in range(n_ch):
                    g = None
                    for wv in range(n_win):
                        gw = jnp.take_along_axis(
                            pscr[slot, ch, r0 : r0 + th,
                                 k * 128 + wv * 128 : k * 128 + (wv + 1) * 128]
                            .astype(jnp.float32),
                            win[wv], axis=-1,
                        )
                        g = gw if g is None else jnp.where(use[wv], gw, g)
                    acc[ch, :, ck] = jnp.where(mask, g, acc[ch, :, ck])

    # resolve the 11 logical prev channels (packed: unpack fp16 pairs ONCE
    # per tile — the gather above moved 6 channels instead of 11)
    if packed:
        pz, pinst = _unpack_f16_pair(acc[0])
        pnx, pny = _unpack_f16_pair(acc[1])
        pnz, phist = _unpack_f16_pair(acc[2])
        pr, pg = _unpack_f16_pair(acc[3])
        pb, pm1 = _unpack_f16_pair(acc[4])
        pm2, _ = _unpack_f16_pair(acc[5])
        pv = [pz, pinst, pnx, pny, pnz, pr, pg, pb, phist, pm1, pm2]
    else:
        pv = [acc[ch] for ch in range(N_PREV)]

    # ---- temporal math (Filter.cuh:359-404) ----
    cur_rgb = [jnp.clip(cur[c], 0.0, 1.0) for c in (C_R, C_G, C_B)]

    z_cur = cur[C_Z]
    z_cur = jnp.where(z_cur == 0.0, INVALID_DEPTH, z_cur)
    z_prev = pv[P_Z]
    z_prev = jnp.where(z_prev == 0.0, INVALID_DEPTH, z_prev)
    depth_ok = jnp.abs(z_prev - z_cur) <= depth_threshold
    mesh_ok = cur[C_INST] == pv[P_INST]
    ndot = (
        cur[C_NX] * pv[P_NX] + cur[C_NY] * pv[P_NY] + cur[C_NZ] * pv[P_NZ]
    )
    normal_ok = ndot >= normal_threshold
    valid = gatherable & depth_ok & mesh_ok & normal_ok

    hist_prev = pv[P_HIST]
    history = jnp.where(
        valid, jnp.minimum(float(history_base_length), hist_prev + 1.0), 1.0
    )
    alpha = jnp.where(valid, 1.0 / history, 1.0)

    lum = _LUM[0] * cur_rgb[0] + _LUM[1] * cur_rgb[1] + _LUM[2] * cur_rgb[2]
    m1p = jnp.where(valid, pv[P_M1], 0.0)
    m2p = jnp.where(valid, pv[P_M2], 0.0)
    m1 = m1p + (lum - m1p) * alpha
    m2 = m2p + (lum * lum - m2p) * alpha
    variance = jnp.maximum(0.0, m2 - m1 * m1)

    for c, pch in enumerate((P_R, P_G, P_B)):
        pc = jnp.where(valid, jnp.clip(pv[pch], 0.0, 1.0), 0.0)
        out_vmem[c] = jnp.clip(pc + (cur_rgb[c] - pc) * alpha, 0.0, 1.0)
    out_vmem[T_VAR] = jnp.clip(variance, 0.0, 1.0)
    out_vmem[T_M1] = m1
    out_vmem[T_M2] = m2
    out_vmem[T_HIST] = history
    out_vmem[T_VALID] = valid.astype(jnp.float32)

    wr = pltpu.make_async_copy(
        out_vmem,
        out_hbm.at[:, pl.ds(PAD_Y + i * th, th), pl.ds(PAD_X + j * tw, tw)],
        osem,
    )
    wr.start()
    wr.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "lo", "depth_threshold", "normal_threshold", "history_base_length",
        "bound", "interpret",
    ),
)
def temporal_planar(cur, prev, lo: Layout,
                    depth_threshold: float, normal_threshold: float,
                    history_base_length: int,
                    bound: tuple = (8, 63),
                    row0=0, interpret: bool = False):
    """cur: (11, HPAD, WPAD) f32; prev: (11, HPAD, WPAD) any float dtype OR
    the (6, HPAD, WPAD) fp16 pair-packed f32 form (assemble_prev with
    float16 — 6 gathered channels instead of 11).
    Returns (8, HPAD, WPAD) f32 (zero padding intact)."""
    by, bx = bound
    assert by % 8 == 0 or by == 8, "row bound must be sublane-aligned"
    assert 0 < by <= BOUND_Y_MAX and 0 < bx <= BOUND_X_MAX, (by, bx)
    packed = prev.shape[0] == N_PREV_PACKED
    n_ch = N_PREV_PACKED if packed else N_PREV
    # bx <= 63: hand the kernel a 64-col-shifted view of prev so the gather
    # index spans exactly TWO aligned lane windows (a third window costs
    # ~50% more gather work); the raised bound uses the canonical layout
    # and three windows.
    if bx <= 63:
        base_off = 64
        prev_in = prev[:, :, 64 : 64 + lo.wp + 128]
    else:
        base_off = PAD_X
        prev_in = prev
    nh, nw = lo.hp // lo.th, lo.wp // lo.tw
    out0 = jnp.zeros((N_TOUT, lo.hpad, lo.wpad), jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _temporal_planar_kernel_full,
            th=lo.th, tw=lo.tw, h_img=lo.h, w_img=lo.w, by=by, bx=bx,
            base_off=base_off,
            depth_threshold=depth_threshold,
            normal_threshold=normal_threshold,
            history_base_length=history_base_length, nh=nh, nw=nw,
            packed=packed,
        ),
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((N_TOUT, lo.hpad, lo.wpad), jnp.float32),
        input_output_aliases={3: 0},
        scratch_shapes=[
            pltpu.VMEM((2, n_ch, lo.th + 2 * by, lo.tw + 2 * base_off), prev.dtype),
            pltpu.VMEM((2, N_CUR, lo.th, lo.tw), jnp.float32),
            pltpu.VMEM((n_ch, lo.th, lo.tw), jnp.float32),
            pltpu.VMEM((N_TOUT, lo.th, lo.tw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(row0, jnp.int32), (1, 1)), prev_in, cur, out0)


# ---------------------------------------------------------------------------
# Moments fallback (Filter.cuh:430-525) — planar kernel
# ---------------------------------------------------------------------------

_RADIUS = 3


def _moments_planar_kernel(tout_hbm, cur_hbm, alias, out_hbm,
                           tscr, sscr, pre, out_vmem,
                           tsem, ssem, osem,
                           *, th, tw, gh, halo, phi_colour, phi_normal,
                           nh, nw):
    """Reads the temporal output (7 planes: rgb var m1 m2 hist) and the
    static planes cur[C_Z:C_NZ+1] (z zd nx ny nz) with an 8-row/128-col DMA
    halo; same 49-tap math + tile short-circuit as moments_pallas."""
    del alias
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * nw + j
    erows = th + 16
    ecols = tw + 2 * PAD_X
    ha = 8  # DMA halo rows (>= _RADIUS, sublane-aligned)

    def copies(slot, ti, tj):
        return (
            pltpu.make_async_copy(
                tout_hbm.at[0:7, pl.ds(PAD_Y - ha + ti * th, erows),
                            pl.ds(tj * tw, ecols)],
                tscr.at[slot], tsem.at[slot],
            ),
            pltpu.make_async_copy(
                cur_hbm.at[C_Z : C_NZ + 1,
                           pl.ds(PAD_Y - ha + ti * th, erows),
                           pl.ds(tj * tw, ecols)],
                sscr.at[slot], ssem.at[slot],
            ),
        )

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        for c in copies(0, i, j):
            c.start()

    for c in copies(slot, i, j):
        c.wait()

    @pl.when(t + 1 < nh * nw)
    def _():
        tn = t + 1
        for c in copies(jax.lax.rem(tn, 2), tn // nw, jax.lax.rem(tn, nw)):
            c.start()

    def tplane(k, dy=0, dx=0):
        return tscr[slot, k, ha + dy : ha + dy + th,
                    PAD_X + dx : PAD_X + dx + tw]

    def splane(k, dy=0, dx=0):
        return sscr[slot, k, ha + dy : ha + dy + th,
                    PAD_X + dx : PAD_X + dx + tw]

    hist = tplane(6)
    zc_raw = splane(0)
    invalid = zc_raw == 0.0
    fb_mask = (hist < 4.0) & ~invalid
    needs_fallback = jnp.any(fb_mask)

    # pass-through first (Filter.cuh:518-523); fallback sub-blocks overwrite
    out_vmem[0] = tplane(0)
    out_vmem[1] = tplane(1)
    out_vmem[2] = tplane(2)
    out_vmem[3] = tplane(3)

    @pl.when(needs_fallback)
    def _():
        # pre planes over the extended tile: 0-2 rgb raw, 3-4 moments,
        # 5 lum, 6 z fixed, 7-9 normal
        pre[0] = tscr[slot, 0]
        pre[1] = tscr[slot, 1]
        pre[2] = tscr[slot, 2]
        pre[3] = tscr[slot, 4]
        pre[4] = tscr[slot, 5]
        pre[5] = (
            _LUM[0] * tscr[slot, 0]
            + _LUM[1] * tscr[slot, 1]
            + _LUM[2] * tscr[slot, 2]
        )
        zr = sscr[slot, 0]
        pre[6] = jnp.where(zr == 0.0, 1e30, zr)
        pre[7] = sscr[slot, 2]
        pre[8] = sscr[slot, 3]
        pre[9] = sscr[slot, 4]

        # 49-tap fallback gated per ROW GROUP inside a fori_loop: temporal
        # rejections form thin horizontal silhouette strips + narrow
        # vertical disocclusion bands, so most row groups of a triggered
        # tile have no short-history pixel at all. A single traced loop
        # body (dynamic sublane offsets) avoids the code-bloat that made a
        # statically-unrolled sub-block variant SLOWER (r5 profile logs).
        inv_l = 1.0 / phi_colour

        # STATIC unroll over row groups: Mosaic requires statically
        # 8-aligned sublane offsets, and the +-3-row tap reads are
        # misaligned by construction — only static offsets may be so.
        def cell(g, s0):
            """49-tap fallback on one (gh x 128) cell — gated 2-D: thin
            horizontal silhouette strips activate one ROW group, narrow
            vertical disocclusion bands one COLUMN block, so most cells of
            a triggered tile skip entirely."""
            r0 = g * gh                       # tile-relative group start
            c0 = s0 * 128
            rows = slice(ha + r0, ha + r0 + gh)
            cols = slice(PAD_X + c0, PAD_X + c0 + 128)
            hist_g = tscr[slot, 6, rows, cols]
            z_g = sscr[slot, 0, rows, cols]
            use_g = (hist_g < 4.0) & ~(z_g == 0.0)

            @pl.when(jnp.any(use_g))
            def _():
                def ctr(k):
                    return pre[k, rows, cols]

                c_rgb = (ctr(0), ctr(1), ctr(2))
                # pre[3] is moment m1, NOT variance
                c_var = tscr[slot, 3, rows, cols]
                l_c = ctr(5)
                z_c = ctr(6)
                zd = sscr[slot, 1, rows, cols]
                n_c = (ctr(7), ctr(8), ctr(9))
                inv_pd = pl.reciprocal(jnp.maximum(zd, 1e-8) * 3.0,
                                       approx=False)
                inv_pd_d = {
                    d2: inv_pd * float(1.0 / d2 ** 0.5)
                    for d2 in (1, 2, 4, 5, 8, 9, 10, 13, 18)
                }

                sum_w = jnp.zeros((gh, 128), jnp.float32)
                acc = [jnp.zeros((gh, 128), jnp.float32) for _ in range(5)]

                for dy in range(-_RADIUS, _RADIUS + 1):

                    def sp(k, dx, dy=dy):
                        return pre[k, ha + r0 + dy : ha + r0 + dy + gh,
                                   PAD_X + c0 + dx : PAD_X + c0 + dx + 128]

                    for dx in range(-_RADIUS, _RADIUS + 1):
                        l_p = sp(5, dx)
                        z_p = sp(6, dx)
                        ndot = (
                            n_c[0] * sp(7, dx) + n_c[1] * sp(8, dx)
                            + n_c[2] * sp(9, dx)
                        )
                        w_n = _pow(jnp.clip(ndot, 0.0, 1.0), phi_normal)
                        if dx == 0 and dy == 0:
                            w_z = jnp.zeros((gh, 128), jnp.float32)
                        else:
                            w_z = jnp.abs(z_c - z_p) * inv_pd_d[
                                dx * dx + dy * dy
                            ]
                        w_l = jnp.abs(l_c - l_p) * inv_l
                        w = jnp.exp(-w_l - w_z) * w_n
                        sum_w = sum_w + w
                        acc[0] = acc[0] + w * sp(0, dx)
                        acc[1] = acc[1] + w * sp(1, dx)
                        acc[2] = acc[2] + w * sp(2, dx)
                        acc[3] = acc[3] + w * sp(3, dx)
                        acc[4] = acc[4] + w * sp(4, dx)

                inv = pl.reciprocal(jnp.maximum(sum_w, 1e-6), approx=False)
                f_m0 = acc[3] * inv
                f_m1 = acc[4] * inv
                variance = (f_m1 - f_m0 * f_m0) * (
                    4.0 / jnp.maximum(hist_g, 1.0)
                )

                out_vmem[0, r0 : r0 + gh, c0 : c0 + 128] = jnp.where(
                    use_g, acc[0] * inv, c_rgb[0]
                )
                out_vmem[1, r0 : r0 + gh, c0 : c0 + 128] = jnp.where(
                    use_g, acc[1] * inv, c_rgb[1]
                )
                out_vmem[2, r0 : r0 + gh, c0 : c0 + 128] = jnp.where(
                    use_g, acc[2] * inv, c_rgb[2]
                )
                out_vmem[3, r0 : r0 + gh, c0 : c0 + 128] = jnp.where(
                    use_g, variance, c_var
                )

        for g in range(th // gh):
            for s0 in range(tw // 128):
                cell(g, s0)

    wr = pltpu.make_async_copy(
        out_vmem,
        out_hbm.at[:, pl.ds(PAD_Y + i * th, th), pl.ds(PAD_X + j * tw, tw)],
        osem,
    )
    wr.start()
    wr.wait()


@functools.partial(
    jax.jit, static_argnames=("lo", "phi_colour", "phi_normal", "interpret")
)
def moments_planar(tout, cur, lo: Layout, phi_colour: float,
                   phi_normal: float, interpret: bool = False):
    """tout: (8, HPAD, WPAD) f32 temporal output; cur: (11, HPAD, WPAD) f32.
    Returns colour4 (4, HPAD, WPAD) f32 (zero padding intact)."""
    gh = next(g for g in (24, 32, 40, 16, 8, lo.th) if lo.th % g == 0)
    nh, nw = lo.hp // lo.th, lo.wp // lo.tw
    erows = lo.th + 16
    ecols = lo.tw + 2 * PAD_X
    out0 = jnp.zeros((4, lo.hpad, lo.wpad), jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _moments_planar_kernel, th=lo.th, tw=lo.tw, gh=gh, halo=_RADIUS,
            phi_colour=phi_colour, phi_normal=phi_normal, nh=nh, nw=nw,
        ),
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((4, lo.hpad, lo.wpad), jnp.float32),
        input_output_aliases={2: 0},
        scratch_shapes=[
            pltpu.VMEM((2, 7, erows, ecols), jnp.float32),
            pltpu.VMEM((2, 5, erows, ecols), jnp.float32),
            pltpu.VMEM((10, erows, ecols), jnp.float32),
            pltpu.VMEM((4, lo.th, lo.tw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tout, cur, out0)


# ---------------------------------------------------------------------------
# A-trous chain (Filter.cuh:527-624, loop App.cu:491-514) — planar
# ---------------------------------------------------------------------------


_DXI = {-2: 0, -1: 1, 1: 2, 2: 3}


def _atrous_planar_kernel(colors_hbm, cur_hbm, alias_hbm, out_hbm,
                          cscr, sscr, pre, shift, out_vmem, csem, ssem, osem,
                          *, step, phi_colour, phi_normal, th, tw, ha, nh, nw,
                          use_shift, use_dxpre=False):
    """One a-trous iteration on the canonical layout. Identical math to
    atrous_pallas._atrous_chain_kernel; statics come from cur[C_Z:C_NZ+1]
    (z is fixed up 0 -> 1e30 here, once per tile)."""
    del alias_hbm
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * nw + j
    eh = th + 2 * ha
    ew = tw + 2 * PAD_X

    def copies(slot, ti, tj):
        return (
            pltpu.make_async_copy(
                colors_hbm.at[:, pl.ds(PAD_Y - ha + ti * th, eh),
                              pl.ds(tj * tw, ew)],
                cscr.at[slot], csem.at[slot],
            ),
            pltpu.make_async_copy(
                cur_hbm.at[C_Z : C_NZ + 1,
                           pl.ds(PAD_Y - ha + ti * th, eh), pl.ds(tj * tw, ew)],
                sscr.at[slot], ssem.at[slot],
            ),
        )

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        for c in copies(0, i, j):
            c.start()

    for c in copies(slot, i, j):
        c.wait()

    @pl.when(t + 1 < nh * nw)
    def _():
        tn = t + 1
        for c in copies(jax.lax.rem(tn, 2), tn // nw, jax.lax.rem(tn, nw)):
            c.start()

    # pre planes: 0-2 rgb clipped, 3 var clipped, 4 lum, 5 z fixed, 6-8 normal
    c0 = jnp.clip(cscr[slot, 0], 0.0, 1.0)
    c1 = jnp.clip(cscr[slot, 1], 0.0, 1.0)
    c2 = jnp.clip(cscr[slot, 2], 0.0, 1.0)
    pre[0] = c0
    pre[1] = c1
    pre[2] = c2
    pre[3] = jnp.clip(cscr[slot, 3], 0.0, 1.0)
    pre[4] = _LUM[0] * c0 + _LUM[1] * c1 + _LUM[2] * c2
    zr = sscr[slot, 0]
    pre[5] = jnp.where(zr == 0.0, 1e30, zr)
    pre[6] = sscr[slot, 2]
    pre[7] = sscr[slot, 3]
    pre[8] = sscr[slot, 4]

    if use_dxpre:
        # Materialize the 4 lane-shifted copies of all 9 pre planes ONCE
        # per tile. Lane-misaligned vector reads cost ~3-4x an aligned read
        # on v5e (measured, r5 probe): a direct tap loop pays that on all
        # 216 (24 taps x 9 plane) reads, while dx-shifts commute with the
        # dy row slicing — so 36 misaligned copies here turn every tap
        # read into a dy-only-misaligned one (half the penalty).
        for d in (-2, -1, 1, 2):
            ox = d * step
            shift[_DXI[d]] = pre[:, :, PAD_X + ox : PAD_X + ox + tw]

    def ctr(k):
        return pre[k, ha : ha + th, PAD_X : PAD_X + tw]

    c_rgb = [ctr(0), ctr(1), ctr(2)]
    c_var = ctr(3)
    l_c = ctr(4)
    z_c = ctr(5)
    invalid = z_c >= 1e29
    zd = sscr[slot, 1, ha : ha + th, PAD_X : PAD_X + tw]
    n_c = (ctr(6), ctr(7), ctr(8))

    inv_l = pl.reciprocal(
        phi_colour * jnp.sqrt(jnp.maximum(0.0, 1e-10 + c_var)), approx=False
    )
    inv_pd = pl.reciprocal(jnp.maximum(zd, 1e-6) * step, approx=False)
    # the kernel is VPU-op-bound: pre-scale inv_pd by the 5 distinct tap
    # distances once per tile (saves one multiply per tap per pixel)
    inv_pd_d = {
        d2: inv_pd * float(1.0 / d2 ** 0.5) for d2 in (1, 2, 4, 5, 8)
    }

    sum_w = jnp.ones((th, tw), jnp.float32)
    acc = [c_rgb[0], c_rgb[1], c_rgb[2], c_var]

    for dy in (-2, -1, 0, 1, 2):
        oy = dy * step
        if use_dxpre:

            def sp(k, dx, oy=oy):
                if dx == 0:
                    return pre[k, ha + oy : ha + oy + th,
                               PAD_X : PAD_X + tw]
                return shift[_DXI[dx // step], k, ha + oy : ha + oy + th, :]
        elif use_shift:
            shift[...] = pre[:, ha + oy : ha + oy + th, :]

            def sp(k, dx):
                return shift[k, :, PAD_X + dx : PAD_X + dx + tw]
        else:

            def sp(k, dx, oy=oy):
                return pre[k, ha + oy : ha + oy + th, PAD_X + dx : PAD_X + dx + tw]

        for dx in (-2, -1, 0, 1, 2):
            if dy == 0 and dx == 0:
                continue
            ox = dx * step
            l_p = sp(4, ox)
            z_p = sp(5, ox)
            ndot = n_c[0] * sp(6, ox) + n_c[1] * sp(7, ox) + n_c[2] * sp(8, ox)
            w_n = _pow(jnp.clip(ndot, 0.0, 1.0), phi_normal)
            w_z = jnp.abs(z_c - z_p) * inv_pd_d[dx * dx + dy * dy]
            w_l = jnp.abs(l_c - l_p) * inv_l
            k1d = _KERNEL_1D[abs(dx)] * _KERNEL_1D[abs(dy)]
            w = jnp.exp(-w_l - w_z) * w_n * k1d
            sum_w = sum_w + w
            acc[0] = acc[0] + w * sp(0, ox)
            acc[1] = acc[1] + w * sp(1, ox)
            acc[2] = acc[2] + w * sp(2, ox)
            acc[3] = acc[3] + w * w * sp(3, ox)

    inv = pl.reciprocal(sum_w, approx=False)
    out_vmem[0] = jnp.where(invalid, c_rgb[0], acc[0] * inv)
    out_vmem[1] = jnp.where(invalid, c_rgb[1], acc[1] * inv)
    out_vmem[2] = jnp.where(invalid, c_rgb[2], acc[2] * inv)
    out_vmem[3] = jnp.where(invalid, c_var, acc[3] * (inv * inv))
    wr = pltpu.make_async_copy(
        out_vmem,
        out_hbm.at[:, pl.ds(PAD_Y + i * th, th), pl.ds(PAD_X + j * tw, tw)],
        osem,
    )
    wr.start()
    wr.wait()


@functools.partial(
    jax.jit,
    static_argnames=("lo", "steps", "phi_colour", "phi_normal", "interpret",
                     "shift_mode"),
)
def atrous_chain_planar_v2(colors, cur, lo: Layout, steps: int,
                           phi_colour: float, phi_normal: float,
                           interpret: bool = False, shift_mode: str = "never"):
    """Full wavelet loop on the canonical layout. colors: (4, HPAD, WPAD)
    f32 (the moments output). Returns (final, feedback) both
    (4, HPAD, WPAD) f32 — feedback is iteration-0's output
    (Filter.cuh:619-622). shift_mode: "dxpre" (default) materializes the 4
    lane-shifted copies of the pre planes once per tile for the misaligned
    small steps (<8) — lane-misaligned reads cost ~3-4x aligned on v5e, and
    dx shifts commute with dy row slicing, so this halves the tap penalty
    (measured r5: step1 1.46 -> ~0.8 ms); "never" reads misaligned rows
    directly; "auto" uses dy row-shift copies for misaligned steps (no win:
    it leaves all 216 lane-misaligned tap reads in place)."""
    assert steps >= 1
    nh, nw = lo.hp // lo.th, lo.wp // lo.tw
    bufs = [colors, jnp.zeros_like(colors)]
    feedback = None
    for k in range(steps):
        step = 1 << k
        ha = max(-(-2 * step // 8) * 8, 8)
        assert ha <= PAD_Y
        eh = lo.th + 2 * ha
        ew = lo.tw + 2 * PAD_X
        use_shift = (step % 8 != 0) and shift_mode == "auto"
        use_dxpre = (step < 8) and shift_mode == "dxpre"
        src, dst = bufs[k % 2], bufs[(k + 1) % 2]
        dst = pl.pallas_call(
            functools.partial(
                _atrous_planar_kernel, step=step, phi_colour=phi_colour,
                phi_normal=phi_normal, th=lo.th, tw=lo.tw, ha=ha, nh=nh, nw=nw,
                use_shift=use_shift, use_dxpre=use_dxpre,
            ),
            grid=(nh, nw),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            out_shape=jax.ShapeDtypeStruct((4, lo.hpad, lo.wpad), jnp.float32),
            input_output_aliases={2: 0},
            scratch_shapes=[
                pltpu.VMEM((2, 4, eh, ew), jnp.float32),
                pltpu.VMEM((2, 5, eh, ew), jnp.float32),
                pltpu.VMEM((9, eh, ew), jnp.float32),
                (pltpu.VMEM((4, 9, eh, lo.tw), jnp.float32) if use_dxpre
                 else pltpu.VMEM((9 if use_shift else 1, lo.th, ew),
                                 jnp.float32)),
                pltpu.VMEM((4, lo.th, lo.tw), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=interpret,
        )(src, cur, dst)
        bufs[(k + 1) % 2] = dst
        if k == 0:
            feedback = dst
    return bufs[steps % 2], feedback


# ---------------------------------------------------------------------------
# TAA + sRGB (Filter.cuh:288-357) — planar kernel with edge-clamp fix-ups
# ---------------------------------------------------------------------------


def _encode(rgb):
    r2 = []
    for c in rgb:
        cm = jnp.maximum(c, 0.0)
        r2.append(cm * cm)
    return [m[0] * r2[0] + m[1] * r2[1] + m[2] * r2[2] for m in _ENC]


def _taa_planar_kernel(atrous_hbm, hist_hbm, alias, out_hbm,
                       ascr, hscr, out_vmem, asem, hsem, osem,
                       *, th, tw, h_img, w_img, nh, nw, hist_packed):
    """3x3 YUV clamp + mix + sRGB. The reference reads via imageLoad with
    coordinate CLAMP (Filter.cuh:73-74); the planar buffers are zero-padded,
    so tiles touching an image border replicate the border row/column into
    the 1-px halo in VMEM before the taps run."""
    del alias
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * nw + j
    ha = 8
    eh = th + 2 * ha
    ew = tw + 2 * PAD_X

    def copies(slot, ti, tj):
        return (
            pltpu.make_async_copy(
                atrous_hbm.at[0:3, pl.ds(PAD_Y - ha + ti * th, eh),
                              pl.ds(tj * tw, ew)],
                ascr.at[slot], asem.at[slot],
            ),
            pltpu.make_async_copy(
                hist_hbm.at[:, pl.ds(PAD_Y - ha + ti * th, eh),
                            pl.ds(tj * tw, ew)],
                hscr.at[slot], hsem.at[slot],
            ),
        )

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        for c in copies(0, i, j):
            c.start()

    for c in copies(slot, i, j):
        c.wait()

    @pl.when(t + 1 < nh * nw)
    def _():
        tn = t + 1
        for c in copies(jax.lax.rem(tn, 2), tn // nw, jax.lax.rem(tn, nw)):
            c.start()

    # ---- edge-clamp fix-ups (rows first, then cols -> corners correct) ----
    last_i = (h_img - 1) // th          # tile row containing the last image row
    lr = (h_img - 1) - last_i * th + ha  # its local row index
    last_j = (w_img - 1) // tw
    lc = (w_img - 1) - last_j * tw + PAD_X

    # (packed history: the pair planes are edge-replicated directly — a
    # copied f32 pair copies both fp16 channels)
    for scr, nch in ((ascr, 3), (hscr, 2 if hist_packed else 4)):

        @pl.when(i == 0)
        def _(scr=scr, nch=nch):
            scr[slot, 0:nch, ha - 1, :] = scr[slot, 0:nch, ha, :]

        @pl.when(i == last_i)
        def _(scr=scr, nch=nch):
            scr[slot, 0:nch, lr + 1, :] = scr[slot, 0:nch, lr, :]

        @pl.when(j == 0)
        def _(scr=scr, nch=nch):
            scr[slot, 0:nch, :, PAD_X - 1] = scr[slot, 0:nch, :, PAD_X]

        @pl.when(j == last_j)
        def _(scr=scr, nch=nch):
            scr[slot, 0:nch, :, lc + 1] = scr[slot, 0:nch, :, lc]

    def rgb01(dy, dx):
        return [
            jnp.clip(
                ascr[slot, k, ha + dy : ha + dy + th,
                     PAD_X + dx : PAD_X + dx + tw],
                0.0, 1.0,
            )
            for k in range(3)
        ]

    in0 = rgb01(0, 0)
    last = [
        jnp.clip(
            hscr[slot, k, ha : ha + th, PAD_X : PAD_X + tw].astype(jnp.float32),
            0.0, 1.0,
        )
        for k in range(4)
    ] if not hist_packed else [
        jnp.clip(v, 0.0, 1.0)
        for pair in (
            _unpack_f16_pair(hscr[slot, 0, ha : ha + th, PAD_X : PAD_X + tw]),
            _unpack_f16_pair(hscr[slot, 1, ha : ha + th, PAD_X : PAD_X + tw]),
        )
        for v in pair
    ]

    mix_rate = jnp.minimum(last[3], 0.5)
    aa = []
    for c in range(3):
        a2 = last[c] * last[c]
        aa.append(jnp.sqrt(jnp.maximum(a2 + (in0[c] * in0[c] - a2) * mix_rate,
                                       1e-12)))

    aa_yuv = _encode(aa)
    c_yuv = _encode(in0)

    plus = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    diag = [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    min_c = list(c_yuv)
    max_c = list(c_yuv)
    for dy, dx in plus:
        p = _encode(rgb01(dy, dx))
        for k in range(3):
            min_c[k] = jnp.minimum(min_c[k], p[k])
            max_c[k] = jnp.maximum(max_c[k], p[k])
    dmin = [jnp.full((th, tw), jnp.inf, jnp.float32)] * 3
    dmax = [jnp.full((th, tw), -jnp.inf, jnp.float32)] * 3
    for dy, dx in diag:
        p = _encode(rgb01(dy, dx))
        for k in range(3):
            dmin[k] = jnp.minimum(dmin[k], p[k])
            dmax[k] = jnp.maximum(dmax[k], p[k])
    for k in range(3):
        min_c[k] = 0.5 * min_c[k] + 0.5 * jnp.minimum(dmin[k], min_c[k])
        max_c[k] = 0.5 * max_c[k] + 0.5 * jnp.maximum(dmax[k], max_c[k])

    clamped = [jnp.clip(aa_yuv[k], min_c[k], max_c[k]) for k in range(3)]
    rgb = [
        jnp.sqrt(
            jnp.maximum(
                m[0] * clamped[0] + m[1] * clamped[1] + m[2] * clamped[2],
                1e-12,
            )
        )
        for m in _DEC
    ]
    ok = jnp.isfinite(rgb[0]) & jnp.isfinite(rgb[1]) & jnp.isfinite(rgb[2])
    for c in range(3):
        v = jnp.where(ok, rgb[c], 0.0)
        v = jnp.maximum(v, 0.0)
        safe = jnp.maximum(v, 0.0031308)
        srgb = jnp.where(
            v <= 0.0031308, 12.92 * v, 1.055 * jnp.power(safe, 1.0 / 2.4) - 0.055
        )
        out_vmem[c] = jnp.clip(srgb, 0.0, 1.0)
    out_vmem[3] = jnp.ones((th, tw), jnp.float32)

    wr = pltpu.make_async_copy(
        out_vmem,
        out_hbm.at[:, pl.ds(PAD_Y + i * th, th), pl.ds(PAD_X + j * tw, tw)],
        osem,
    )
    wr.start()
    wr.wait()


@functools.partial(jax.jit, static_argnames=("lo", "interpret"))
def taa_planar(atrous, hist, lo: Layout, interpret: bool = False):
    """atrous: (4, HPAD, WPAD) f32; hist: (4, HPAD, WPAD) any float dtype
    OR the (2, HPAD, WPAD) fp16 pair-packed f32 form (pack_pairs4_f16).
    Returns final (4, HPAD, WPAD) f32 sRGB (zero padding intact)."""
    hist_packed = hist.shape[0] == 2
    n_hist = 2 if hist_packed else 4
    nh, nw = lo.hp // lo.th, lo.wp // lo.tw
    eh = lo.th + 16
    ew = lo.tw + 2 * PAD_X
    out0 = jnp.zeros((4, lo.hpad, lo.wpad), jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _taa_planar_kernel, th=lo.th, tw=lo.tw, h_img=lo.h, w_img=lo.w,
            nh=nh, nw=nw, hist_packed=hist_packed,
        ),
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((4, lo.hpad, lo.wpad), jnp.float32),
        input_output_aliases={2: 0},
        scratch_shapes=[
            pltpu.VMEM((2, 3, eh, ew), jnp.float32),
            pltpu.VMEM((2, n_hist, eh, ew), hist.dtype),
            pltpu.VMEM((4, lo.th, lo.tw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(atrous, hist, out0)


# ---------------------------------------------------------------------------
# The chain driver
# ---------------------------------------------------------------------------


class PlanarChainOut(NamedTuple):
    """All products stay planar; unpack at the consumer boundary."""

    tout: jax.Array       # (8, HPAD, WPAD) temporal output
    moments4: jax.Array   # (4, HPAD, WPAD) after moments fallback
    atrous4: jax.Array    # (4, HPAD, WPAD) after the wavelet chain
    final4: jax.Array     # (4, HPAD, WPAD) after TAA + sRGB
    feedback: jax.Array   # (4, HPAD, WPAD) iteration-0 output (or temporal)


def filter_chain_planar(cur, prev, taa_hist, lo: Layout, svgf_cfg,
                        bound=(8, 63), interpret: bool = False,
                        enable_taa: bool = True) -> PlanarChainOut:
    """cur: pack_current output; prev/taa_hist: planar state (any float
    dtype). Mirrors pipeline.filter_chain stage-for-stage."""
    tout = temporal_planar(
        cur, prev, lo,
        depth_threshold=svgf_cfg.depth_threshold,
        normal_threshold=svgf_cfg.normal_threshold,
        history_base_length=svgf_cfg.history_length,
        bound=bound, interpret=interpret,
    )
    moments4 = moments_planar(
        tout, cur, lo, phi_colour=svgf_cfg.phi_colour,
        phi_normal=svgf_cfg.phi_normal, interpret=interpret,
    )
    if svgf_cfg.spatial_filter_steps > 0:
        atrous4, feedback = atrous_chain_planar_v2(
            moments4, cur, lo, steps=svgf_cfg.spatial_filter_steps,
            phi_colour=svgf_cfg.phi_colour, phi_normal=svgf_cfg.phi_normal,
            interpret=interpret,
        )
    else:
        atrous4 = moments4
        feedback = tout[0:4]  # steps==0: temporal output is the feedback
    if enable_taa:
        final4 = taa_planar(atrous4, taa_hist, lo, interpret=interpret)
    else:
        from svgf_tpu.ops.geometry import to_srgb

        rgb = to_srgb(jnp.clip(atrous4[0:3], 0.0, 1.0))
        final4 = jnp.concatenate(
            [rgb, jnp.ones((1,) + atrous4.shape[1:], jnp.float32)], axis=0
        )
    return PlanarChainOut(tout, moments4, atrous4, final4, feedback)
