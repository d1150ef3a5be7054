"""MXU one-hot gathers — TPU-native row lookup.

XLA lowers `table[idx]` on TPU to a scalar-ish dynamic-gather that runs at
~10% of HBM speed (measured: 8-40 ms for 2M x 9 floats from a 128-row
table). A one-hot matmul does the same lookup on the MXU in ~4 ms and is
BIT-EXACT under Precision.HIGHEST (selection sums one 1.0*value against
zeros; verified in tests). This is the standard TPU embedding-lookup trick
applied to scene-attribute tables (triangles, instances, materials) — the
path tracer's per-bounce shading is gather-bound without it.

The one-hot temp is (R, T) f32, so the trick only pays while R*T stays
HBM-friendly; larger tables fall back to plain indexing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# max elements of ONE live (R, T) one-hot temp (f32): 64M elems = 256 MB
# transient. Larger gathers are CHUNKED over rows (lax.map of one-hot
# matmuls) rather than falling back to the slow XLA dynamic-gather — at
# 1080p full-frame (2M-lane) sizes the fallback was 10-40x slower than the
# chunked MXU path and made *larger* trace chunks net-slower (r3 sweep:
# trace_chunks=2 took 2.2x chunks=32 because every intersect's attribute
# lookup fell off the MXU path here).
_MAX_ONEHOT_ELEMS = 64 * 1024 * 1024

# tables wider than this aren't worth a one-hot matmul even chunked (the
# (R, T) temp outgrows the useful work); plain indexing wins
_MAX_ONEHOT_TABLE = 4096


def _use_onehot(T: int, R: int) -> bool:
    return 2 <= T <= _MAX_ONEHOT_TABLE


def _onehot_rows(flat: jax.Array, idx: jax.Array) -> jax.Array:
    """(R,) idx -> (R, C) rows of flat (T, C) via MXU one-hot matmuls,
    row-chunked so the transient one-hot stays <= _MAX_ONEHOT_ELEMS."""
    T, C = flat.shape
    R = idx.shape[0]

    def mm(ix):
        oh = jax.nn.one_hot(ix, T, dtype=jnp.float32)
        return jax.lax.dot_general(
            oh, flat, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    max_rows = max(_MAX_ONEHOT_ELEMS // T, 1)
    if R <= max_rows:
        return mm(idx)
    # round the chunk to a multiple of 8 sublanes and pad R up to it
    rc = max(max_rows // 8 * 8, 8)
    n = -(-R // rc)
    pad = n * rc - R
    idx_p = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)]) if pad else idx
    out = jax.lax.map(mm, idx_p.reshape(n, rc))
    return out.reshape(n * rc, C)[:R]


def take_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table: (T, ...) float -> (R, ...) rows at idx ((R,) int, in-range)."""
    T = table.shape[0]
    R = idx.shape[0]
    flat = table.reshape(T, -1)
    if _use_onehot(T, R) and flat.dtype == jnp.float32:
        out = _onehot_rows(flat, idx)
    else:
        out = flat[idx]
    return out.reshape((R,) + table.shape[1:])


def take_rows_int(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Integer-table variant: rides the f32 matmul exactly (|values| < 2^24)."""
    T = table.shape[0]
    if _use_onehot(T, idx.shape[0]):
        return take_rows(table.astype(jnp.float32), idx).astype(table.dtype)
    return table[idx]


def take_rows_multi(tables, idx):
    """Gather the same rows from several (T, ...) tables with ONE one-hot
    matmul (columns concatenated). Falls back per-table when too large or
    non-f32."""
    T = tables[0].shape[0]
    R = idx.shape[0]
    if not (_use_onehot(T, R)
            and all(t.shape[0] == T and t.dtype == jnp.float32 for t in tables)):
        return tuple(take_rows(t, idx) for t in tables)
    flats = [t.reshape(T, -1) for t in tables]
    cat = jnp.concatenate(flats, axis=1)
    out = _onehot_rows(cat, idx)
    res = []
    c0 = 0
    for t, f in zip(tables, flats):
        c1 = c0 + f.shape[1]
        res.append(out[:, c0:c1].reshape((R,) + t.shape[1:]))
        c0 = c1
    return tuple(res)
