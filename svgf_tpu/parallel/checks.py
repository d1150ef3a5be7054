"""Shared sharded-vs-unsharded parity checker.

One tolerance/assert policy used by BOTH the official multi-chip record
(`__graft_entry__.dryrun_multichip`) and the test suite
(`tests/test_sharding.py`), so the two can't drift apart (VERDICT r3 item 9;
they diverged once in r2 — finiteness-only vs value parity).

The counter-based RNG (ops.sampling.RngStream) hashes GLOBAL pixel ids, so a
sharded frame draws exactly the random values the unsharded frame would;
sharded loss/grads must therefore match the unsharded ones to fp tolerance,
not merely be finite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# One place for the official tolerances. shard_map's backward inserts a psum
# whose reduction order differs from the unsharded sum, so exact equality is
# not expected; 2e-3 relative (vs the grad's max magnitude) bounds the
# re-association error at float32 across <=8 shards.
LOSS_RTOL = 2e-3
LOSS_ATOL = 1e-6
GRAD_RTOL = 2e-3
GRAD_ATOL = 1e-7


def assert_sharded_parity(tag, loss, grads, ref_loss, ref_grads):
    """Assert a sharded (loss, grads) matches the unsharded reference.

    `grads`/`ref_grads` are matching pytrees (e.g. dicts of param leaves).
    Raises AssertionError with `tag` context on any violation.
    """
    assert bool(jnp.isfinite(loss)), f"{tag}: non-finite loss {loss}"
    assert bool(jnp.allclose(loss, ref_loss, rtol=LOSS_RTOL, atol=LOSS_ATOL)), (
        f"{tag}: sharded loss {loss} != unsharded {ref_loss}"
    )

    def _check_leaf(path, a, b):
        assert bool(jnp.all(jnp.isfinite(a))), f"{tag}: non-finite grad at {path}"
        scale = jnp.maximum(jnp.max(jnp.abs(b)), 1e-8)
        ok = bool(jnp.all(jnp.abs(a - b) <= GRAD_RTOL * scale + GRAD_ATOL))
        assert ok, (
            f"{tag}: grad mismatch at {path} "
            f"(max |a-b|={float(jnp.max(jnp.abs(a - b)))}, scale={float(scale)})"
        )

    jax.tree_util.tree_map_with_path(
        lambda p, a, b: _check_leaf(jax.tree_util.keystr(p), a, b),
        grads, ref_grads,
    )
