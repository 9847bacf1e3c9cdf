"""Shared dtype-policy helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _is_float_leaf(x) -> bool:
    """True for float-dtyped array leaves INCLUDING bfloat16 —
    np.issubdtype(bfloat16, np.floating) is False (ml_dtypes extension
    type), so the predicate must go through jnp.issubdtype. Reads
    x.dtype directly: np.asarray(x) on a device array would fetch it to
    host (seconds for a big tree through the tunnel)."""
    dt = getattr(x, "dtype", None)
    if dt is None:
        return isinstance(x, float)
    return bool(jnp.issubdtype(dt, jnp.floating))


def cast_bf16(tree):
    """The measured TPU serving cast: float leaves -> bfloat16, integer/
    bool leaves untouched (params AND activations serve in bf16; f32 is
    reserved for score accumulation — CLAUDE.md numerics policy). One
    definition so the serving daemon, serve CLI, and bench/profiler
    tools cannot silently diverge on which leaves get cast."""
    # x.astype keeps host leaves on host (np handles bfloat16 via
    # ml_dtypes); jnp.asarray here would device_put every leaf
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if _is_float_leaf(x) else x, tree)


def cast_f32(tree):
    """Inverse policy cast: float leaves (incl. bfloat16) -> float32,
    integer/bool leaves untouched. Same leaf predicate as cast_bf16 so
    a round trip touches exactly the same leaves."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if _is_float_leaf(x) else x, tree)
