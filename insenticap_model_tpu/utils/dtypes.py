"""Shared dtype-policy helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cast_bf16(tree):
    """The measured TPU serving cast: float leaves -> bfloat16, integer/
    bool leaves untouched (params AND activations serve in bf16; f32 is
    reserved for score accumulation — CLAUDE.md numerics policy). One
    definition so the serving daemon, serve CLI, and bench/profiler
    tools cannot silently diverge on which leaves get cast."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else x, tree)


def cast_f32(tree):
    """Inverse policy cast: float leaves -> float32, integer/bool leaves
    untouched. Same leaf predicate as cast_bf16 so a round trip touches
    exactly the same leaves."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else x, tree)
