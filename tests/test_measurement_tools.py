"""Guards on the measurement-tool discipline itself.

The ablation tools' stand-ins must be OPAQUE (CLAUDE.md rule): a
stand-in XLA can fold to a constant disconnects from the live program
and reshapes fusion globally, fabricating bounds (the r4 -104% artifact,
and the int32 refinement found by review — int 0*x folds legally while
float 0*x cannot). These tests pin the opacity property at the HLO
level so a future simplification of the helpers cannot silently revert
the measurement fix.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.ablate_train import _opaque  # noqa: E402
from tools.ablate_serving import _opaque_zero_i32  # noqa: E402


def _root_operands(fn, x):
    """Operand text of the ENTRY computation's ROOT in optimized HLO."""
    hlo = jax.jit(fn).lower(x).compile().as_text()
    entry = hlo.split("ENTRY")[-1]
    roots = [ln for ln in entry.splitlines() if "ROOT" in ln]
    assert roots, hlo
    return roots[-1]


@pytest.mark.parametrize("src_dtype", [jnp.int32, jnp.float32])
@pytest.mark.parametrize("out_dtype", [jnp.int32, jnp.float32])
def test_opaque_stays_connected(src_dtype, out_dtype):
    x = jnp.arange(12).astype(src_dtype)
    root = _root_operands(lambda x: _opaque(x, (4,), out_dtype), x)
    # A folded stand-in's ROOT consumes only constants (the broken int32
    # form compiled to `fusion(%constant)`); the opaque form's ROOT must
    # be fed by a value derived from the parameter.
    assert "constant" not in root, root


def test_opaque_zero_i32_stays_connected():
    x = jnp.linspace(0.0, 1.0, 8, dtype=jnp.float32)
    root = _root_operands(
        lambda x: jnp.broadcast_to(_opaque_zero_i32(x), (4,)), x)
    assert "constant" not in root, root


def test_opaque_is_zero():
    """Opacity must not change values: the stand-ins are still zeros."""
    x = jnp.arange(1, 13).astype(jnp.int32)
    assert (_opaque(x, (4,), jnp.int32) == 0).all()
    xf = jnp.linspace(1.0, 2.0, 8, dtype=jnp.float32)
    assert int(_opaque_zero_i32(xf)) == 0
