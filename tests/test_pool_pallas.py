"""ops/pool_pallas.py == the reduce_window ceil-mode maxpool, bit-exact.

The kernel replaces XLA's reduce_window lowering for the encoder stem's
MaxPool2d(3, stride 2, pad 0, ceil_mode=True) (reference
models/encoder.py:12). Max is reassociation-free, so parity is exact
equality in every dtype — including the -inf ceil-pad band.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insenticap_model_tpu.models.encoder import _ceil_maxpool_3x3s2
from insenticap_model_tpu.ops.pool_pallas import (ceil_maxpool_3x3s2_nhwc,
                                                  ceil_maxpool_3x3s2_sm)

ON_TPU = jax.default_backend() == "tpu"


@pytest.mark.parametrize("shape", [
    (2, 14, 14, 8),     # even extents (ceil pad row+col hit)
    (1, 13, 13, 4),     # odd extents (no ceil pad)
    (3, 9, 11, 8),      # H != W
    (1, 8, 8, 128),     # full lane tile
    (2, 7, 7, 3),       # tiny, C=3
    (2, 36, 26, 16),    # REAL multi-tile H grid (oh=18, hb=9: 2 steps,
                        # exercises the tail-block handoff at i>0)
    (9, 14, 14, 64),    # bc=576 > 512 and not a 128-multiple: the
                        # lane-block fallback must still divide bc
])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pool_pallas_matches_reduce_window(shape, dtype):
    rng = np.random.RandomState(hash(shape) % 2**31)
    x = jnp.asarray(rng.randn(*shape), jnp.float32).astype(dtype)
    ref = np.asarray(_ceil_maxpool_3x3s2(x))
    got = np.asarray(ceil_maxpool_3x3s2_nhwc(x, interpret=not ON_TPU))
    assert got.dtype == ref.dtype
    np.testing.assert_array_equal(got, ref)


def test_pool_pallas_lane_fallback():
    """B*C not a 128-multiple routes to the reduce_window fallback when
    not interpreting (Mosaic lane-block constraint) — safe on any
    backend because the gate fires before pallas_call."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 14, 14, 8), jnp.float32)  # bc = 24
    ref = np.asarray(_ceil_maxpool_3x3s2(x))
    got = np.asarray(ceil_maxpool_3x3s2_nhwc(x, interpret=False))
    np.testing.assert_array_equal(got, ref)


def test_pool_pallas_sm_layout_roundtrip():
    """The spatial-major core applied to a transposed batch equals the
    NHWC wrapper (catches index-map mistakes between the two entries)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 14, 14, 8), jnp.float32)
    via_sm = np.asarray(
        ceil_maxpool_3x3s2_sm(x.transpose(1, 2, 0, 3),
                              interpret=not ON_TPU)).transpose(2, 0, 1, 3)
    via_nhwc = np.asarray(ceil_maxpool_3x3s2_nhwc(x, interpret=not ON_TPU))
    np.testing.assert_array_equal(via_sm, via_nhwc)
