"""Exact adaptive average pooling (torch F.adaptive_avg_pool2d semantics)
via the integral-image trick: each output cell averages the input window
[floor(i*H/out), ceil((i+1)*H/out)) — computed as four gathers into a 2-D
cumulative sum. Shape-static, XLA-friendly, O(HW) instead of per-window loops.

Used by the encoder to produce the 14x14 att grid from arbitrary conv-map
sizes (reference models/encoder.py:53) without dynamic windows.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _bounds(in_size: int, out_size: int):
    i = np.arange(out_size)
    start = (i * in_size) // out_size
    end = -((-(i + 1) * in_size) // out_size)  # ceil
    return start.astype(np.int32), end.astype(np.int32)


def adaptive_avg_pool2d(x, out_hw):
    """x: [..., H, W, C] -> [..., oh, ow, C]. out_hw static (oh, ow)."""
    oh, ow = out_hw
    H, W = x.shape[-3], x.shape[-2]
    # integral image with a zero border: I[i, j] = sum of x[:i, :j]
    csum = jnp.cumsum(jnp.cumsum(x, axis=-3), axis=-2)
    pad = [(0, 0)] * (x.ndim - 3) + [(1, 0), (1, 0), (0, 0)]
    I = jnp.pad(csum, pad)
    hs, he = _bounds(H, oh)
    ws, we = _bounds(W, ow)
    # window sum = I[e_h, e_w] - I[s_h, e_w] - I[e_h, s_w] + I[s_h, s_w]
    Ihe = jnp.take(I, he, axis=-3)
    Ihs = jnp.take(I, hs, axis=-3)
    tl = jnp.take(Ihs, ws, axis=-2)
    tr = jnp.take(Ihs, we, axis=-2)
    bl = jnp.take(Ihe, ws, axis=-2)
    br = jnp.take(Ihe, we, axis=-2)
    sums = br - tr - bl + tl
    area = ((he - hs)[:, None] * (we - ws)[None, :]).astype(x.dtype)
    return sums / area[..., None]
