"""Functional NN substrate.

Explicit param pytrees (nested dicts of jnp arrays) with PyTorch-compatible
layouts and initializers, so that (a) weight conversion from reference
checkpoints is a pure transpose/rename and (b) training-from-scratch matches
the reference's init distributions.

Layout conventions (vs. torch):
  linear   : w [in, out]  (torch stores [out, in] — transpose on convert)
  embedding: table [num, dim]
  lstm_cell: w_ih [in, 4H], w_hh [H, 4H], b_ih [4H], b_hh [4H]
             gate order i, f, g, o (torch order)
  conv2d   : w [kh, kw, in, out] (NHWC compute; torch is [out, in, kh, kw])

All ops are shape-static and jit-friendly.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Initializers (match torch defaults)
# ---------------------------------------------------------------------------

def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    """torch nn.Linear default: U(-1/sqrt(in), 1/sqrt(in)) for both w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": _uniform(kw, (in_dim, out_dim), bound, dtype),
        "b": _uniform(kb, (out_dim,), bound, dtype),
    }


def linear(p, x):
    return jnp.dot(x, p["w"], preferred_element_type=x.dtype) + p["b"]


def embedding_init(key, num: int, dim: int, pad_id: Optional[int] = None,
                   dtype=jnp.float32):
    """torch nn.Embedding default: N(0, 1); padding row zeroed."""
    table = jax.random.normal(key, (num, dim), dtype)
    if pad_id is not None:
        table = table.at[pad_id].set(0.0)
    return {"table": table}


def embed(p, ids, pad_id: Optional[int] = None):
    """Lookup. If pad_id given, output rows for pad ids are hard-zeroed, which
    also zeroes their gradient — the functional analogue of torch's
    padding_idx (reference models/captioner.py:133-135)."""
    out = jnp.take(p["table"], ids, axis=0)
    if pad_id is not None:
        mask = (ids != pad_id)[..., None].astype(out.dtype)
        out = out * mask
    return out


def lstm_cell_init(key, in_dim: int, hid_dim: int, dtype=jnp.float32):
    """torch nn.LSTMCell default: all params U(-1/sqrt(H), 1/sqrt(H))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hid_dim)
    return {
        "w_ih": _uniform(k1, (in_dim, 4 * hid_dim), bound, dtype),
        "w_hh": _uniform(k2, (hid_dim, 4 * hid_dim), bound, dtype),
        "b_ih": _uniform(k3, (4 * hid_dim,), bound, dtype),
        "b_hh": _uniform(k4, (4 * hid_dim,), bound, dtype),
    }


def lstm_cell(p, x, hc: Tuple[jnp.ndarray, jnp.ndarray]):
    """One LSTM cell step, torch gate order (i, f, g, o)."""
    h, c = hc
    gates = (jnp.dot(x, p["w_ih"], preferred_element_type=x.dtype)
             + jnp.dot(h, p["w_hh"], preferred_element_type=x.dtype)
             + p["b_ih"] + p["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def conv2d_init(key, in_ch: int, out_ch: int, kh: int, kw: int,
                bias: bool = True, dtype=jnp.float32):
    """torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) == U(-b, b) with
    b = 1/sqrt(fan_in); bias likewise."""
    kwk, kb = jax.random.split(key)
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(kwk, (kh, kw, in_ch, out_ch), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_ch,), bound, dtype)
    return p


def conv2d(p, x, stride: int = 1, padding="SAME"):
    """NHWC conv. `padding` may be 'SAME', 'VALID', or explicit
    ((top, bottom), (left, right))."""
    if isinstance(padding, str):
        pad = padding
    else:
        pad = list(padding)
    out = jax.lax.conv_general_dilated(
        x, p["w"],
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"]
    return out


def dropout(key, x, rate: float, deterministic: bool):
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train time)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def log_softmax(x, axis=-1):
    return jax.nn.log_softmax(x, axis=axis)


# ---------------------------------------------------------------------------
# Param utilities
# ---------------------------------------------------------------------------

def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def tree_cast(params, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), params)


def split_keys(key, n: int) -> Sequence[jax.Array]:
    return jax.random.split(key, n)
