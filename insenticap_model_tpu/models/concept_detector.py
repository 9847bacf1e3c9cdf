"""Multi-label concept detector (reference models/concept_detector.py:5-58).

A 3-layer MLP (fc_feat_dim -> mid -> mid -> num_concepts) with sigmoid output;
``sample`` returns top-k concepts by score. The reference's hand-written
multi-label BCE (mean of each term over both dims) is preserved exactly.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .. import nn


def init_params(key, num_concepts: int, settings) -> Dict:
    k1, k2, k3 = nn.split_keys(key, 3)
    return {
        "fc1": nn.linear_init(k1, settings.fc_feat_dim, settings.concept_mid_dim),
        "fc2": nn.linear_init(k2, settings.concept_mid_dim,
                              settings.concept_mid_dim),
        "fc3": nn.linear_init(k3, settings.concept_mid_dim, num_concepts),
    }


def forward(params, features, *, dropout_p: float, rng=None,
            deterministic: bool = True):
    """features [bs, fc_feat_dim] -> sigmoid scores [bs, num_concepts].
    Dropout sits between fc2's ReLU and fc3 (reference :10-18)."""
    x = jax.nn.relu(nn.linear(params["fc1"], features))
    x = jax.nn.relu(nn.linear(params["fc2"], x))
    if not deterministic:
        x = nn.dropout(rng, x, dropout_p, deterministic)
    return jax.nn.sigmoid(nn.linear(params["fc3"], x))


def sample(params, features, num: int):
    """Top-`num` concept indices by score (reference :24-37).
    Returns (scores_full [bs, C], top_idx [bs, num], top_scores [bs, num])."""
    out = forward(params, features, dropout_p=0.0, deterministic=True)
    top_scores, top_idx = jax.lax.top_k(out, num)
    return out, top_idx, top_scores


def multi_label_loss_rows(result, target):
    """Per-row form of MultiLabelClsLoss (mean over rows == the reference
    loss); used for masked eval aggregation that excludes padding rows."""
    t = target.astype(result.dtype)
    eps = 1e-12
    pos = -(t * jnp.log(jnp.maximum(result, eps))).mean(axis=-1)
    neg = -((1.0 - t) * jnp.log(jnp.maximum(1.0 - result, eps))).mean(axis=-1)
    return pos + neg


def multi_label_loss(result, target):
    """Reference MultiLabelClsLoss (:44-58): -mean(t*log p) - mean((1-t)*log(1-p)),
    each term averaged over both dims. No epsilon — the reference has none;
    we clamp only to avoid -inf on exact 0/1 saturation."""
    return multi_label_loss_rows(result, target).mean()
