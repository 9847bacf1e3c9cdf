"""Image sentiment detector, "full" variant
(reference models/sentiment_detector_full.py:5-73).

Dead code in the reference — its required setting is commented out at
reference opts.py:91 (`# settings['num_kernels_per_sentiment'] = 4`) so no
entry point can construct it — implemented here behind
``Settings.num_kernels_per_sentiment > 0`` for literal component
completeness (VERDICT r4 next #6). Selected via
``sentiment_detector.module_for(settings)``.

Architecture (reference :11-54): the same 3x3 conv stack as the standard
detector (``sentiment_convs_num`` channel-halving convs, one dropout+ReLU
after the stack) feeding a 1x1 conv with ``k = num_kernels_per_sentiment``
kernels PER sentiment class (:23). Two branches:

- detection: global max pool over space (:37), then mean over each class's
  k kernels (AdaptiveAvgPool1d(num_sentis) over the k*S channel axis, :39
  — contiguous blocks of k, so channel ``c*k + j`` belongs to class c)
  -> ``det_out`` [bs, S];
- classification: softmax(det_out) weights the per-class mean activation
  maps into one spatial sentiment map (:42-47); the conv features and the
  map-gated conv features are globally avg-pooled and concatenated
  ([mean(x), mean(x * map)], channel order fixed by the torch cat at :49)
  into a single Linear -> ``cls_out`` [bs, S] (:30, :49-52).

``sample`` thresholds on softmax(cls_out) like the standard detector's
(:56-63; its default threshold is 0 there, callers pass it explicitly
here). The API mirrors models/sentiment_detector.py so the trainer /
eval steps work unchanged through ``module_for``.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .. import nn
from ..ops.winograd import conv2d_fast, pallas_eligible


def init_params(key, num_sentiments: int, settings) -> Dict:
    k = settings.num_kernels_per_sentiment
    assert k > 0, "full variant needs num_kernels_per_sentiment > 0"
    ks = nn.split_keys(key, settings.sentiment_convs_num + 2)
    params: Dict = {"convs": []}
    in_ch = settings.fc_feat_dim
    for i in range(settings.sentiment_convs_num):
        params["convs"].append(nn.conv2d_init(ks[i], in_ch, in_ch // 2, 3, 3))
        in_ch //= 2
    params["senti_conv"] = nn.conv2d_init(
        ks[settings.sentiment_convs_num], in_ch, num_sentiments * k, 1, 1)
    params["cls"] = nn.linear_init(ks[settings.sentiment_convs_num + 1],
                                   2 * in_ch, num_sentiments)
    return params


def _conv_stack(params, features, *, dropout_p, rng, deterministic):
    """The shared conv head in [bs, H, W, C]; bf16 TPU serving rides the
    same pallas Winograd stack as the standard detector (this variant is
    not on any hot path, so the spatial-major output stays un-optimized —
    one transpose back after the stack)."""
    fast = deterministic and bool(params["convs"]) and all(
        pallas_eligible(features.shape, cp["w"].shape, features.dtype)
        for cp in params["convs"])
    if fast:
        from ..ops.winograd_pallas import conv3x3_stack_sm
        x = conv3x3_stack_sm(features.transpose(1, 2, 0, 3),
                             [(cp["w"], cp.get("b"))
                              for cp in params["convs"]],
                             variant="f5").transpose(2, 0, 1, 3)
    else:
        x = features
        for cp in params["convs"]:
            x = conv2d_fast(cp, x, stride=1, padding="SAME",
                            allow_pallas=deterministic)
    if not deterministic:
        x = nn.dropout(rng, x, dropout_p, deterministic)
    return jax.nn.relu(x)


def forward_full(params, features, *, dropout_p: float, rng=None,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """features [bs, H, W, fc_feat_dim] -> (det_out [bs, S],
    cls_out [bs, S], spatial map [bs, H, W])."""
    x = _conv_stack(params, features, dropout_p=dropout_p, rng=rng,
                    deterministic=deterministic)                # [b,H,W,n]
    senti_maps = nn.conv2d(params["senti_conv"], x, stride=1,
                           padding="SAME")                      # [b,H,W,S*k]
    bs, h, w, sk = senti_maps.shape
    n_cls = params["cls"]["w"].shape[1]
    k = sk // n_cls
    # detection branch: spatial max, then mean over each class's k kernels
    det_out = senti_maps.max(axis=(1, 2)).reshape(bs, n_cls, k).mean(-1)
    # classification branch: softmax(det) weights the per-class mean maps
    class_maps = senti_maps.reshape(bs, h, w, n_cls, k).mean(-1)
    weights = jax.nn.softmax(det_out, axis=-1)
    spatial = jnp.einsum("bs,bhws->bhw", weights, class_maps)
    semantic = jnp.concatenate(
        [x.mean(axis=(1, 2)),
         (x * spatial[..., None]).mean(axis=(1, 2))], axis=-1)  # [b, 2n]
    cls_out = nn.linear(params["cls"], semantic)
    return det_out, cls_out, spatial


def forward(params, features, *, dropout_p: float, rng=None,
            deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard-detector-shaped surface: (cls logits [bs, S],
    spatial [bs, H, W]). sample/CE run on the classification branch —
    the branch the reference's own ``sample`` thresholds (:59-61)."""
    _, cls_out, spatial = forward_full(params, features, dropout_p=dropout_p,
                                       rng=rng, deterministic=deterministic)
    return cls_out, spatial


def sample(params, features, senti_threshold: float, neu_idx: int):
    """(labels [bs] int32, spatial [bs, H, W], scores [bs]) — low-confidence
    predictions fall back to neutral (reference :56-63)."""
    logits, spatial = forward(params, features, dropout_p=0.0,
                              deterministic=True)
    probs = jax.nn.softmax(logits, axis=-1)
    scores = probs.max(axis=-1)
    labels = probs.argmax(axis=-1).astype(jnp.int32)
    labels = jnp.where(scores < senti_threshold, neu_idx, labels)
    return labels, spatial, scores


def xent_loss(params, features, labels, *, dropout_p: float, rng,
              deterministic: bool):
    """CE on the classification logits (reference get_optim_criterion
    :71-73 pairs the variant with nn.CrossEntropyLoss; the detection
    branch carries no loss of its own in the reference as written)."""
    logits, _ = forward(params, features, dropout_p=dropout_p, rng=rng,
                        deterministic=deterministic)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return nll.mean()


def xent_nll_rows(params, features, labels):
    """Per-row CE (deterministic) — masked eval aggregation building
    block."""
    logits, _ = forward(params, features, dropout_p=0.0,
                        deterministic=True)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
