"""Sentence sentiment classifier (reference models/sent_senti_cls.py:6-72).

Embedding(+ReLU+dropout) -> unidirectional LSTM -> squeeze-excitation gate
producing per-token scalar weights that (a) pool the sentence representation
and (b) later serve as per-token RL reward weights (self_critical/utils.py:
120-151). The torch pack/pad dance (outputs zeroed past each sequence's
length) collapses to a fixed-T scan + length mask — unidirectional LSTM
outputs at t < len are unaffected by later inputs, so values are identical.

The per-token weight is the MEAN over the hidden dim of the excitation output
(reference's AdaptiveAvgPool1d(1) over the channel axis, :30, :50).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .. import nn


def init_params(key, vocab_size: int, num_senti_cats: int, settings) -> Dict:
    ks = nn.split_keys(key, 7)
    H = settings.rnn_hid_dim
    return {
        "word_embed": nn.embedding_init(ks[0], vocab_size,
                                        settings.word_emb_dim),
        "lstm": nn.lstm_cell_init(ks[1], settings.word_emb_dim, H),
        "excitation1": nn.linear_init(ks[2], H, H),
        "excitation2": nn.linear_init(ks[3], H, H),
        "cls1": nn.linear_init(ks[4], H, H),
        "cls2": nn.linear_init(ks[5], H, num_senti_cats),
    }


def forward(params, seqs, lengths, *, settings, rng=None,
            deterministic: bool = True
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """seqs [bs, T] int ids (WITHOUT the leading SOS — callers pass
    captions[:, 1:], reference decoder.py:134), lengths [bs].

    Returns (logits [bs, S], att_weights [bs, T])."""
    p = settings.dropout_p
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_e, k_d = jax.random.split(rng)
    bs, T = seqs.shape
    H = settings.rnn_hid_dim

    x = jax.nn.relu(nn.embed(params["word_embed"], seqs, pad_id=0))
    x = nn.dropout(k_e, x, p, deterministic)                     # [bs, T, We]

    def step(hc, xt):
        h, c = nn.lstm_cell(params["lstm"], xt, hc)
        return (h, c), h

    h0 = jnp.zeros((bs, H), x.dtype)
    _, outs = jax.lax.scan(step, (h0, h0), jnp.transpose(x, (1, 0, 2)))
    out = jnp.transpose(outs, (1, 0, 2))                         # [bs, T, H]
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(out.dtype)
    out = out * mask[..., None]           # pack/pad zeroing (reference :40-42)
    out = nn.dropout(k_d, out, p, deterministic)

    ex = jax.nn.relu(nn.linear(params["excitation1"], out))
    ex = jax.nn.sigmoid(nn.linear(params["excitation2"], ex))    # [bs, T, H]
    ex = ex * mask[..., None]             # second pack/pad (reference :47-49)
    weights = ex.mean(axis=-1)            # AdaptiveAvgPool1d(1) -> [bs, T]

    sent_feats = jnp.einsum("bt,bth->bh", weights, out)          # [bs, H]
    h1 = jax.nn.relu(nn.linear(params["cls1"], sent_feats))
    if not deterministic:
        h1 = nn.dropout(jax.random.fold_in(rng, 2), h1, p, deterministic)
    logits = nn.linear(params["cls2"], h1)                       # [bs, S]
    return logits, weights


def sample(params, seqs, lengths, *, settings):
    """argmax labels + attention weights (reference :58-68)."""
    logits, weights = forward(params, seqs, lengths, settings=settings,
                              deterministic=True)
    return logits.argmax(axis=-1).astype(jnp.int32), weights


def xent_loss(params, seqs, lengths, labels, *, settings, rng,
              deterministic: bool):
    logits, _ = forward(params, seqs, lengths, settings=settings, rng=rng,
                        deterministic=deterministic)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0].mean()


def xent_nll_rows(params, seqs, lengths, labels, *, settings):
    """Per-row CE (deterministic) — masked eval aggregation building
    block."""
    logits, _ = forward(params, seqs, lengths, settings=settings,
                        rng=jax.random.PRNGKey(0), deterministic=True)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
