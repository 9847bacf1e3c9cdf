"""Fused classifier+log_softmax+ban+topk kernel: exact agreement with the
XLA reference path (interpret mode on CPU; the TPU-compiled kernel was
verified on-chip to produce identical indices at serving shapes)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from insenticap_model_tpu.ops.fused_topk import classifier_topk


@pytest.mark.parametrize("rows,V,k", [(16, 1024, 3), (8, 512, 5)])
def test_matches_xla_topk(rows, V, k):
    g = np.random.default_rng(0)
    H = 64
    h = jnp.asarray(g.normal(size=(rows, H)), jnp.float32)
    w = jnp.asarray(g.normal(size=(H, V)) * 0.05, jnp.float32)
    b = jnp.asarray(g.normal(size=(V,)) * 0.1, jnp.float32)
    last = jnp.asarray(g.integers(4, V, size=(rows,)), jnp.int32)
    banned = (0, 1, 2)

    ov, oi = classifier_topk(h, w, b, last, k=k, banned=banned,
                             tile_r=rows, tile_v=256, interpret=True)

    logits = h @ w + b
    lp = jax.nn.log_softmax(logits, axis=-1)
    for t in banned:
        lp = lp.at[:, t].set(-1e30)
    lp = jnp.where(jax.nn.one_hot(last, V, dtype=jnp.bool_), -1e30, lp)
    rv, ri = jax.lax.top_k(lp, k)

    np.testing.assert_array_equal(np.asarray(oi), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(ov), np.asarray(rv), atol=1e-5)
    # bans hold
    assert not np.isin(np.asarray(oi), banned).any()
    assert not (np.asarray(oi) == np.asarray(last)[:, None]).any()


def test_vocab_padding_tail_never_wins():
    g = np.random.default_rng(1)
    rows, H, V, Vp = 8, 32, 300, 512
    h = jnp.asarray(g.normal(size=(rows, H)), jnp.float32)
    w = jnp.asarray(g.normal(size=(H, V)) * 0.05, jnp.float32)
    wp = jnp.pad(w, ((0, 0), (0, Vp - V)))
    b = jnp.asarray(g.normal(size=(V,)) * 0.1, jnp.float32)
    bp = jnp.pad(b, (0, Vp - V), constant_values=-1e30)
    last = jnp.full((rows,), -1, jnp.int32)
    ov, oi = classifier_topk(h, wp, bp, last, k=3, banned=(),
                             tile_r=rows, tile_v=256, interpret=True)
    assert int(np.asarray(oi).max()) < V
    lp = jax.nn.log_softmax(h @ w + b, axis=-1)
    rv, ri = jax.lax.top_k(lp, 3)
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(ov), np.asarray(rv), atol=1e-5)


def test_beam_content_attention_matches_reference():
    """Beam-shared attention kernel (interpret mode) vs the tiled-rows
    content_attention it replaces."""
    from insenticap_model_tpu import nn
    from insenticap_model_tpu.models.captioner import content_attention
    from insenticap_model_tpu.ops.fused_attention import (
        beam_content_attention)
    g = np.random.default_rng(0)
    bs, B, N, H1, Ah, Fe = 8, 3, 49, 32, 32, 32
    p_cont = {"h2att": nn.linear_init(jax.random.PRNGKey(0), H1, Ah),
              "att_alpha": nn.linear_init(jax.random.PRNGKey(1), Ah, 1)}
    h = jnp.asarray(g.normal(size=(bs * B, H1)), jnp.float32)
    att = jnp.asarray(g.normal(size=(bs, N, Fe)), jnp.float32)
    p_att = jnp.asarray(g.normal(size=(bs, N, Ah)), jnp.float32)
    out = beam_content_attention(h, p_cont, att, p_att, B=B, tile_b=4,
                                 interpret=True)
    ref, _ = content_attention(p_cont, h, jnp.repeat(att, B, 0),
                               jnp.repeat(p_att, B, 0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # v2 (MXU-reduce restructure) computes the same math
    out2 = beam_content_attention(h, p_cont, att, p_att, B=B, tile_b=4,
                                  interpret=True, variant="v2")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=2e-5)
