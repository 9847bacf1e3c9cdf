"""End-to-end trainability: XE training overfits a tiny synthetic dataset
and greedy decode reproduces the training captions. This guards the whole
gradient path (scan decode cell, attention, losses, optimizer) — shape
tests can't catch a wrong-but-finite gradient."""
import numpy as np

import jax
import jax.numpy as jnp

from insenticap_model_tpu.models import captioner as cap
from insenticap_model_tpu.models import sent_senti_cls as ss_cls
from insenticap_model_tpu.training import optim, steps
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast gate

IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
V = 24
T = 6


def test_xe_overfits_and_greedy_reproduces():
    from insenticap_model_tpu.config import Settings
    settings = Settings(word_emb_dim=16, fc_feat_dim=32, att_feat_dim=32,
                        feat_emb_dim=16, dropout_p=0.0, rnn_hid_dim=16,
                        att_hid_dim=16, concept_mid_dim=24)
    g = np.random.default_rng(0)
    bs = 8
    # fixed distinct captions, one per image
    caps = np.zeros((bs, T + 1), np.int32)
    lengths = np.zeros((bs,), np.int32)
    for i in range(bs):
        L = 5
        caps[i, 0] = IDS.sos
        caps[i, 1:L] = 4 + (np.arange(4) + 2 * i) % (V - 4)
        caps[i, L] = IDS.eos
        lengths[i] = L
    batch = {
        "fc": g.normal(size=(bs, settings.fc_feat_dim)).astype(np.float32),
        "att": g.normal(size=(bs, 9, settings.att_feat_dim)).astype(
            np.float32),
        "caps": caps, "lengths": lengths,
        "cpts": np.zeros((bs, 3), np.int32),
    }

    params = cap.init_params(jax.random.PRNGKey(0), V, 3, settings)
    cls_params = ss_cls.init_params(jax.random.PRNGKey(1), V, 3, settings)
    tx = optim.make_optimizer(5e-3, grad_clip=10.0)
    opt_state = tx.init(params)
    train_step, _ = steps.make_xe_steps(settings, tx)

    first = last = None
    for i in range(300):
        params, opt_state, losses = train_step(
            params, opt_state, cls_params, batch, None,
            jax.random.PRNGKey(i), jnp.float32(0.0))
        if first is None:
            first = float(losses["xe_loss"])
        last = float(losses["xe_loss"])
    assert last < 0.15, f"xe_loss did not converge: {first} -> {last}"
    assert last < first / 10

    # beam decode (xe mode, with the same pseudo labels training saw) must
    # reproduce the memorized captions
    from insenticap_model_tpu import nn
    from insenticap_model_tpu.ops import beam
    logits, _ = ss_cls.forward(cls_params, jnp.asarray(caps[:, 1:]),
                               jnp.asarray(lengths), settings=settings,
                               deterministic=True)
    labels = logits.argmax(axis=-1)
    ctx, _ = cap.build_visual_context(
        params, jnp.asarray(batch["fc"]), jnp.asarray(batch["att"]),
        settings.dropout_p, jax.random.PRNGKey(0), True)
    lab = jax.nn.relu(nn.embed(params["senti_label_embed"], labels))
    ctx = ctx._replace(senti_label=lab)
    seqs, _ = beam.beam_search_batched(
        params, ctx, settings=settings, ids=IDS, beam_size=2,
        max_seq_len=T, mode="xe")
    seqs = np.asarray(seqs)[:, 0]
    ok = 0
    for i in range(bs):
        want = list(caps[i, 1:lengths[i]]) + [IDS.eos]
        got = list(seqs[i, :len(want)])
        ok += got == want
    assert ok >= bs - 1, f"decode reproduced only {ok}/{bs} captions"
