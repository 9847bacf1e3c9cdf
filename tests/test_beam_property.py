"""Config-sweep property test for the batched beam search.

test_reference_parity.py::test_beam_search_parity pins ONE config (beam=3,
decoding_constraint on, T=12) against the torch reference. This module
checks the semantics at OTHER configs (beam 1/2/4/5, dc on/off, xe/rl
modes, short horizons, batch > 1) against a transparent candidate-at-a-time
oracle that mirrors the reference's algorithm (captioner.py:380-411)
step for step in plain Python/numpy:

  * expand each live candidate's top-``beam`` continuations, score =
    parent sum-logprob + token logprob (no length normalization, §8.10);
  * candidates that emitted EOS persist frozen, competing once per step;
  * PAD/SOS/UNK banned; last word banned under decoding_constraint
    (captioner.py:394-399);
  * global top-``beam`` by score, first-index-wins tie order (matching
    ops/beam._topk_argmax's iterative-argmax ordering).

Both sides share the same jitted single-row decode_step, so any mismatch
isolates the batched selection/backtrack machinery (flat [bs*B] rows,
one-hot einsum state select, ended-slot handling, reverse backtrack) —
the parts the reference implements with Python lists.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from insenticap_model_tpu.config import Settings
from insenticap_model_tpu.models import captioner as cap
from insenticap_model_tpu.ops import beam

pytestmark = pytest.mark.slow  # config sweep; fast-gate beam coverage
                               # lives in test_inference/test_fused_topk

V, M = 30, 5
IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
NEG_INF = beam.NEG_INF


@pytest.fixture(scope="module")
def settings():
    return Settings(word_emb_dim=12, fc_feat_dim=20, att_feat_dim=20,
                    feat_emb_dim=12, rnn_hid_dim=12, att_hid_dim=12,
                    concept_mid_dim=20)


@pytest.fixture(scope="module")
def params(settings):
    return cap.init_params(jax.random.PRNGKey(7), V, 3, settings)


def _ctx(params, settings, bs, mode, seed):
    g = np.random.default_rng(seed)
    fc = jnp.asarray(g.normal(size=(bs, settings.fc_feat_dim)),
                     jnp.float32)
    att = jnp.asarray(g.normal(size=(bs, 9, settings.att_feat_dim)),
                      jnp.float32)
    if mode == "rl":
        sentis = jnp.asarray(g.integers(4, V, size=(bs, M)), jnp.int32)
        labels = jnp.asarray(g.integers(0, 3, size=(bs,)), jnp.int32)
    else:  # xe decode: no senti words/labels (inference.decode_xe)
        sentis = labels = None
    ctx, _ = cap.build_visual_context(
        params, fc, att, settings.dropout_p, jax.random.PRNGKey(0), True,
        senti_words=sentis, senti_labels=labels, pad_id=IDS.pad)
    return ctx


def _row(ctx, i):
    """Single-image slice of a DecodeContext."""
    return cap.DecodeContext(*(None if f is None else f[i:i + 1]
                               for f in ctx))


def oracle_beam(step1, ctx1, hid_dim, B, T, dc):
    """Candidate-at-a-time beam search mirroring reference
    captioner.py:380-411; returns (seqs [B, T] EOS-padded, scores [B])."""
    z = jnp.zeros((1, hid_dim), jnp.float32)
    cands = [{"score": 0.0, "toks": [], "state": cap.DecodeState(z, z, z, z),
              "last": IDS.sos, "ended": False}]
    for t in range(T):
        if all(c["ended"] for c in cands):
            break
        entries = []  # (score, flat order index, parent, word, state)
        for pi, c in enumerate(cands):
            if c["ended"]:
                # frozen: competes once, at its slot's k=0 position
                entries.append((c["score"], pi * B, c, IDS.eos, c["state"]))
                continue
            lp, st, _ = step1(ctx1, c["state"],
                              jnp.asarray([c["last"]], jnp.int32))
            lp = np.asarray(lp[0], np.float64)
            for tok in (IDS.pad, IDS.sos, IDS.unk):
                lp[tok] = NEG_INF
            if dc:
                lp[c["last"]] = NEG_INF
            top = np.argsort(-lp, kind="stable")[:B]  # first index wins ties
            for k, w in enumerate(top):
                entries.append((c["score"] + lp[w], pi * B + k, c,
                                int(w), st))
        entries.sort(key=lambda e: (-e[0], e[1]))
        cands = [{"score": sc, "toks": c["toks"] + [w], "state": st,
                  "last": w, "ended": c["ended"] or w == IDS.eos}
                 for sc, _, c, w, st in entries[:B]]
    seqs = np.full((B, T), IDS.eos, np.int32)
    for i, c in enumerate(cands):
        seqs[i, :len(c["toks"])] = c["toks"]
    return seqs, np.asarray([c["score"] for c in cands], np.float64)


@pytest.mark.parametrize("mode,B,T,dc", [
    ("rl", 1, 8, True),    # beam=1 degenerate case
    ("rl", 2, 8, False),   # no decoding constraint
    ("rl", 4, 6, True),
    ("rl", 5, 5, True),    # beam > the usual 3, short horizon
    ("xe", 3, 8, True),    # content-attention-only decode (decode_xe path)
    ("xe", 2, 10, False),
])
def test_batched_beam_matches_candidate_oracle(params, settings, mode, B,
                                               T, dc):
    bs = 2
    ctx = _ctx(params, settings, bs, mode, seed=B * 10 + T)

    seqs, scores = jax.jit(
        lambda c: beam.beam_search_batched(
            params, c, settings=settings, ids=IDS, beam_size=B,
            max_seq_len=T, mode=mode, decoding_constraint=dc))(ctx)
    seqs, scores = np.asarray(seqs), np.asarray(scores, np.float64)

    step1 = jax.jit(lambda c, st, it: cap.decode_step(
        params, c, st, it, mode=mode, dropout_p=0.0,
        drop_key=jax.random.PRNGKey(0), deterministic=True))
    for i in range(bs):
        oseqs, oscores = oracle_beam(step1, _row(ctx, i),
                                     settings.rnn_hid_dim, B, T, dc)
        np.testing.assert_array_equal(seqs[i], oseqs)
        np.testing.assert_allclose(scores[i], oscores, atol=5e-5)
