"""Sentiment-controllable attention-LSTM captioner, TPU-first.

Capability parity with the reference Captioner (models/captioner.py:121-424):
an Up-Down-style two-LSTM decoder whose per-step cell fuses word+sentiment
embedding, the att LSTM, a three-way attention (content / sentiment-word /
sigmoid-gated fusion), the lang LSTM, and the vocab classifier. Where the
reference runs a Python loop over timesteps (captioner.py:218-234,323-344),
this implementation builds one fused step function and runs it under
``jax.lax.scan`` so XLA compiles the whole decode as a single on-device loop.

Everything is shape-static: captions are padded to ``max_seq_len + 1`` and
losses are masked (the reference's length-sorted dynamic batching collapses
to fixed-shape padding + masks, SURVEY.md §7).

Modes (reference captioner.py:188-192):
  'xe'      — teacher forcing with scheduled sampling; content attention only.
  'seq2seq' — text-only: concept embedding replaces fc feats; sentiment-word
              attention only (captioner.py:242-288).
  'rl'      — sampled/greedy rollout; gated fusion of both attentions
              (captioner.py:290-349).
"""
from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import nn

# A/B knob: lax.scan unroll factor for the training rollout/teacher-forced
# scans (serving keeps its early-exit while_loop). Measurement knob only.
_SCAN_UNROLL = int(os.environ.get("ISC_SCAN_UNROLL", "1"))


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_params(key, vocab_size: int, num_senti_cats: int, settings) -> Dict:
    """Parameter pytree for the captioner. Shapes mirror the reference modules
    (captioner.py:132-161) with [in, out] linear layout."""
    s = settings
    ks = nn.split_keys(key, 16)
    return {
        "word_embed": nn.embedding_init(ks[0], vocab_size, s.word_emb_dim),
        "senti_label_embed": nn.embedding_init(ks[1], num_senti_cats,
                                               s.word_emb_dim),
        "fc_embed": nn.linear_init(ks[2], s.fc_feat_dim, s.feat_emb_dim),
        "cpt2fc": nn.linear_init(ks[3], s.word_emb_dim, s.feat_emb_dim),
        "att_embed": nn.linear_init(ks[4], s.att_feat_dim, s.feat_emb_dim),
        "att2att": nn.linear_init(ks[5], s.feat_emb_dim, s.att_hid_dim),
        "senti2att": nn.linear_init(ks[6], s.word_emb_dim, s.att_hid_dim),
        "att_lstm": nn.lstm_cell_init(
            ks[7], s.rnn_hid_dim + s.feat_emb_dim + s.word_emb_dim,
            s.rnn_hid_dim),
        "lang_lstm": nn.lstm_cell_init(
            ks[8], s.rnn_hid_dim + s.feat_emb_dim, s.rnn_hid_dim),
        "classifier": nn.linear_init(ks[9], s.rnn_hid_dim, vocab_size),
        "attention": {
            "cont": {
                "h2att": nn.linear_init(ks[10], s.rnn_hid_dim, s.att_hid_dim),
                "att_alpha": nn.linear_init(ks[11], s.att_hid_dim, 1),
            },
            "senti": {
                "h2word": nn.linear_init(ks[12], s.rnn_hid_dim, s.att_hid_dim),
                "label2word": nn.linear_init(ks[13], s.word_emb_dim,
                                             s.att_hid_dim),
                "word_alpha": nn.linear_init(ks[14], s.att_hid_dim, 1),
            },
            "fuse": {
                "h2att": nn.linear_init(ks[15], s.rnn_hid_dim, s.att_hid_dim),
                "cont2att": nn.linear_init(
                    jax.random.fold_in(key, 100), s.feat_emb_dim, s.att_hid_dim),
                "senti2att": nn.linear_init(
                    jax.random.fold_in(key, 101), s.feat_emb_dim, s.att_hid_dim),
                "att_alpha": nn.linear_init(
                    jax.random.fold_in(key, 102), s.att_hid_dim, 1),
            },
        },
    }


class TokenIds(NamedTuple):
    pad: int
    unk: int
    sos: int
    eos: int
    neutral: int  # index of 'neutral' in sentiment categories


class DecodeState(NamedTuple):
    """Carried LSTM state: [bs, H] each."""
    h_att: jnp.ndarray
    c_att: jnp.ndarray
    h_lang: jnp.ndarray
    c_lang: jnp.ndarray


def init_state(batch: int, hid_dim: int, dtype=jnp.float32) -> DecodeState:
    z = jnp.zeros((batch, hid_dim), dtype)
    return DecodeState(z, z, z, z)


class DecodeContext(NamedTuple):
    """Per-sequence invariants, embedded once before the scan
    (mirrors reference captioner.py:198-216,247-263,294-317)."""
    fc: jnp.ndarray                              # [bs, Fe] (post-dropout)
    att: Optional[jnp.ndarray]                   # [bs, N, Fe]
    p_att: Optional[jnp.ndarray]                 # [bs, N, Ah]
    senti_word: Optional[jnp.ndarray]            # [bs, M+1, We]
    p_senti_word: Optional[jnp.ndarray]          # [bs, M+1, Ah]
    senti_label: Optional[jnp.ndarray]           # [bs, We]


# ---------------------------------------------------------------------------
# Context builders
# ---------------------------------------------------------------------------

def _relu_linear(p, x):
    return jax.nn.relu(nn.linear(p, x))


def embed_word(params, ids):
    """ReLU'd word embedding with hard-zero pad rows
    (reference captioner.py:133-135). pad_id is 0 by vocabulary construction;
    the zero-row masking in nn.embed uses it."""
    return jax.nn.relu(nn.embed(params["word_embed"], ids, pad_id=0))


def concept_fc(params, cpt_words):
    """Concept words -> mean word embedding -> fc space (captioner.py:201-203).
    Returns pre-dropout cpt_feats used by the domain-alignment loss."""
    cpt = embed_word(params, cpt_words)          # [bs, num_cpts, We]
    cpt = cpt.mean(axis=1)                       # [bs, We]
    return _relu_linear(params["cpt2fc"], cpt)   # [bs, Fe]


def build_visual_context(params, fc_feats, att_feats, dropout_p,
                         rng, deterministic,
                         senti_words=None, senti_labels=None, pad_id=0):
    """Embed visual features (+ optional sentiment words/labels) once.

    Returns (ctx, aux) where aux carries pre-dropout fc_emb for the
    domain-alignment MSE (reference captioner.py:199, decoder.py:89).
    Dropout masks are drawn once per forward, not per step, matching the
    reference placement (captioner.py:198-214).
    """
    k = nn.split_keys(rng, 5)
    fc_emb = _relu_linear(params["fc_embed"], fc_feats)          # [bs, Fe]
    fc = nn.dropout(k[0], fc_emb, dropout_p, deterministic)

    bs = att_feats.shape[0]
    att = att_feats.reshape(bs, -1, att_feats.shape[-1])         # [bs, N, Fa]
    att = _relu_linear(params["att_embed"], att)                 # [bs, N, Fe]
    att = nn.dropout(k[1], att, dropout_p, deterministic)
    # att2att is Linear+ReLU in the reference (captioner.py:149-150)
    p_att = _relu_linear(params["att2att"], att)                 # [bs, N, Ah]

    senti_word = p_senti_word = senti_label = None
    if senti_words is not None:
        # Prepend a PAD column: gives the sentiment attention a null slot
        # (reference captioner.py:307-309; SURVEY.md §8.13).
        pad_col = jnp.full((bs, 1), pad_id, senti_words.dtype)
        sw = jnp.concatenate([pad_col, senti_words], axis=1)     # [bs, M+1]
        senti_word = embed_word(params, sw)                      # [bs, M+1, We]
        senti_word = nn.dropout(k[2], senti_word, dropout_p, deterministic)
        p_senti_word = _relu_linear(params["senti2att"], senti_word)
    if senti_labels is not None:
        lab = jax.nn.relu(nn.embed(params["senti_label_embed"], senti_labels))
        senti_label = nn.dropout(k[3], lab, dropout_p, deterministic)

    ctx = DecodeContext(fc, att, p_att, senti_word, p_senti_word, senti_label)
    return ctx, {"fc_emb": fc_emb}


def build_seq2seq_context(params, cpt_words, senti_words, senti_labels,
                          dropout_p, rng, deterministic, pad_id=0):
    """Text-only context: cpt_feats stand in for fc feats; no visual
    attention (reference captioner.py:247-263)."""
    k = nn.split_keys(rng, 4)
    bs = cpt_words.shape[0]
    cpt_feats = concept_fc(params, cpt_words)                    # [bs, Fe]
    fc = nn.dropout(k[0], cpt_feats, dropout_p, deterministic)

    pad_col = jnp.full((bs, 1), pad_id, senti_words.dtype)
    sw = jnp.concatenate([pad_col, senti_words], axis=1)
    senti_word = embed_word(params, sw)
    senti_word = nn.dropout(k[1], senti_word, dropout_p, deterministic)
    p_senti_word = _relu_linear(params["senti2att"], senti_word)

    lab = jax.nn.relu(nn.embed(params["senti_label_embed"], senti_labels))
    senti_label = nn.dropout(k[2], lab, dropout_p, deterministic)

    return DecodeContext(fc, None, None, senti_word, p_senti_word, senti_label)


# ---------------------------------------------------------------------------
# Attention (reference captioner.py:12-118)
# ---------------------------------------------------------------------------

def content_attention(p, h, att, p_att):
    """Additive attention over visual regions (captioner.py:12-35)."""
    h_att = nn.linear(p["h2att"], h)                             # [bs, Ah]
    e = jnp.tanh(p_att + h_att[:, None, :])                      # [bs, N, Ah]
    e = nn.linear(p["att_alpha"], e)[..., 0]                     # [bs, N]
    w = jax.nn.softmax(e, axis=-1)
    res = jnp.einsum("bn,bnf->bf", w, att)
    return res, w


def senti_attention(p, h, senti_word, p_senti_word, senti_label):
    """Additive attention over sentiment-word embeddings with the sentiment
    label folded into the query (captioner.py:38-62)."""
    h_word = nn.linear(p["h2word"], h)                           # [bs, Ah]
    lab = nn.linear(p["label2word"], senti_label)                # [bs, Ah]
    e = jnp.tanh(p_senti_word + h_word[:, None, :] + lab[:, None, :])
    e = nn.linear(p["word_alpha"], e)[..., 0]                    # [bs, M+1]
    w = jax.nn.softmax(e, axis=-1)
    res = jnp.einsum("bn,bnf->bf", w, senti_word)
    return res, w


def fused_attention(p_attn, h, ctx: DecodeContext, mode: str):
    """Mode switch (captioner.py:96-118). Returns (att_result, weights dict)."""
    weights: Dict[str, Any] = {}
    if mode == "seq2seq":
        res, w = senti_attention(p_attn["senti"], h, ctx.senti_word,
                                 ctx.p_senti_word, ctx.senti_label)
        weights["senti"] = w
        return res, weights
    cont_res, wc = content_attention(p_attn["cont"], h, ctx.att, ctx.p_att)
    weights["cont"] = wc
    if mode == "xe":
        return cont_res, weights
    # rl: sigmoid-gated fusion w*cont + (1-w)*senti (captioner.py:105-118)
    senti_res, ws = senti_attention(p_attn["senti"], h, ctx.senti_word,
                                    ctx.p_senti_word, ctx.senti_label)
    weights["senti"] = ws
    f = p_attn["fuse"]
    gate = (nn.linear(f["cont2att"], cont_res)
            + nn.linear(f["senti2att"], senti_res)
            + nn.linear(f["h2att"], h))
    gate = jax.nn.sigmoid(nn.linear(f["att_alpha"], jnp.tanh(gate)))  # [bs,1]
    weights["fuse"] = gate
    return gate * cont_res + (1.0 - gate) * senti_res, weights


# ---------------------------------------------------------------------------
# The fused decode step (reference forward_step, captioner.py:168-186)
# ---------------------------------------------------------------------------

def decode_cell(params, ctx: DecodeContext, state: DecodeState, it,
                *, mode: str, dropout_p: float, drop_key,
                deterministic: bool):
    """The decode step up to (but excluding) the vocabulary projection:
    embed token -> att LSTM -> attention -> lang LSTM -> dropout. Split out
    so the beam path can fuse the classifier with its top-k (ops/fused_topk)."""
    xt = embed_word(params, it)                                  # [bs, We]
    if ctx.senti_label is not None:
        xt = xt + ctx.senti_label
    a_in = jnp.concatenate([state.h_lang, ctx.fc, xt], axis=1)
    h_att, c_att = nn.lstm_cell(params["att_lstm"], a_in,
                                (state.h_att, state.c_att))
    att_res, weights = fused_attention(params["attention"], h_att, ctx, mode)
    l_in = jnp.concatenate([att_res, h_att], axis=1)
    h_lang, c_lang = nn.lstm_cell(params["lang_lstm"], l_in,
                                  (state.h_lang, state.c_lang))
    out = nn.dropout(drop_key, h_lang, dropout_p, deterministic)
    return out, DecodeState(h_att, c_att, h_lang, c_lang), weights


def decode_step(params, ctx: DecodeContext, state: DecodeState, it,
                *, mode: str, dropout_p: float, drop_key, deterministic: bool):
    """One decoder timestep: embed token -> att LSTM -> attention ->
    lang LSTM -> dropout -> classifier -> log-softmax."""
    out, new_state, weights = decode_cell(
        params, ctx, state, it, mode=mode, dropout_p=dropout_p,
        drop_key=drop_key, deterministic=deterministic)
    logprobs = nn.log_softmax(nn.linear(params["classifier"], out))
    return logprobs, new_state, weights


# ---------------------------------------------------------------------------
# Teacher-forced forward (xe / seq2seq) with scheduled sampling under scan
# (reference captioner.py:194-288; SURVEY.md §7 hard part 4)
# ---------------------------------------------------------------------------

def _teacher_forced_scan(params, ctx: DecodeContext, captions, *, mode: str,
                         dropout_p: float, rng, ss_prob: float,
                         deterministic: bool, hid_dim: int):
    """captions: [bs, T+1] padded ids incl. SOS...EOS. Returns
    logprobs [bs, T, V] for steps predicting captions[:, 1:]."""
    bs, tp1 = captions.shape
    T = tp1 - 1
    state0 = init_state(bs, hid_dim, captions_dtype_to_float(ctx))
    vocab = params["classifier"]["w"].shape[1]
    prev0 = jnp.zeros((bs, vocab), state0.h_att.dtype)

    step_keys = jax.random.split(rng, T)

    def step_fn(carry, xs):
        state, prev_logprobs = carry
        t, key = xs
        k_ss, k_mult, k_drop = jax.random.split(key, 3)
        gt = jax.lax.dynamic_index_in_dim(captions.T, t, axis=0,
                                          keepdims=False)        # [bs]
        if not deterministic:  # ss_prob may be a traced scalar; 0.0 disables
            # Scheduled sampling (captioner.py:218-228): with prob ss_prob
            # per example (only for t >= 1), feed a sample from the previous
            # step's distribution instead of ground truth.
            use_sample = (jax.random.uniform(k_ss, (bs,)) < ss_prob) & (t >= 1)
            sampled = jax.random.categorical(k_mult, prev_logprobs, axis=-1)
            it = jnp.where(use_sample, sampled, gt)
        else:
            it = gt
        logprobs, state, _ = decode_step(
            params, ctx, state, it, mode=mode, dropout_p=dropout_p,
            drop_key=k_drop, deterministic=deterministic)
        return (state, logprobs), logprobs

    (_, _), out = jax.lax.scan(step_fn, (state0, prev0),
                               (jnp.arange(T), step_keys),
                               unroll=_SCAN_UNROLL)
    return jnp.transpose(out, (1, 0, 2))                         # [bs, T, V]


def captions_dtype_to_float(ctx: DecodeContext):
    return ctx.fc.dtype


def forward_xe(params, fc_feats, att_feats, cpt_words, captions, senti_labels,
               *, settings, rng, ss_prob: float = 0.0,
               deterministic: bool = False):
    """XE teacher forcing (reference forward_xe, captioner.py:194-240).

    Returns (logprobs [bs, T, V], aux) with aux = {fc_emb, cpt_feats} for the
    domain-alignment loss MSE(cpt_feats, stop_grad(fc_emb))
    (reference train_xe.py:163)."""
    k_ctx, k_scan = jax.random.split(rng)
    ctx, caux = build_visual_context(
        params, fc_feats, att_feats, settings.dropout_p, k_ctx, deterministic,
        senti_words=None, senti_labels=None)
    # senti label embedding is added to the word embedding in xe mode too
    lab = jax.nn.relu(nn.embed(params["senti_label_embed"], senti_labels))
    lab = nn.dropout(jax.random.fold_in(k_ctx, 7), lab, settings.dropout_p,
                     deterministic)
    ctx = ctx._replace(senti_label=lab)
    cpt_feats = concept_fc(params, cpt_words)
    logprobs = _teacher_forced_scan(
        params, ctx, captions, mode="xe", dropout_p=settings.dropout_p,
        rng=k_scan, ss_prob=ss_prob, deterministic=deterministic,
        hid_dim=settings.rnn_hid_dim)
    return logprobs, {"fc_emb": caux["fc_emb"], "cpt_feats": cpt_feats}


def forward_seq2seq(params, senti_captions, cpt_words, senti_words,
                    senti_labels, *, settings, rng, ss_prob: float = 0.0,
                    deterministic: bool = False):
    """Text-only seq2seq mode (reference forward_seq2seq,
    captioner.py:242-288)."""
    k_ctx, k_scan = jax.random.split(rng)
    ctx = build_seq2seq_context(params, cpt_words, senti_words, senti_labels,
                                settings.dropout_p, k_ctx, deterministic)
    return _teacher_forced_scan(
        params, ctx, senti_captions, mode="seq2seq",
        dropout_p=settings.dropout_p, rng=k_scan, ss_prob=ss_prob,
        deterministic=deterministic, hid_dim=settings.rnn_hid_dim)


# ---------------------------------------------------------------------------
# RL rollout (reference forward_rl, captioner.py:290-349)
# ---------------------------------------------------------------------------

def forward_rl(params, fc_feats, att_feats, cpt_words, senti_words,
               senti_labels, *, settings, ids: TokenIds, max_seq_len: int,
               sample_max: bool, rng, deterministic: bool = False):
    """Vectorized multinomial/greedy rollout under scan.

    Matches the reference's masking semantics exactly: seq_masks[:, t] is the
    pre-update `unfinished`; finished rows emit pad (=0); `unfinished` drops
    on emitting EOS (captioner.py:337-343). The reference's all-EOS early
    break only skips all-masked suffix steps, so running the full T steps is
    value-identical.

    Returns (seq [bs,T] int32, seq_logprobs [bs,T], seq_masks [bs,T], aux).
    """
    k_ctx, k_scan = jax.random.split(rng)
    ctx, caux = build_visual_context(
        params, fc_feats, att_feats, settings.dropout_p, k_ctx, deterministic,
        senti_words=senti_words, senti_labels=senti_labels, pad_id=ids.pad)
    cpt_feats = concept_fc(params, cpt_words)

    bs = fc_feats.shape[0]
    state0 = init_state(bs, settings.rnn_hid_dim, ctx.fc.dtype)
    it0 = jnp.full((bs,), ids.sos, jnp.int32)
    unfinished0 = jnp.ones((bs,), jnp.bool_)
    step_keys = jax.random.split(k_scan, max_seq_len)

    def step_fn(carry, key):
        state, it, unfinished = carry
        k_samp, k_drop = jax.random.split(key)
        logprobs, state, _ = decode_step(
            params, ctx, state, it, mode="rl", dropout_p=settings.dropout_p,
            drop_key=k_drop, deterministic=deterministic)
        if sample_max:
            nxt = jnp.argmax(logprobs, axis=-1)
            samp_lp = jnp.max(logprobs, axis=-1)
        else:
            nxt = jax.random.categorical(k_samp, logprobs, axis=-1)
            samp_lp = jnp.take_along_axis(
                logprobs, nxt[:, None], axis=-1)[:, 0]
        mask_t = unfinished
        nxt = jnp.where(unfinished, nxt, 0).astype(jnp.int32)
        unfinished = unfinished & (nxt != ids.eos)
        return (state, nxt, unfinished), (nxt, samp_lp, mask_t)

    _, (seq, seq_lp, masks) = jax.lax.scan(
        step_fn, (state0, it0, unfinished0), step_keys,
        unroll=_SCAN_UNROLL)
    aux = {"fc_emb": caux["fc_emb"], "cpt_feats": cpt_feats}
    return (seq.T, seq_lp.T, masks.T.astype(seq_lp.dtype), aux)


# ---------------------------------------------------------------------------
# Losses (reference XECriterion captioner.py:427-440,
#         RewardCriterion self_critical/utils.py:169-177)
# ---------------------------------------------------------------------------

def length_mask(lengths, max_len: int, dtype=jnp.float32):
    """mask[i, t] = t < lengths[i]."""
    t = jnp.arange(max_len)[None, :]
    return (t < lengths[:, None]).astype(dtype)


def xe_criterion_sums(logprobs, targets, lengths):
    """(masked NLL sum, unmasked token count) — the sum form of
    xe_criterion, used for batch-boundary-invariant eval aggregation
    (rows excluded from eval get lengths==0 and contribute nothing)."""
    T = targets.shape[1]
    mask = length_mask(lengths, T, logprobs.dtype)
    nll = -jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask), jnp.sum(mask)


def xe_criterion(logprobs, targets, lengths):
    """Length-masked NLL normalized by total unmasked tokens
    (SURVEY.md §8.4). logprobs [bs,T,V], targets [bs,T], lengths [bs]."""
    s, c = xe_criterion_sums(logprobs, targets, lengths)
    return s / c


def reward_criterion_sums(seq_logprobs, seq_masks, rewards):
    """(sum of -logprob*mask*reward, mask sum) — sum form of
    reward_criterion."""
    out = -seq_logprobs * seq_masks * rewards
    return jnp.sum(out), jnp.sum(seq_masks)


def reward_criterion(seq_logprobs, seq_masks, rewards):
    """-logprob * mask * reward, normalized by mask sum."""
    s, c = reward_criterion_sums(seq_logprobs, seq_masks, rewards)
    return s / c


def domain_alignment_sums(cpt_feats, fc_emb, row_mask):
    """(masked per-row-MSE sum, row count): sum form of
    domain_alignment_loss over the rows selected by row_mask."""
    per_row = jnp.mean((cpt_feats - jax.lax.stop_gradient(fc_emb)) ** 2,
                       axis=-1)
    return jnp.sum(per_row * row_mask), jnp.sum(row_mask)


def domain_alignment_loss(cpt_feats, fc_emb):
    """MSE(cpt_feats, stop_grad(fc_emb)) (reference train_xe.py:163,
    decoder.py:89: fc side is detached)."""
    return jnp.mean((cpt_feats - jax.lax.stop_gradient(fc_emb)) ** 2)
