"""Batched beam search for the captioner.

The reference decodes one image at a time, one candidate at a time, with a
full-vocab sort per candidate per step (captioner.py:351-420). Here the beam
is an array axis ``[bs, beam]``: every step expands all candidates of all
images in one fused batched decode step, selection is iterative-argmax top-k
(beam_size argmax passes over the vocab instead of a full sort — a full
``lax.top_k`` over 10k vocab lowers to a sort and dominated the decode at
~13x the greedy cost), and the whole loop is one ``lax.scan`` that emits
(word, parent) per step; sequences are reconstructed by a reverse backtrack
scan. Candidates run as [bs*beam] rows through the fused decode cell; on
TPU the content attention uses the beam-shared pallas kernel
(ops/fused_attention) that reads each image's att/p_att from HBM once per
step instead of once per beam — measured ~25% faster beam decode (a pure-XLA
broadcast variant de-fused badly and lost to tiled rows; the kernel wins
because the share happens in VMEM). This is the serving-path hot loop
(BASELINE.md north star: captions/sec/chip at beam=3).

Semantics preserved from the reference (SURVEY.md §7 hard part 2, §8.10):
  * ranking by **sum** of logprobs, no length normalization;
  * candidates that hit EOS persist with frozen scores and keep competing;
  * PAD/SOS/UNK banned (only when pad != eos), last word banned when
    ``decoding_constraint`` is on (captioner.py:394-399);
  * search starts from a single live candidate (the rest enter at -inf).
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import nn
from ..models.captioner import (DecodeContext, DecodeState, TokenIds,
                                decode_cell, embed_word, senti_attention)

NEG_INF = -1e30  # finite sentinel: -inf arithmetic breaks tie handling


def _fused_rows(rows: int) -> int:
    """tile_r for the fused classifier-topk kernel; 0 = kernel unusable for
    this row count (fallback to the XLA path)."""
    for tr in (256, 128, 64, 32, 16, 8):
        if rows % tr == 0:
            return tr
    return 0


def _tile_ctx(ctx: DecodeContext, B: int) -> DecodeContext:
    """Repeat per-image context B times -> [bs*B, ...] rows. Tiled rows
    through the shared decode_step proved faster end-to-end than
    broadcasting per-beam queries against shared [bs, N, ...] keys (the
    [bs,B,N,Ah] broadcast tanh de-fused badly at large batch)."""
    def rep(x):
        return None if x is None else jnp.repeat(x, B, axis=0)
    return DecodeContext(*(rep(f) for f in ctx))


def _decode_cell_shared_att(params, sctx: DecodeContext, att, p_att,
                            state: DecodeState, last_flat, *, mode: str,
                            B: int, tile_b: int):
    """decode_cell with the beam-shared pallas content attention: sctx holds
    the beam-TILED small fields (fc, senti_word, p_senti_word, senti_label)
    while att/p_att stay per-image [bs, N, ...] and are read from HBM once
    per step instead of once per beam (ops/fused_attention)."""
    from . import fused_attention as fa
    xt = embed_word(params, last_flat)
    if sctx.senti_label is not None:
        xt = xt + sctx.senti_label
    a_in = jnp.concatenate([state.h_lang, sctx.fc, xt], axis=1)
    h_att, c_att = nn.lstm_cell(params["att_lstm"], a_in,
                                (state.h_att, state.c_att))
    p_attn = params["attention"]
    cont_res = fa.beam_content_attention(h_att, p_attn["cont"], att, p_att,
                                         B=B, tile_b=tile_b)
    if mode == "xe":
        att_res = cont_res
    else:  # rl: sigmoid-gated fusion (captioner.py:105-118)
        senti_res, _ = senti_attention(p_attn["senti"], h_att,
                                       sctx.senti_word, sctx.p_senti_word,
                                       sctx.senti_label)
        f = p_attn["fuse"]
        gate = (nn.linear(f["cont2att"], cont_res)
                + nn.linear(f["senti2att"], senti_res)
                + nn.linear(f["h2att"], h_att))
        gate = jax.nn.sigmoid(nn.linear(f["att_alpha"], jnp.tanh(gate)))
        att_res = gate * cont_res + (1.0 - gate) * senti_res
    l_in = jnp.concatenate([att_res, h_att], axis=1)
    h_lang, c_lang = nn.lstm_cell(params["lang_lstm"], l_in,
                                  (state.h_lang, state.c_lang))
    return h_lang, DecodeState(h_att, c_att, h_lang, c_lang)


def _topk_argmax(x, k: int):
    """Exact top-k along the last axis via k argmax passes — O(k·V) VPU
    reductions instead of lax.top_k's full sort (the sort dominated beam
    decode). Matches lax.top_k ordering (descending; first index wins
    ties)."""
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        v = jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i)
        x = jnp.where(
            jax.nn.one_hot(i, x.shape[-1], dtype=jnp.bool_), NEG_INF, x)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def beam_search_batched(params, ctx: DecodeContext, *, settings,
                        ids: TokenIds, beam_size: int, max_seq_len: int,
                        mode: str, decoding_constraint: bool = True,
                        early_exit: bool = True,
                        return_weights: bool = False):
    """Whole-batch beam decode in one XLA program (new capability vs. the
    reference's bs=1 Python loop).

    ctx: per-image DecodeContext [bs, ...] (NOT beam-tiled).
    early_exit: stop the decode loop once every candidate of every image has
    emitted EOS (the reference's end_flag break, captioner.py:382-388,410).
    Identical outputs either way; saves steps for trained models whose
    captions end before max_seq_len.
    Returns (seqs [bs, beam, max_seq_len] int32, scores [bs, beam]) sorted
    by score descending; sequences are EOS-terminated then EOS-padded.

    return_weights: also return the per-step attention weights along each
    returned candidate's actual path — the reference records these via
    stateful lists retrieved by _get_weights() (captioner.py:83-94;
    SURVEY.md §8.14 asks for them as optional outputs instead). Returns a
    third element: dict with 'cont' [bs, beam, T, N] (+ 'senti'
    [bs, beam, T, M+1] and 'fuse' [bs, beam, T, 1] in rl mode). Forces the
    scan path (no early exit) and the plain-XLA cell — an introspection
    mode, not the serving hot path.
    """
    bs = ctx.fc.shape[0]
    B = beam_size
    H = settings.rnn_hid_dim
    # large per-candidate tensors live FLAT [bs*B, ...]: a [bs, B, ...]
    # layout puts B in the sublane dimension, and B=3-wide tiles made every
    # vocab-sized op ~10x slower (measured 333 ms vs 32 ms per batch)
    z = jnp.zeros((bs * B, H), ctx.fc.dtype)
    state0 = DecodeState(z, z, z, z)
    scores0 = jnp.full((bs, B), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    last0 = jnp.full((bs, B), ids.sos, jnp.int32)

    ban_static = []
    if ids.pad != ids.eos:
        ban_static = [ids.pad, ids.sos, ids.unk]

    bctx = _tile_ctx(ctx, B)

    # beam-shared content attention (pallas): read att/p_att once per step
    # instead of once per beam; opt-out via ISC_FUSED_ATT=0
    if return_weights:
        early_exit = False  # weights are emitted through the scan ys
    fa_tile = 8 if bs % 8 == 0 else (4 if bs % 4 == 0 else 0)
    use_fa = (ctx.att is not None and mode in ("xe", "rl") and fa_tile > 0
              and not return_weights
              and jax.default_backend() == "tpu"
              and os.environ.get("ISC_FUSED_ATT", "1") == "1")
    if use_fa:
        sctx = bctx._replace(att=None, p_att=None)

    # Optional fused pallas classifier+log_softmax+ban+topk
    # (ops/fused_topk). Standalone the kernel beats the XLA op chain by
    # ~18% (0.54 vs 0.66 ms at serving shapes), but inside the scan the
    # pallas_call blocks XLA's cross-step fusion and the end-to-end path
    # measured ~5% slower (8170 vs 8601 captions/s) — so the XLA path is
    # the default and the kernel is opt-in via ISC_FUSED_TOPK=1.
    rows = bs * B
    tile_r = _fused_rows(rows)
    use_fused = (tile_r > 0 and jax.default_backend() == "tpu"
                 and not return_weights
                 and os.environ.get("ISC_FUSED_TOPK") == "1")
    if use_fused:
        from . import fused_topk
        w = params["classifier"]["w"]
        bias = params["classifier"]["b"]
        V = w.shape[1]
        Vp = -(-V // 512) * 512
        if Vp != V:  # padded tail: zero weights, -inf bias -> never wins
            w = jnp.pad(w, ((0, 0), (0, Vp - V)))
            bias = jnp.pad(bias, (0, Vp - V), constant_values=NEG_INF)

    def _cell(state, last_flat):
        """(out, new_state, weights-or-{}) — weights only populated on the
        plain-XLA cell when return_weights is on."""
        if use_fa:
            out, new_state = _decode_cell_shared_att(
                params, sctx, ctx.att, ctx.p_att, state, last_flat,
                mode=mode, B=B, tile_b=fa_tile)
            return out, new_state, {}
        out, new_state, weights = decode_cell(
            params, bctx, state, last_flat, mode=mode, dropout_p=0.0,
            drop_key=jax.random.PRNGKey(0), deterministic=True)
        return out, new_state, (weights if return_weights else {})

    def step_fn(carry, t):
        state, scores, last = carry
        if use_fused:
            out, new_state, wts = _cell(state, last.reshape(-1))
            last_flat = last.reshape(-1) if decoding_constraint else \
                jnp.full((rows,), -1, jnp.int32)
            topv2, topi2 = fused_topk.classifier_topk(
                out, w, bias, last_flat, k=B, banned=tuple(ban_static),
                tile_r=tile_r)
        else:
            out, new_state, wts = _cell(state, last.reshape(-1))
            # f32 logits + normalizer even with bf16 params (matching the
            # fused kernel): bf16 log_softmax reorders near-tie candidates
            logits = jnp.dot(out, params["classifier"]["w"],
                             preferred_element_type=jnp.float32) \
                + params["classifier"]["b"].astype(jnp.float32)
            logprobs = nn.log_softmax(logits)
            logprobs = logprobs.astype(jnp.float32)          # [bs*B, V]
            for tok in ban_static:
                logprobs = logprobs.at[:, tok].set(NEG_INF)
            if decoding_constraint:
                logprobs = jnp.where(
                    jax.nn.one_hot(last.reshape(-1), logprobs.shape[-1],
                                   dtype=jnp.bool_),
                    NEG_INF, logprobs)
            topv2, topi2 = _topk_argmax(logprobs, B)         # [bs*B, B]

        ended = (t > 0) & (last == ids.eos)                  # [bs,B]
        topv = topv2.astype(jnp.float32).reshape(bs, B, B)
        topi = topi2.reshape(bs, B, B)
        # live candidates expand; ended candidates persist once (slot 0)
        k_idx = jnp.arange(B)[None, None, :]
        cand_scores = jnp.where(
            ended[..., None],
            jnp.where(k_idx == 0, scores[..., None], NEG_INF),
            scores[..., None] + topv)                        # [bs,B,B]
        cand_words = jnp.where(ended[..., None], ids.eos, topi)

        flat_scores = cand_scores.reshape(bs, B * B)
        new_scores, flat_idx = _topk_argmax(flat_scores, B)  # [bs,B]
        parent = flat_idx // B
        words = jnp.take_along_axis(cand_words.reshape(bs, B * B),
                                    flat_idx, axis=1).astype(jnp.int32)

        # beam-select states via one-hot matmul (generic gathers by parent
        # lower poorly on TPU); rows stay flat afterwards
        sel_mat = jax.nn.one_hot(parent, B, dtype=state.h_att.dtype)
        def sel(f):
            fb = f.reshape(bs, B, -1)
            return jnp.einsum("bkj,bjh->bkh", sel_mat, fb).reshape(bs * B, -1)
        new_state = DecodeState(*(sel(f) for f in new_state))
        # weights emitted per PRE-selection row: [bs, B, ...]; the
        # backtrack resolves them to each candidate's actual path
        wts = jax.tree_util.tree_map(
            lambda a: a.reshape(bs, B, *a.shape[1:]), wts)
        return (new_state, new_scores, words), (words, parent, wts)

    if early_exit:
        # while_loop with the reference's all-ended break; buffers are
        # pre-filled so skipped steps read as EOS/self-parent
        T = max_seq_len
        words_buf = jnp.full((T, bs, B), ids.eos, jnp.int32)
        parent_buf = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None,
                                      None, :], (T, bs, B))

        def cond(c):
            t, state, scores, last, wbuf, pbuf = c
            return (t < T) & ~((t > 0) & jnp.all(last == ids.eos))

        def body(c):
            t, state, scores, last, wbuf, pbuf = c
            (state, scores, words), (w, pr, _) = step_fn(
                (state, scores, last), t)
            wbuf = jax.lax.dynamic_update_index_in_dim(wbuf, w, t, 0)
            pbuf = jax.lax.dynamic_update_index_in_dim(pbuf, pr.astype(
                jnp.int32), t, 0)
            return (t + 1, state, scores, words, wbuf, pbuf)

        _, _, scores, _, words_t, parent_t = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), state0, scores0, last0, words_buf, parent_buf))
    else:
        (_, scores, _), (words_t, parent_t, wts_t) = jax.lax.scan(
            step_fn, (state0, scores0, last0), jnp.arange(max_seq_len))
    # words_t/parent_t: [T, bs, B]. Backtrack from the final beam order.
    # The weights for the token emitted at step t by a candidate occupying
    # slot k at step t were computed at its parent row parent_t[t][k], so
    # the same reverse walk that rebuilds tokens also resolves weights.
    def back_fn(beam_idx, xs):
        words, parent, wts = xs                               # [bs,B,(...)]
        w = jnp.take_along_axis(words, beam_idx, axis=1)
        prev = jnp.take_along_axis(parent, beam_idx, axis=1)
        sel = jax.tree_util.tree_map(
            lambda a: jnp.take_along_axis(
                a, prev.reshape(bs, B, *([1] * (a.ndim - 2))), axis=1), wts)
        return prev, (w, sel)
    final_idx = jnp.broadcast_to(jnp.arange(B)[None], (bs, B))
    if not return_weights:
        wts_t = {}
    _, (seq_rev, wts_rev) = jax.lax.scan(
        back_fn, final_idx, (words_t, parent_t, wts_t), reverse=True)
    seqs = jnp.moveaxis(seq_rev, 0, -1)                      # [bs,B,T]
    scores = scores.astype(ctx.fc.dtype)
    if not return_weights:
        return seqs, scores
    # [T, bs, B, ...] -> [bs, B, T, ...]
    weights = jax.tree_util.tree_map(
        lambda a: jnp.moveaxis(a, 0, 2), wts_rev)
    return seqs, scores, weights


def beam_search(params, ctx: DecodeContext, *, settings, ids: TokenIds,
                beam_size: int, max_seq_len: int, mode: str,
                decoding_constraint: bool = True
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-decode a single image whose context has batch dim 1.

    mode: 'xe' (no sentiment words) or 'rl' (gated fusion), matching the
    reference's sample() which switches on senti_words presence
    (captioner.py:364-376).

    Returns (seqs [beam, max_seq_len] int32, scores [beam]) sorted by score
    descending. Sequences are EOS-terminated then padded with EOS.
    """
    seqs, scores = beam_search_batched(
        params, ctx, settings=settings, ids=ids, beam_size=beam_size,
        max_seq_len=max_seq_len, mode=mode,
        decoding_constraint=decoding_constraint)
    return seqs[0], scores[0]
