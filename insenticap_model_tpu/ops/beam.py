"""Batched beam search for the captioner.

The reference decodes one image at a time, one candidate at a time, with a
full-vocab sort per candidate per step (captioner.py:351-420). Here the beam
lives as a leading axis ``[beam, ...]``, every step expands all candidates in
one fused ``decode_step``, selection is two ``lax.top_k`` calls, and the whole
loop is one ``lax.scan`` — then ``vmap`` batches whole images. This is the
serving-path hot loop (BASELINE.md north star: captions/sec/chip at beam=3).

Semantics preserved from the reference (SURVEY.md §7 hard part 2, §8.10):
  * ranking by **sum** of logprobs, no length normalization;
  * candidates that hit EOS persist with frozen scores and keep competing;
  * PAD/SOS/UNK banned (only when pad != eos), last word banned when
    ``decoding_constraint`` is on (captioner.py:394-399);
  * search starts from a single live candidate (the rest enter at -inf).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.captioner import (DecodeContext, DecodeState, TokenIds,
                                decode_step, init_state)

NEG_INF = -1e30  # finite sentinel: -inf arithmetic breaks top_k tie handling


def _tile_ctx(ctx: DecodeContext, beam: int) -> DecodeContext:
    def rep(x):
        if x is None:
            return None
        return jnp.broadcast_to(x, (beam,) + x.shape[1:]) if x.shape[0] == 1 \
            else jnp.repeat(x, beam, axis=0)
    return DecodeContext(*(rep(f) for f in ctx))


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
    B = beam_size
    bctx = _tile_ctx(ctx, B)
    state0 = init_state(B, settings.rnn_hid_dim, ctx.fc.dtype)
    scores0 = jnp.full((B,), NEG_INF, ctx.fc.dtype).at[0].set(0.0)
    last0 = jnp.full((B,), ids.sos, jnp.int32)
    seqs0 = jnp.zeros((B, max_seq_len), jnp.int32)

    ban_static = []
    if ids.pad != ids.eos:
        ban_static = [ids.pad, ids.sos, ids.unk]

    def step_fn(carry, t):
        state, scores, last, seqs = carry
        logprobs, new_state, _ = decode_step(
            params, bctx, state, last, mode=mode,
            dropout_p=settings.dropout_p,
            drop_key=jax.random.PRNGKey(0), deterministic=True)  # eval mode
        for tok in ban_static:
            logprobs = logprobs.at[:, tok].set(NEG_INF)
        if decoding_constraint:
            logprobs = jnp.where(
                jax.nn.one_hot(last, logprobs.shape[-1], dtype=jnp.bool_),
                NEG_INF, logprobs)

        ended = (t > 0) & (last == ids.eos)                      # [B]
        topv, topi = jax.lax.top_k(logprobs, B)                  # [B, B]
        # live candidates expand; ended candidates persist once (slot 0)
        k_idx = jnp.arange(B)[None, :]
        cand_scores = jnp.where(
            ended[:, None],
            jnp.where(k_idx == 0, scores[:, None], NEG_INF),
            scores[:, None] + topv)                              # [B, B]
        cand_words = jnp.where(ended[:, None], ids.eos, topi)

        flat_scores = cand_scores.reshape(-1)
        new_scores, flat_idx = jax.lax.top_k(flat_scores, B)     # [B]
        parent = flat_idx // B
        words = cand_words.reshape(-1)[flat_idx].astype(jnp.int32)

        new_state = DecodeState(*(f[parent] for f in new_state))
        new_seqs = seqs[parent].at[:, t].set(words)
        return (new_state, new_scores, words, new_seqs), None

    (_, scores, _, seqs), _ = jax.lax.scan(
        step_fn, (state0, scores0, last0, seqs0), jnp.arange(max_seq_len))
    return seqs, scores


def beam_search_batched(params, ctx: DecodeContext, *, settings, ids: TokenIds,
                        beam_size: int, max_seq_len: int, mode: str,
                        decoding_constraint: bool = True):
    """vmap beam_search over a batch of per-image contexts [bs, ...].

    New capability vs. the reference (which only decodes bs=1): whole-batch
    beam decode in one XLA program.
    """
    def one(ctx_i: DecodeContext):
        ctx1 = DecodeContext(*(None if f is None else f[None] for f in ctx_i))
        return beam_search(params, ctx1, settings=settings, ids=ids,
                           beam_size=beam_size, max_seq_len=max_seq_len,
                           mode=mode, decoding_constraint=decoding_constraint)
    return jax.vmap(one)(ctx)
