"""Serving path: detected-sentiment beam decode in one XLA program.

Mirrors the reference ``Detector.sample`` (models/decoder.py:182-192):
image sentiment detection (threshold→neutral fallback,
sentiment_detector.py:47-60) followed by sentiment-conditioned beam search
(captioner.py:351-420). Unlike the reference — which runs one image at a
time, one beam candidate at a time — the whole batch decodes in a single
jitted call: contexts are embedded once and all images' candidates run as
flat rows through the fused decode cell (see ops/beam.py and DESIGN.md).
This is the captions/sec/chip hot path (BASELINE.md north star).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .models import captioner as cap
from .models import sentiment_detector as senti_det
from .ops import beam

SENTI_THRESHOLD = 0.7  # reference decoder.py:41


class ServingParams(NamedTuple):
    captioner: dict
    senti_detector: dict


def detect_and_decode(params: ServingParams, fc, att, sentis, *, settings,
                      ids: cap.TokenIds, beam_size: int = 3,
                      max_seq_len: int = 16,
                      senti_threshold: float = SENTI_THRESHOLD,
                      return_weights: bool = False):
    """Full serving step for a batch of images.

    fc:      [bs, Ff] pooled features
    att:     [bs, 14, 14, Fa] attention grid
    sentis:  [bs, M] sentiment-word ids for the detected sentiment domain

    Returns (seqs [bs, beam, T] int32, scores [bs, beam] desc-sorted,
    senti_labels [bs] int32). Jit-friendly: wrap with jax.jit directly.

    return_weights: additionally return the per-step attention weights of
    each returned candidate's path (dict of cont/senti/fuse arrays
    [bs, beam, T, ...]; SURVEY.md §8.14 — the reference records these via
    _get_weights(), captioner.py:83-94). Introspection mode, off the
    serving hot path.
    """
    senti_labels, _, _ = senti_det.module_for(settings).sample(
        params.senti_detector, att, senti_threshold, ids.neutral)
    ctx, _ = cap.build_visual_context(
        params.captioner, fc, att, settings.dropout_p,
        jax.random.PRNGKey(0), True,  # deterministic: sample() is eval-mode
        senti_words=sentis, senti_labels=senti_labels, pad_id=ids.pad)
    out = beam.beam_search_batched(
        params.captioner, ctx, settings=settings, ids=ids,
        beam_size=beam_size, max_seq_len=max_seq_len, mode="rl",
        return_weights=return_weights)
    if return_weights:
        seqs, scores, weights = out
        return seqs, scores, senti_labels, weights
    seqs, scores = out
    return seqs, scores, senti_labels


def decode_xe(params_captioner, fc, att, *, settings, ids: cap.TokenIds,
              beam_size: int = 3, max_seq_len: int = 16):
    """XE-stage beam decode: no sentiment words and NO sentiment-label
    embedding — the reference's sample() leaves senti_labels None when
    called without senti_words (train_xe.py:221-229, captioner.py:375-376),
    so nothing is added to the word embedding."""
    ctx, _ = cap.build_visual_context(
        params_captioner, fc, att, settings.dropout_p,
        jax.random.PRNGKey(0), True, senti_words=None, senti_labels=None,
        pad_id=ids.pad)
    return beam.beam_search_batched(
        params_captioner, ctx, settings=settings, ids=ids,
        beam_size=beam_size, max_seq_len=max_seq_len, mode="xe")


def decode_greedy(params_captioner, fc, att, sentis, senti_labels, *,
                  settings, ids: cap.TokenIds, max_seq_len: int = 16):
    """Greedy decode with sentiment conditioning — forward_rl with
    sample_max (reference captioner.py:290-349, greedy branch), exposed as
    a serving primitive. Returns (seqs [bs, T], masks [bs, T])."""
    seq, _, masks, _ = cap.forward_rl(
        params_captioner, fc, att,
        jnp.zeros((fc.shape[0], 1), jnp.int32), sentis, senti_labels,
        settings=settings, ids=ids, max_seq_len=max_seq_len,
        sample_max=True, rng=jax.random.PRNGKey(0), deterministic=True)
    return seq, masks


def sweep_sentiments(params_captioner, fc, att, sentis_by_label, *,
                     settings, ids: cap.TokenIds, num_labels: int = 3,
                     beam_size: int = 3, max_seq_len: int = 16):
    """Decode every image under every sentiment label (the paper's
    controllable-sentiment sweep; BASELINE.json config 2). sentis_by_label:
    [num_labels, bs, M] sentiment-word ids per label. Returns
    (seqs [num_labels, bs, beam, T], scores [num_labels, bs, beam]).

    One program: the label axis folds into the batch dim (flat
    [num_labels*bs] rows — the tiny-axis sublane rule, CLAUDE.md/DESIGN.md)
    so the 3-label sweep is a single trace/compile instead of one per
    label (VERDICT r2 weak #3), and the decode runs at 3x the row count —
    better MXU utilization at small bs. Per-row math is unchanged, so the
    outputs equal the per-label decode exactly
    (tests/test_inference.py::test_sweep_sentiments)."""
    bs = fc.shape[0]
    fc_flat = jnp.tile(fc, (num_labels, 1))
    att_flat = jnp.tile(att, (num_labels,) + (1,) * (att.ndim - 1))
    sentis_flat = sentis_by_label.reshape(
        (num_labels * bs,) + tuple(sentis_by_label.shape[2:]))
    labels_flat = jnp.repeat(jnp.arange(num_labels, dtype=jnp.int32), bs)
    ctx, _ = cap.build_visual_context(
        params_captioner, fc_flat, att_flat, settings.dropout_p,
        jax.random.PRNGKey(0), True, senti_words=sentis_flat,
        senti_labels=labels_flat, pad_id=ids.pad)
    seqs, scores = beam.beam_search_batched(
        params_captioner, ctx, settings=settings, ids=ids,
        beam_size=beam_size, max_seq_len=max_seq_len, mode="rl")
    return (seqs.reshape((num_labels, bs) + tuple(seqs.shape[1:])),
            scores.reshape((num_labels, bs) + tuple(scores.shape[1:])))


def make_serving_fn(settings, ids: cap.TokenIds, beam_size: int = 3,
                    max_seq_len: int = 16, return_weights: bool = False):
    """Jitted detect_and_decode with static config baked in."""
    @jax.jit
    def fn(params: ServingParams, fc, att, sentis):
        return detect_and_decode(params, fc, att, sentis, settings=settings,
                                 ids=ids, beam_size=beam_size,
                                 max_seq_len=max_seq_len,
                                 return_weights=return_weights)
    return fn


def make_sharded_serving_fn(mesh, settings, ids: cap.TokenIds,
                            beam_size: int = 3, max_seq_len: int = 16):
    """Multi-chip serving: detect_and_decode data-parallel over `mesh`'s
    `data` axis via shard_map — each device runs the FULL single-chip
    serving program on its batch shard.

    This (not jit-with-sharded-operands) is the scale-out path for real
    multi-chip serving: the hot path contains pallas kernels (beam-shared
    attention, Winograd detector convs) which XLA's GSPMD partitioner
    cannot split, so they must run per-device on locally-shaped shards.
    Params replicate; the global batch must be a multiple of the data-axis size
    (and the per-device shard keeps the kernels' batch divisibility,
    e.g. 384 over 8 chips -> 48 per chip).

    Returns a jitted fn(params, fc, att, sentis) with globally-sharded
    inputs/outputs; numerics identical to the single-chip fn
    (tests/test_inference.py::test_sharded_serving_matches_single)."""
    from jax.sharding import PartitionSpec as P

    def local_fn(params, fc, att, sentis):
        return detect_and_decode(params, fc, att, sentis,
                                 settings=settings, ids=ids,
                                 beam_size=beam_size,
                                 max_seq_len=max_seq_len)

    smapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False)
    return jax.jit(smapped)


def _forced_decode_local(settings, ids: cap.TokenIds, beam_size: int,
                         max_seq_len: int, return_weights: bool = False):
    """The forced-label decode body shared by the single-chip and
    shard_map serving factories — one definition so the two daemons
    cannot silently diverge (their token-identity is parity-tested)."""
    def fn(cap_params, fc, att, sentis, senti_labels):
        ctx, _ = cap.build_visual_context(
            cap_params, fc, att, settings.dropout_p, jax.random.PRNGKey(0),
            True, senti_words=sentis, senti_labels=senti_labels,
            pad_id=ids.pad)
        return beam.beam_search_batched(
            cap_params, ctx, settings=settings, ids=ids,
            beam_size=beam_size, max_seq_len=max_seq_len, mode="rl",
            return_weights=return_weights)
    return fn


def _detect_local(senti_threshold: float, neutral: int, settings=None):
    """Image-sentiment label detection body shared by the single-chip
    and shard_map factories. settings (optional) selects the detector
    variant (sentiment_detector.module_for); None = standard head."""
    sd = senti_det.module_for(settings)

    def fn(params, att):
        return sd.sample(params, att, senti_threshold, neutral)[0]
    return fn


def make_sharded_forced_serving_fn(mesh, settings, ids: cap.TokenIds,
                                   beam_size: int = 3,
                                   max_seq_len: int = 16):
    """Data-parallel forced-label decode over `mesh`'s `data` axis —
    the serving daemon's scale-out path (labels are an input, so mixed
    auto/forced batches work; see make_sharded_serving_fn for why
    shard_map rather than jit-with-sharded-operands: the pallas decode
    kernels must run per-device on locally-shaped shards). Params
    replicate; the batch must be a multiple of the data-axis size."""
    from jax.sharding import PartitionSpec as P

    smapped = jax.shard_map(
        _forced_decode_local(settings, ids, beam_size, max_seq_len),
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data")),
        check_vma=False)
    return jax.jit(smapped)


def make_sharded_detect_fn(mesh, senti_threshold: float = SENTI_THRESHOLD,
                           neutral: int = 2, settings=None):
    """Data-parallel image-sentiment detection (labels only) over
    `mesh`'s `data` axis — pairs with make_sharded_forced_serving_fn in
    the daemon's sharded mode."""
    from jax.sharding import PartitionSpec as P

    smapped = jax.shard_map(_detect_local(senti_threshold, neutral,
                                          settings),
                            mesh=mesh,
                            in_specs=(P(), P("data")), out_specs=P("data"),
                            check_vma=False)
    return jax.jit(smapped)


def make_detect_fn(senti_threshold: float = SENTI_THRESHOLD,
                   neutral: int = 2, settings=None):
    """Jitted single-chip image-sentiment label detection."""
    return jax.jit(_detect_local(senti_threshold, neutral, settings))


def make_forced_serving_fn(settings, ids: cap.TokenIds, beam_size: int = 3,
                           max_seq_len: int = 16,
                           return_weights: bool = False):
    """Jitted sentiment-FORCED beam decode: like detect_and_decode but the
    label comes from the caller instead of the image detector (the paper's
    controllable-sentiment mode)."""
    return jax.jit(_forced_decode_local(settings, ids, beam_size,
                                        max_seq_len, return_weights))
