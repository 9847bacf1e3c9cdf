"""Jitted train/eval steps for every stage.

Each stage compiles to one (or two: train/eval) XLA programs; batches arrive
with the leading axis sharded over the data mesh, parameters replicated, and
XLA inserts the gradient collectives (parallel/mesh.py). Loss semantics
mirror the reference trainers exactly:

  XE stage      train_xe.py:144-196  (xe + domain-align + seq2seq, pseudo
                sentiment labels from the frozen sentence classifier)
  RL stage      models/decoder.py:52-180 (SCST with on-device CIDEr-D +
                cls reward, plus xe/da/seq2seq auxiliary losses)
  concept       train_cpt.py (multi-label BCE)
  sentiment     train_senti.py (CE)
  sentence-cls  train_sent_senti_cls_rnn.py (CE)
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models import captioner as cap
from ..models import concept_detector as cpt_det
from ..models import sent_senti_cls as ss_cls
from ..models import sentiment_detector as senti_det
from ..ops import ciderd_device
from . import optim

CLS_FLAG = 0.4        # reference decoder.py:39
SEQ_FLAG = 1.0        # reference decoder.py:40
SENTI_THRESHOLD = 0.7  # reference decoder.py:41
RL_XE_SS_PROB = 0.5   # reference decoder.py:139
RL_SEQ_SS_PROB = 0.25  # reference decoder.py:155


def _row_mask(batch, bs, dtype=jnp.float32):
    """1.0 for true rows, 0.0 for the eval loader's padding rows (the final
    eval batch is padded by repeating the last item and carries 'valid';
    data/loaders.py). Batches without 'valid' are fully valid."""
    valid = batch.get("valid")
    if valid is None:
        return jnp.ones((bs,), dtype)
    return (jnp.arange(bs) < valid).astype(dtype)


def _pseudo_senti_labels(cls_params, caps, lengths, settings):
    """Frozen ss-cls pseudo labels on ground-truth captions
    (train_xe.py:155-158, decoder.py:133-136)."""
    logits, _ = ss_cls.forward(cls_params, caps[:, 1:], lengths,
                               settings=settings, deterministic=True)
    return jax.lax.stop_gradient(logits.argmax(axis=-1))


# ---------------------------------------------------------------------------
# XE stage
# ---------------------------------------------------------------------------

def make_xe_steps(settings, tx):
    """Returns (train_step, eval_step).

    batch: {fc, att, caps [bs,T+1], lengths, cpts}
    scs_batch: {caps, lengths, cpts, sentis, senti_labels}
    """

    def _losses(params, cls_params, batch, scs_batch, rng, ss_prob,
                deterministic):
        k1, k2 = jax.random.split(rng)
        labels = _pseudo_senti_labels(cls_params, batch["caps"],
                                      batch["lengths"], settings)
        logprobs, aux = cap.forward_xe(
            params, batch["fc"], batch["att"], batch["cpts"], batch["caps"],
            labels, settings=settings, rng=k1, ss_prob=ss_prob,
            deterministic=deterministic)
        xe_loss = cap.xe_criterion(logprobs, batch["caps"][:, 1:],
                                   batch["lengths"])
        da_loss = cap.domain_alignment_loss(aux["cpt_feats"], aux["fc_emb"])
        losses = {"xe_loss": xe_loss, "da_loss": da_loss,
                  "cap_loss": xe_loss + da_loss}
        total = xe_loss + da_loss
        if scs_batch is not None:  # training only (train_xe.py:169-183)
            s2s_logprobs = cap.forward_seq2seq(
                params, scs_batch["caps"], scs_batch["cpts"],
                scs_batch["sentis"], scs_batch["senti_labels"],
                settings=settings, rng=k2, ss_prob=ss_prob,
                deterministic=deterministic)
            s2s = cap.xe_criterion(s2s_logprobs, scs_batch["caps"][:, 1:],
                                   scs_batch["lengths"])
            losses["seq2seq_loss"] = s2s
            total = total + s2s
        losses["all_loss"] = total
        return total, losses

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, cls_params, batch, scs_batch, rng,
                   ss_prob):
        def loss_fn(p):
            return _losses(p, cls_params, batch, scs_batch, rng, ss_prob,
                           deterministic=False)
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, opt_state = optim.apply_updates(params, grads, opt_state, tx)
        return params, opt_state, losses

    @jax.jit
    def eval_step(params, cls_params, batch, rng):
        """Masked per-term (sums, counts) for batch-boundary-invariant val
        aggregation: the Loader's eval-padding duplicate rows contribute
        nothing, and the CLI divides aggregated sums by aggregated counts,
        so the val loss is identical however the split is batched (fixes
        the padded-row double count that biased the reference-style
        per-batch average; reference val loop: train_xe.py:216-217)."""
        rmask = _row_mask(batch, batch["caps"].shape[0])
        lengths = batch["lengths"] * rmask.astype(batch["lengths"].dtype)
        labels = _pseudo_senti_labels(cls_params, batch["caps"],
                                      batch["lengths"], settings)
        logprobs, aux = cap.forward_xe(
            params, batch["fc"], batch["att"], batch["cpts"], batch["caps"],
            labels, settings=settings, rng=rng, ss_prob=jnp.float32(0.0),
            deterministic=True)
        xe_sum, xe_cnt = cap.xe_criterion_sums(logprobs,
                                               batch["caps"][:, 1:], lengths)
        da_sum, da_cnt = cap.domain_alignment_sums(aux["cpt_feats"],
                                                   aux["fc_emb"], rmask)
        return ({"xe_loss": xe_sum, "da_loss": da_sum},
                {"xe_loss": xe_cnt, "da_loss": da_cnt})

    return train_step, eval_step


# ---------------------------------------------------------------------------
# RL stage (the reference Detector.forward inner loop, decoder.py:52-180)
# ---------------------------------------------------------------------------

class RLModels(NamedTuple):
    """Frozen companions of the trainable captioner."""
    senti_detector: Any
    sent_senti_cls: Any


def _cls_reward(cls_params, sample_seq, seq_masks, senti_labels, settings):
    """Per-token cls reward on device (reference get_cls_reward,
    self_critical/utils.py:120-151): 1{pred == target} x excitation weights.
    No baseline (SURVEY.md §8.9)."""
    lens = seq_masks.sum(axis=-1).astype(jnp.int32)
    logits, weights = ss_cls.forward(cls_params, sample_seq, lens,
                                     settings=settings, deterministic=True)
    pred = logits.argmax(axis=-1)
    correct = (pred == senti_labels).astype(weights.dtype)
    return jax.lax.stop_gradient(correct[:, None] * weights)


def make_rl_steps(settings, tx, ids: cap.TokenIds, max_seq_len: int,
                  cider_tables: Optional[ciderd_device.CiderTables],
                  lm_tables=None, lm_flag: float = 0.0):
    """Returns dict of jitted steps keyed by (data_type, training).

    fact batch: {fc, att, caps, lengths, cpts, sentis, img_rows}
    senti batch: {fc, att, cpts, sentis, senti_labels}
    scs_batch as in XE.

    lm_tables/lm_flag: optional per-sentiment trigram LM reward
    (ops/lm_device.py) added as lm_flag * sign(lm(greedy) - lm(sample)) —
    the reference's capability-present-default-off LM reward
    (train_rl.py:212-216, self_critical/utils.py:86-100); default off.
    """

    def _forward(params, frozen: RLModels, batch, scs_batch, rng,
                 data_type: str, training: bool):
        k_samp, k_greedy, k_xe, k_s2s = jax.random.split(rng, 4)
        rmask = _row_mask(batch, batch["fc"].shape[0])

        if data_type == "fact" or not training:
            # sentiment labels from the image detector (decoder.py:82-84).
            # The detector is frozen and label-only here (sample runs
            # OUTSIDE the differentiated rollout_loss closure), so its
            # input follows the STAGED dtype of the frozen params: a
            # caller staging them bf16 (train_rl --rl_detector_dtype
            # bf16) gets the serving-grade pallas Winograd stack
            # (sentiment_detector.forward fast path) instead of the f32
            # direct convs. Measured-REJECTED as the default (-1.3% e2e
            # at rl_bs=40, tools/ab_rl_detector.py): the cast + the
            # pallas call breaking fusion mid-program cost more than
            # the convs save at train batch sizes.
            det_params = frozen.senti_detector
            # dtype from a KNOWN weight leaf (not tree_leaves[0], whose
            # identity depends on key sort order): conv weights decide
            # whether the bf16 Winograd fast path engages.
            det_dtype = det_params["convs"][0]["w"].dtype
            senti_labels, _, _ = senti_det.module_for(settings).sample(
                det_params, batch["att"].astype(det_dtype),
                SENTI_THRESHOLD, ids.neutral)
            senti_labels = jax.lax.stop_gradient(senti_labels)
        else:
            senti_labels = batch["senti_labels"]

        def rollout_loss(params):
            """Returns (total, (aux_losses, sums, counts)).

            Every term is computed in masked sum form first; the training
            means divide inside the batch (identical numerics to the
            reference when all rows are valid — train loaders never pad),
            while eval aggregates the raw sums across batches so padding
            rows never bias val losses (VERDICT r1 #4)."""
            sums: Dict[str, jnp.ndarray] = {}
            counts: Dict[str, jnp.ndarray] = {}
            n_rows = jnp.sum(rmask)

            sample_seq, sample_lp, sample_masks, aux = cap.forward_rl(
                params, batch["fc"], batch["att"], batch["cpts"],
                batch["sentis"], senti_labels, settings=settings, ids=ids,
                max_seq_len=max_seq_len, sample_max=False, rng=k_samp,
                deterministic=not training)
            sample_masks = sample_masks * rmask[:, None]
            da_sum, _ = cap.domain_alignment_sums(aux["cpt_feats"],
                                                  aux["fc_emb"], rmask)
            da_loss = da_sum / n_rows
            sums["da_loss"], counts["da_loss"] = da_sum, n_rows

            greedy_seq, _, greedy_masks, _ = cap.forward_rl(
                jax.lax.stop_gradient(params), batch["fc"], batch["att"],
                batch["cpts"], batch["sentis"], senti_labels,
                settings=settings, ids=ids, max_seq_len=max_seq_len,
                sample_max=True, rng=k_greedy, deterministic=True)
            greedy_seq = jax.lax.stop_gradient(greedy_seq)

            aux_losses = {"da_loss": da_loss}
            if data_type == "fact":
                fact_reward = ciderd_device.self_critical_reward(
                    cider_tables, sample_seq, greedy_seq, batch["img_rows"],
                    ids.eos)
                fact_reward = jax.lax.stop_gradient(fact_reward)
                fr_sum = jnp.sum(fact_reward[:, 0] * rmask)
                aux_losses["fact_reward"] = fr_sum / n_rows
                sums["fact_reward"], counts["fact_reward"] = fr_sum, n_rows
            else:
                fact_reward = 0.0

            cls_reward = _cls_reward(frozen.sent_senti_cls, sample_seq,
                                     sample_masks, senti_labels, settings)
            n_tok_slots = n_rows * cls_reward.shape[1]
            cr_sum = jnp.sum(cls_reward * rmask[:, None])
            aux_losses["cls_reward"] = cr_sum / n_tok_slots
            sums["cls_reward"], counts["cls_reward"] = cr_sum, n_tok_slots

            rewards = fact_reward + CLS_FLAG * cls_reward
            if lm_tables is not None and lm_flag > 0.0:
                from ..ops import lm_device
                lmr = jax.lax.stop_gradient(lm_device.lm_reward(
                    lm_tables, sample_seq, greedy_seq, senti_labels,
                    ids.eos))
                lm_sum = jnp.sum(lmr * rmask[:, None])
                aux_losses["lm_reward"] = lm_sum / n_tok_slots
                sums["lm_reward"], counts["lm_reward"] = lm_sum, n_tok_slots
                rewards = rewards + lm_flag * lmr
            rw_sum = jnp.sum(rewards * rmask[:, None])
            aux_losses["all_rewards"] = rw_sum / n_tok_slots
            sums["all_rewards"], counts["all_rewards"] = rw_sum, n_tok_slots
            rl_sum, rl_cnt = cap.reward_criterion_sums(sample_lp,
                                                       sample_masks, rewards)
            rl_loss = rl_sum / rl_cnt
            aux_losses["cap_loss"] = rl_loss
            sums["cap_loss"], counts["cap_loss"] = rl_sum, rl_cnt

            total = rl_loss + da_loss

            if data_type == "fact":
                # XE on ground truth with pseudo labels, ss_prob=0.5
                # (decoder.py:131-141)
                xe_labels = _pseudo_senti_labels(
                    frozen.sent_senti_cls, batch["caps"], batch["lengths"],
                    settings)
                pred, _ = cap.forward_xe(
                    params, batch["fc"], batch["att"], batch["cpts"],
                    batch["caps"], xe_labels, settings=settings, rng=k_xe,
                    ss_prob=jnp.float32(RL_XE_SS_PROB),
                    deterministic=not training)
                lengths = batch["lengths"] * rmask.astype(
                    batch["lengths"].dtype)
                xe_sum, xe_cnt = cap.xe_criterion_sums(
                    pred, batch["caps"][:, 1:], lengths)
                xe_loss = xe_sum / xe_cnt
                aux_losses["xe_loss"] = xe_loss
                sums["xe_loss"], counts["xe_loss"] = xe_sum, xe_cnt
                total = total + xe_loss

            if training and scs_batch is not None:
                # seq2seq with ss_prob=0.25 (decoder.py:143-159)
                s2s_pred = cap.forward_seq2seq(
                    params, scs_batch["caps"], scs_batch["cpts"],
                    scs_batch["sentis"], scs_batch["senti_labels"],
                    settings=settings, rng=k_s2s,
                    ss_prob=jnp.float32(RL_SEQ_SS_PROB), deterministic=False)
                s2s_loss = SEQ_FLAG * cap.xe_criterion(
                    s2s_pred, scs_batch["caps"][:, 1:], scs_batch["lengths"])
                aux_losses["seq2seq_loss"] = s2s_loss
                total = total + s2s_loss

            return total, (aux_losses, sums, counts)

        return rollout_loss

    def make_train(data_type: str):
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, frozen: RLModels, batch, scs_batch,
                       rng):
            loss_fn = _forward(params, frozen, batch, scs_batch, rng,
                               data_type, training=True)
            (_, (losses, _, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            params, opt_state = optim.apply_updates(params, grads, opt_state,
                                                    tx)
            return params, opt_state, losses
        return train_step

    def make_eval(data_type: str):
        @jax.jit
        def eval_step(params, frozen: RLModels, batch, rng):
            """(sums, counts) per loss term — see rollout_loss; the CLI
            aggregates sums/counts across batches so eval-padding rows
            never bias val losses."""
            loss_fn = _forward(params, frozen, batch, None, rng, data_type,
                               training=False)
            _, (_, sums, counts) = loss_fn(params)
            return sums, counts
        return eval_step

    return {
        ("fact", True): make_train("fact"),
        ("senti", True): make_train("senti"),
        ("fact", False): make_eval("fact"),
        ("senti", False): make_eval("senti"),
    }


# ---------------------------------------------------------------------------
# Head stages
# ---------------------------------------------------------------------------

def make_concept_steps(settings, tx):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            out = cpt_det.forward(p, batch["fc"], dropout_p=settings.dropout_p,
                                  rng=rng, deterministic=False)
            return cpt_det.multi_label_loss(out, batch["cpts"])
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = optim.apply_updates(params, grads, opt_state, tx)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, batch):
        """(masked loss sum, valid row count, scores): eval-padding rows
        contribute nothing; CLIs divide aggregated sums by counts."""
        out = cpt_det.forward(params, batch["fc"],
                              dropout_p=0.0, deterministic=True)
        rows = cpt_det.multi_label_loss_rows(out, batch["cpts"])
        rmask = _row_mask(batch, rows.shape[0], rows.dtype)
        return jnp.sum(rows * rmask), jnp.sum(rmask), out

    return train_step, eval_step


def make_senti_steps(settings, tx):
    sd = senti_det.module_for(settings)   # standard head or the full variant

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            return sd.xent_loss(p, batch["att"], batch["labels"],
                                dropout_p=settings.dropout_p, rng=rng,
                                deterministic=False)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = optim.apply_updates(params, grads, opt_state, tx)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, batch):
        """(masked loss sum, valid row count, predicted labels)."""
        rows = sd.xent_nll_rows(params, batch["att"], batch["labels"])
        rmask = _row_mask(batch, rows.shape[0], rows.dtype)
        labels, _, _ = sd.sample(params, batch["att"], 0.0, 0)
        return jnp.sum(rows * rmask), jnp.sum(rmask), labels

    return train_step, eval_step


def make_cls_steps(settings, tx):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            return ss_cls.xent_loss(p, batch["caps"], batch["lengths"],
                                    batch["labels"], settings=settings,
                                    rng=rng, deterministic=False)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = optim.apply_updates(params, grads, opt_state, tx)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, batch):
        """(masked loss sum, valid row count, predicted labels)."""
        rows = ss_cls.xent_nll_rows(params, batch["caps"], batch["lengths"],
                                    batch["labels"], settings=settings)
        rmask = _row_mask(batch, rows.shape[0], rows.dtype)
        pred, _ = ss_cls.sample(params, batch["caps"], batch["lengths"],
                                settings=settings)
        return jnp.sum(rows * rmask), jnp.sum(rmask), pred

    return train_step, eval_step
