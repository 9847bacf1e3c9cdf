"""SCST reward assembly (reference self_critical/utils.py:56-166).

Host-side variants operate on numpy arrays (exact parity with the reference's
CPU reward path); the device-side CIDEr-D lives in ops/ciderd_device.py and
the cls reward is computed on-device directly inside the RL train step.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .bleu import Bleu
from .ciderd import CiderD, seq_from_ids


def get_self_critical_reward(sample_captions: np.ndarray,
                             greedy_captions: np.ndarray,
                             fns: Sequence[str],
                             ground_truth: Dict[str, List[Sequence[int]]],
                             sos: int, eos: int, scorer) -> np.ndarray:
    """score(sample) - score(greedy), broadcast over all timesteps
    (reference self_critical/utils.py:56-83)."""
    bs = len(fns)
    assert sample_captions.shape[0] == greedy_captions.shape[0] == bs
    gts, res = {}, []
    for i, fn in enumerate(fns):
        res.append({"image_id": fn,
                    "caption": [seq_from_ids(sample_captions[i], sos, eos)]})
    for i, fn in enumerate(fns):
        res.append({"image_id": fn,
                    "caption": [seq_from_ids(greedy_captions[i], sos, eos)]})
        gts[fn] = [seq_from_ids(c, sos, eos) for c in ground_truth[fn]]
    if isinstance(scorer, CiderD):
        _, scores = scorer.compute_score(gts, res)
    elif isinstance(scorer, Bleu):
        _, per_sent = scorer.compute_score(gts, res)
        scores = np.array(per_sent[3])
    else:
        raise TypeError(f"unsupported scorer: {type(scorer)}")
    adv = scores[:bs] - scores[bs:]
    return np.repeat(adv[:, None], sample_captions.shape[1], axis=1)


def cls_reward_from_outputs(pred_labels: np.ndarray,
                            att_weights: np.ndarray,
                            senti_labels: np.ndarray,
                            max_len: int) -> np.ndarray:
    """Per-token cls reward = 1{pred == target} * excitation weights, padded
    to max_len (reference get_cls_reward, self_critical/utils.py:120-151).
    No baseline is subtracted (SURVEY.md §8.9)."""
    correct = (pred_labels == senti_labels).astype(att_weights.dtype)
    scores = correct[:, None] * att_weights
    pad = max_len - scores.shape[1]
    if pad > 0:
        scores = np.pad(scores, ((0, 0), (0, pad)))
    return scores[:, :max_len]


def get_senti_words_reward(sample_captions: np.ndarray,
                           senti_labels: np.ndarray,
                           sentiment_words: Dict[int, Dict[int, float]]):
    """Table-lookup reward for generated sentiment words (reference
    self_critical/utils.py:154-166; documented-unused capability — kept for
    API completeness)."""
    rewards = np.zeros(sample_captions.shape, float)
    accur: Dict[int, set] = {}
    for i in range(sample_captions.shape[0]):
        sid = int(senti_labels[i])
        table = sentiment_words.get(sid, {})
        for j, w in enumerate(sample_captions[i]):
            w = int(w)
            if w in table:
                rewards[i, j] = table[w]
                accur.setdefault(sid, set()).add(w)
    return rewards, accur


def get_lm_reward(sample_captions: np.ndarray, greedy_captions: np.ndarray,
                  senti_labels: np.ndarray, sos: int, eos: int,
                  lms) -> np.ndarray:
    """sign(lm(greedy) - lm(sample)) broadcast over timesteps (reference
    self_critical/utils.py:86-100). ``lms[senti_id]`` must expose
    ``score(seq) -> float`` on id tuples — e.g. kenlm.LanguageModel over the
    id-form arpa files written by preprocessing.get_lm_sents (the reference
    wires exactly that, train_rl.py:212-216, and leaves it disabled)."""
    bs = sample_captions.shape[0]
    scores = []
    for i in range(bs):
        lm = lms[int(senti_labels[i])]
        s = seq_from_ids(sample_captions[i], sos, eos)
        g = seq_from_ids(greedy_captions[i], sos, eos)
        scores.append(np.sign(lm.score(g) - lm.score(s)))
    return np.repeat(np.array(scores)[:, None], sample_captions.shape[1],
                     axis=1)
