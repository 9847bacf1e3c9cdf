"""Measure the REFERENCE SCST-RL train step (torch, CPU) — the RL-side
baseline companion to tools/bench_reference_train.py.

Replicates one "fact"-mode optimizer step of the reference Detector
forward (/root/reference/models/decoder.py:52-176): sentiment detection,
sampled + greedy rollouts, host CIDEr-D self-critical reward
(get_self_critical_reward) + cls reward, RewardCriterion + xe +
domain-align + seq2seq losses, backward, elementwise clamp, Adam step —
at production shapes with random weights.

Usage: python tools/bench_reference_rl.py [bs] [iters]
Writes REF_RL_BENCH.json; compare with `python tools/bench_train.py`
(same step semantics fully on-device on TPU).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_common import (SENTI_CATS, SETTINGS, T, VOCAB,  # noqa: E402
                        add_ref_path, clip_gradient, idx2word, synth_caps)

add_ref_path()

import numpy as np  # noqa: E402
import torch  # noqa: E402

CLS_FLAG = 0.4  # reference opts.py:62 rl_cls_flag


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from models.captioner import Captioner
    from models.sentiment_detector import SentimentDetector
    from models.sent_senti_cls import SentenceSentimentClassifier
    from self_critical.utils import (RewardCriterion, get_ciderd_scorer,
                                     get_cls_reward,
                                     get_self_critical_reward)

    torch.manual_seed(0)
    captioner = Captioner(idx2word(), SENTI_CATS, SETTINGS).train()
    senti_det = SentimentDetector(SENTI_CATS, SETTINGS).eval()
    cls = SentenceSentimentClassifier(idx2word(), SENTI_CATS,
                                      SETTINGS).eval()
    optimizer, xe_crit, da_crit = captioner.get_optim_criterion(4e-5)
    rl_crit = RewardCriterion()

    g = np.random.default_rng(0)
    fns = [f"img{i}" for i in range(bs)]
    ground_truth = {fn: [[2] + list(map(int, g.integers(4, VOCAB, size=9)))
                         + [3] for _ in range(5)] for fn in fns}
    scorer = get_ciderd_scorer({"train": ground_truth}, 2, 3)

    caps, lengths = synth_caps(g, bs)
    fc = torch.from_numpy(g.normal(size=(bs, 2048)).astype(np.float32))
    att = torch.from_numpy(
        g.normal(size=(bs, 14, 14, 2048)).astype(np.float32))
    caps_t = torch.from_numpy(caps)
    cpts_t = torch.from_numpy(
        g.integers(4, VOCAB, size=(bs, 5)).astype(np.int64))
    sentis_t = torch.from_numpy(
        g.integers(4, VOCAB, size=(bs, 10)).astype(np.int64))
    s_labels = torch.from_numpy(
        g.integers(0, 3, size=(bs,)).astype(np.int64))

    def step():
        # decoder.py:83-176, 'fact' branch
        with torch.no_grad():
            senti_labels, _, _, _ = senti_det.sample(att, 0.7)
        sample_caps, sample_lps, seq_masks = captioner(
            fc, att, cpts_t, sentis_t, senti_labels, T, sample_max=0,
            mode="rl")
        da_loss = da_crit(captioner.cpt_feats, captioner.fc_feats.detach())
        captioner.eval()
        with torch.no_grad():
            greedy_caps, _, greedy_masks = captioner(
                fc, att, cpts_t, sentis_t, senti_labels, T, sample_max=1,
                mode="rl")
        captioner.train(True)
        fact_reward = get_self_critical_reward(
            sample_caps, greedy_caps, fns, ground_truth, 2, 3, scorer)
        fact_reward = torch.from_numpy(fact_reward).float()
        cls_reward = get_cls_reward(sample_caps, seq_masks, greedy_caps,
                                    greedy_masks, senti_labels, cls)
        cls_reward = torch.from_numpy(cls_reward).float()
        rewards = fact_reward + CLS_FLAG * cls_reward
        cap_loss = rl_crit(sample_lps, seq_masks, rewards)
        pred = captioner(fc, att, cpts_t, caps_t, senti_labels, 0.0,
                         mode="xe")
        xe_loss = xe_crit(pred, caps_t[:, 1:], lengths)
        pred2 = captioner(caps_t, cpts_t, sentis_t, s_labels, 0.0,
                          mode="seq2seq")
        seq2seq_loss = xe_crit(pred2, caps_t[:, 1:], lengths)
        loss = cap_loss + xe_loss + da_loss + seq2seq_loss
        optimizer.zero_grad()
        loss.backward()
        clip_gradient(optimizer)
        optimizer.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters

    result = {
        "metric": "reference_rl_train_samples_per_sec_torch_cpu",
        "value": round(bs / dt, 2),
        "unit": "samples/s",
        "step_ms": round(dt * 1e3, 1),
        "batch_size": bs,
        "torch_threads": torch.get_num_threads(),
        "note": "reference SCST step (senti detect + 2 rollouts + host "
                "CIDEr-D/cls rewards + xe/da/seq2seq aux + Adam/clamp), "
                "random weights, production shapes, this host's CPU",
    }
    print(json.dumps(result))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "REF_RL_BENCH.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
