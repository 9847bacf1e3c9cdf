"""Measure the REFERENCE XE train step (torch, CPU) — the training-side
baseline companion to bench_reference.py's serving measurement.

Replicates one full optimizer step of the reference's train_xe loop
(/root/reference/train_xe.py:150-192): sent_senti_cls labeling in
no_grad, captioner forward_xe, XECriterion + MSE domain-align loss, a
seq2seq pass, backward, elementwise grad clamp (clip_gradient,
opts.py:63), Adam step — at production shapes with random weights.

Usage: python tools/bench_reference_train.py [bs] [iters]
Writes REF_TRAIN_BENCH.json next to the repo root; compare with
`python tools/bench_train.py` (same step semantics on TPU).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_common import (SENTI_CATS, SETTINGS, VOCAB,  # noqa: E402
                        add_ref_path, clip_gradient, idx2word, synth_caps)

add_ref_path()

import numpy as np  # noqa: E402
import torch  # noqa: E402


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from models.captioner import Captioner
    from models.sent_senti_cls import SentenceSentimentClassifier

    torch.manual_seed(0)
    captioner = Captioner(idx2word(), SENTI_CATS, SETTINGS).train()
    cls = SentenceSentimentClassifier(idx2word(), SENTI_CATS,
                                      SETTINGS).eval()
    optimizer, xe_crit, da_crit = captioner.get_optim_criterion(4e-4)

    g = np.random.default_rng(0)
    caps, lengths = synth_caps(g, bs)
    fc = torch.from_numpy(g.normal(size=(bs, 2048)).astype(np.float32))
    att = torch.from_numpy(
        g.normal(size=(bs, 14, 14, 2048)).astype(np.float32))
    caps_t = torch.from_numpy(caps)
    cpts_t = torch.from_numpy(
        g.integers(4, VOCAB, size=(bs, 5)).astype(np.int64))
    sentis_t = torch.from_numpy(
        g.integers(4, VOCAB, size=(bs, 10)).astype(np.int64))
    senti_labels_t = torch.from_numpy(
        g.integers(0, 3, size=(bs,)).astype(np.int64))

    def step():
        with torch.no_grad():
            xl, _ = cls(caps_t[:, 1:], lengths)
            xl = xl.softmax(dim=-1).argmax(dim=-1).detach()
        pred = captioner(fc, att, cpts_t, caps_t, xl, 0.0, mode="xe")
        xe_loss = xe_crit(pred, caps_t[:, 1:], lengths)
        da_loss = da_crit(captioner.cpt_feats, captioner.fc_feats.detach())
        pred2 = captioner(caps_t, cpts_t, sentis_t, senti_labels_t, 0.0,
                          mode="seq2seq")
        seq2seq_loss = xe_crit(pred2, caps_t[:, 1:], lengths)
        all_loss = xe_loss + da_loss + seq2seq_loss
        optimizer.zero_grad()
        all_loss.backward()
        clip_gradient(optimizer, 0.1)
        optimizer.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters

    result = {
        "metric": "reference_xe_train_samples_per_sec_torch_cpu",
        "value": round(bs / dt, 2),
        "unit": "samples/s",
        "step_ms": round(dt * 1e3, 1),
        "batch_size": bs,
        "torch_threads": torch.get_num_threads(),
        "note": "reference train_xe step (xe + domain-align + seq2seq + "
                "Adam/clamp), random weights, production shapes, this "
                "host's CPU",
    }
    print(json.dumps(result))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "REF_TRAIN_BENCH.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
