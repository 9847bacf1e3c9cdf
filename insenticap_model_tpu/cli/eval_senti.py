"""Sentiment-detector threshold sweep on the hand-labeled subset (reference
eval_senti.py): accuracy per sentiment and overall for thresholds 0..1, then
precision per predicted class."""
from __future__ import annotations

import os
from collections import defaultdict

import jax
import numpy as np

from ..config import Opts, Settings
from ..models import sentiment_detector as senti_det
from ..training import checkpoint as ckpt
from . import common
from .opts import parse_opt

LABELED_FILE = "./data/labeled_data/at_most_one_disagree.json"


def run(opt: Opts):
    labeled = common.load_json(LABELED_FILE)
    print(f"====> loading rl_senti_resume '{opt.rl_senti_resume}'")
    meta = ckpt.load_metadata(opt.rl_senti_resume)
    settings = Settings.from_dict(meta["settings"])
    cats = meta["sentiment_categories"]
    template = senti_det.module_for(settings).init_params(
        jax.random.PRNGKey(0), len(cats), settings)
    params, _, _ = ckpt.load(opt.rl_senti_resume, template)
    neu_idx = cats.index("neutral")

    att_store = common.open_store(common.sniff_store_path(os.path.join(
        opt.feats_dir, "coco", "coco_att.h5")))

    @jax.jit
    def sample(att):
        # threshold applied on host per sweep value
        return senti_det.module_for(settings).sample(params, att, 0.0,
                                                      neu_idx)

    evals = {}
    for senti, fns in labeled.items():
        att = att_store.batch(fns).astype(np.float32)
        preds, _, scores = sample(att)
        evals[senti] = (np.asarray(preds), np.asarray(scores),
                        np.full(len(fns), cats.index(senti)))

    for t in range(11):
        thr = t / 10
        print("THRESHOLD:", thr)
        all_n = all_cor = 0
        for senti, (preds, scores, labels) in evals.items():
            p = np.where(scores < thr, neu_idx, preds)
            cor = int((p == labels).sum())
            print(f"{senti} accuracy: {cor / len(p)}")
            all_n += len(p)
            all_cor += cor
        print("all accuracy:", all_cor / all_n)

    for t in range(10):
        thr = t / 10
        print("THRESHOLD:", thr)
        num = defaultdict(int)
        cor = defaultdict(int)
        for senti, (preds, scores, labels) in evals.items():
            p = np.where(scores < thr, neu_idx, preds)
            for idx in range(len(cats)):
                num[idx] += int((p == idx).sum())
            lab = int(labels[0])
            cor[lab] += int((p == lab).sum())
        for sid in num:
            print(f"{cats[sid]} precision: {cor[sid] / (num[sid] + 1e-9)}")
        print("all precision:",
              sum(cor.values()) / max(sum(num.values()), 1))
        for sid in num:
            print(f"{cats[sid]} all num: {num[sid]}, cor num: {cor[sid]}")


def main(argv=None):
    run(parse_opt(argv))


if __name__ == "__main__":
    main()
