"""Deterministic synthetic corpus in the reference's artifact schemas.

One seeded generator for the fabricated ``./data`` tree used by the e2e
CLI tests (tests/test_cli_stages.py) and by the quality-metrics
regression anchor (tools/build_anchor.py, VERDICT r3 next #5): captions
+ concepts + sentiment labels JSON files (reference
preprocess.py:52-213 schemas) and fc/att feature stores (the h5
contract of /root/reference/datasets.py:24-60). Real COCO/SentiCap data
is not available in this environment; this corpus is the committed
stand-in that keeps the full 7-stage pipeline and its metric table
regression-guarded.

Everything is a pure function of (seed, sizes): the anchor's value
depends on the corpus being bit-identical between the committed
ANCHOR.json build and the guarding test's rebuild.
"""
from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

WORDS = ["cat", "dog", "man", "tree", "happy", "sad", "red", "blue",
         "runs", "sits", "big", "small", "nice", "ugly", "good", "bad"]
CONCEPTS = WORDS[:8]
N_IMG = {"train": 12, "val": 6, "test": 6}
N_SENTI_IMG = {"train": 8, "val": 4, "test": 4}
CATS = ["positive", "negative", "neutral"]


def build_tree(root: str, settings, *, seed: int = 0,
               n_img: Dict[str, int] = N_IMG,
               n_senti_img: Dict[str, int] = N_SENTI_IMG) -> None:
    """Fabricate the ./data tree under `root` (created if needed).

    settings: config.Settings — only fc_feat_dim/att_feat_dim are read
    (feature-store row shapes)."""
    g = np.random.default_rng(seed)
    root = os.path.abspath(root)
    cap_dir = os.path.join(root, "data/captions/coco/part")
    feats_coco = os.path.join(root, "data/features/coco")
    feats_senti = os.path.join(root, "data/features/sentiment")
    for d in (cap_dir, feats_coco, feats_senti):
        os.makedirs(d, exist_ok=True)

    def wjson(rel, obj):
        with open(os.path.join(root, rel), "w") as f:
            json.dump(obj, f)

    idx2word = ["<PAD>", "<UNK>", "<SOS>", "<EOS>"] + WORDS
    wjson("data/captions/coco/part/idx2word.json", idx2word)
    wjson("data/captions/coco/idx2concept.json", CONCEPTS)

    def rand_caption():
        L = int(g.integers(3, 7))
        return [WORDS[int(j)] for j in g.integers(0, len(WORDS), L)]

    img_captions, img_concepts = {}, {}
    all_fns = []
    for split, n in n_img.items():
        img_captions[split] = {}
        img_concepts[split] = {}
        for i in range(n):
            fn = f"{split}_img{i}.jpg"
            all_fns.append(fn)
            img_captions[split][fn] = [rand_caption() for _ in range(3)]
            # sorted, NOT list(set(...)): set iteration order depends on
            # PYTHONHASHSEED and the anchor needs a cross-process
            # bit-identical corpus
            img_concepts[split][fn] = sorted(
                {WORDS[int(j)] for j in g.integers(0, 8, 4)})
    wjson("data/captions/coco/img_captions.json", img_captions)
    wjson("data/captions/coco/img_concepts.json", img_concepts)

    senti_fns = []
    senti_cls = {}
    img_senti_labels = {}
    for split, n in n_senti_img.items():
        img_senti_labels[split] = []
        for i in range(n):
            fn = f"senti_{split}_img{i}.jpg"
            senti_fns.append(fn)
            senti_cls[fn] = i % 3
            img_senti_labels[split].append([fn, CATS[i % 3]])
    wjson("data/captions/img_senti_labels.json", img_senti_labels)

    # senti corpus: [cap_words, cpt_words, senti_words] triples; ≥160
    # neutral so the scs loader (bs=80, drop_last) yields batches
    senti_captions = {}
    for senti, n in (("positive", 30), ("negative", 30), ("neutral", 160)):
        senti_captions[senti] = [
            [rand_caption(), [WORDS[int(g.integers(0, 8))]],
             [WORDS[4 + int(g.integers(0, 4))]]] for _ in range(n)]
    wjson("data/captions/coco/part/senti_captions.json", senti_captions)

    import h5py
    with h5py.File(os.path.join(feats_coco, "coco_fc.h5"), "w") as f_fc, \
            h5py.File(os.path.join(feats_coco, "coco_att.h5"), "w") as f_att:
        for fn in all_fns:
            f_fc[fn] = g.normal(
                size=(settings.fc_feat_dim,)).astype(np.float32)
            f_att[fn] = g.normal(
                size=(14, 14, settings.att_feat_dim)).astype(np.float32)
    # senti features carry a CLASS-INFORMATIVE channel shift on top of
    # the noise: a sentiment detector trained on the train split then
    # generalizes to test images with confidence above the 0.7 neutral
    # threshold, so downstream stages (RL dump grouping, cls%, ppl) see
    # all three sentiments — the anchor can guard them (pure noise
    # features left every test prediction at the neutral fallback)
    with h5py.File(os.path.join(feats_senti, "feats_fc.h5"), "w") as f_fc, \
            h5py.File(os.path.join(feats_senti, "feats_att.h5"),
                      "w") as f_att:
        for fn in senti_fns:
            c = senti_cls[fn]
            shift = np.zeros((settings.att_feat_dim,), np.float32)
            third = settings.att_feat_dim // 3
            shift[c * third:(c + 1) * third] = 2.0
            f_fc[fn] = g.normal(
                size=(settings.fc_feat_dim,)).astype(np.float32)
            f_att[fn] = (g.normal(size=(14, 14, settings.att_feat_dim))
                         .astype(np.float32) + shift)
