"""Single-command serving: caption image files end-to-end.

The reference has no one-shot inference command — users chain preprocess
(feature extraction), detect_concepts, preprocessing's det_sentiments and
then drive Detector.sample from inside train_rl's test loop. This CLI
composes the full inference DAG (SURVEY.md §3.4-3.5) in one process:

    raw image -> patched ResNet-101 (fc, att)
              -> concept detector (top-5 concept words)
              -> noun->sentiment-word table (ranked senti words)
              -> image sentiment detector (or a forced label)
              -> sentiment-conditioned batched beam search

    python caption.py -i img1.jpg img2.jpg \\
        --rl_model checkpoint/rl/coco/part/model_29.ckpt \\
        --concept_model checkpoint/concept/coco/model-best.ckpt \\
        --resnet101_ckpt resnet101.ckpt \\
        [--sentiment auto|positive|negative|neutral] [--beam_size 3]

Prints one JSON line per image: {"image", "sentiment", "caption", "score"}.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import inference, preprocessing
from ..config import Settings
from ..models import captioner as cap
from ..models import concept_detector as cpt_det
from ..models import encoder as enc
from ..models import sentiment_detector as senti_det
from ..training import checkpoint as ckpt
from ..vocab import Vocab
from . import common


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--images", nargs="+", required=True)
    p.add_argument("--rl_model", type=str, required=True,
                   help="composite RL checkpoint (captioner + detectors)")
    p.add_argument("--concept_model", type=str, required=True)
    p.add_argument("--resnet101_ckpt", type=str, required=True,
                   help="converted encoder checkpoint "
                        "(convert_checkpoint.py resnet101 ...)")
    p.add_argument("--sentiment_detector_json", type=str,
                   default="./data/corpus/part/sentiment_detector.json")
    p.add_argument("--sentiment", type=str, default="auto",
                   choices=["auto", "positive", "negative", "neutral"])
    p.add_argument("--beam_size", type=int, default=3)
    p.add_argument("--max_seq_len", type=int, default=16)
    p.add_argument("--num_concepts", type=int, default=5)
    p.add_argument("--num_sentiments", type=int, default=10)
    p.add_argument("--dump_attention", type=str, default="",
                   help="directory: write per-image .npz with the decode-"
                        "time attention weights per generated word (14x14 "
                        "content map; senti/fuse weights in auto mode)")
    return p


def load_models(a):
    meta = ckpt.load_metadata(a.rl_model)
    settings = Settings.from_dict(meta["settings"])
    vocab = Vocab(meta["idx2word"])
    cats = meta["sentiment_categories"]
    composite = {
        "captioner": cap.init_params(jax.random.PRNGKey(0), len(vocab),
                                     len(cats), settings),
        "senti_detector": senti_det.module_for(settings).init_params(
            jax.random.PRNGKey(1), len(cats), settings),
        "sent_senti_cls": None,
    }
    loaded, _, _ = ckpt.load(a.rl_model, {
        k: v for k, v in composite.items() if v is not None})
    cpt_params, idx2concept = common.load_concept_model(a.concept_model)
    enc_params, _, _ = ckpt.load(a.resnet101_ckpt, enc.init_params(
        jax.random.PRNGKey(3)))
    return (settings, vocab, cats, loaded["captioner"],
            loaded["senti_detector"], cpt_params, idx2concept, enc_params)


def run(a) -> list:
    (settings, vocab, cats, cap_params, senti_params, cpt_params,
     idx2concept, enc_params) = load_models(a)
    ids = common.token_ids(vocab, cats)
    with open(a.sentiment_detector_json) as f:
        senti_table = json.load(f)

    enc_fwd = jax.jit(lambda p, x: enc.forward_batch(p, x))
    dump_att = bool(a.dump_attention)
    serve = inference.make_serving_fn(settings, ids, a.beam_size,
                                      a.max_seq_len,
                                      return_weights=dump_att)
    serve_forced = inference.make_forced_serving_fn(
        settings, ids, a.beam_size, a.max_seq_len,
        return_weights=dump_att)
    if dump_att:
        os.makedirs(a.dump_attention, exist_ok=True)

    # encoder pass bucketed by exact image shape: one ResNet compile per
    # distinct (H, W) instead of per image (compiles are minutes-slow)
    feats = {}
    buckets = {}
    for path in a.images:
        x = enc.preprocess(preprocessing.load_image(path))
        buckets.setdefault(x.shape, []).append((path, x))
    for shape, group in buckets.items():
        fc, att = enc_fwd(enc_params, np.stack([x for _, x in group]))
        for i, (path, _) in enumerate(group):
            feats[path] = (fc[i:i + 1], att[i:i + 1])

    results = []
    for path in a.images:
        fc, att = feats[path]
        _, top_idx, _ = cpt_det.sample(cpt_params, fc, a.num_concepts)
        concepts = [idx2concept[k] for k in np.asarray(top_idx)[0]]
        sentis = common.senti_word_ids(concepts, senti_table, vocab,
                                       a.num_sentiments)[None]

        weights = None
        if a.sentiment == "auto":
            sparams = inference.ServingParams(captioner=cap_params,
                                              senti_detector=senti_params)
            out = serve(sparams, fc, att, jnp.asarray(sentis))
            (seqs, scores, labels), weights = (out[:3],
                                               out[3] if dump_att else None)
            label = int(np.asarray(labels)[0])
        else:
            label = cats.index(a.sentiment)
            out = serve_forced(
                cap_params, fc, att, jnp.asarray(sentis),
                jnp.full((1,), label, jnp.int32))
            (seqs, scores), weights = (out[:2],
                                       out[2] if dump_att else None)
        rec = {"image": os.path.basename(path),
               "sentiment": cats[label],
               "caption": vocab.decode_to_text(np.asarray(seqs)[0, 0]),
               "score": float(np.asarray(scores)[0, 0])}
        if dump_att:
            # one attention map per generated word of the TOP candidate
            # (reference _get_weights introspection, captioner.py:83-94)
            tokens = [int(t) for t in np.asarray(seqs)[0, 0]]
            n_words = next((i for i, t in enumerate(tokens)
                            if t == vocab.eos_id), len(tokens))
            dump = {"tokens": np.asarray(tokens[:n_words], np.int32),
                    "words": np.asarray(
                        [vocab.idx2word[t] for t in tokens[:n_words]])}
            for key, arr in weights.items():
                w = np.asarray(arr)[0, 0, :n_words]          # [T, ...]
                if key == "cont":
                    w = w.reshape(n_words, 14, 14)
                dump[key] = w
            out_path = os.path.join(
                a.dump_attention,
                os.path.splitext(os.path.basename(path))[0] + "_att.npz")
            np.savez(out_path, **dump)
            rec["attention"] = out_path
        results.append(rec)
        print(json.dumps(rec))
    return results


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
