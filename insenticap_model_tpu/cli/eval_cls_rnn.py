"""Sentiment-correctness (cls%) of generated captions (reference
eval_cls_rnn.py): classifies the id-form result .txt files with the frozen
sentence-sentiment classifier. Same CLI: prefix + data_type positional
args; dataset/corpus inferred from the prefix string (reference :15-20)."""
from __future__ import annotations

import sys

import jax
import numpy as np

from ..config import Opts, Settings
from ..models import sent_senti_cls as ss_cls
from ..training import checkpoint as ckpt
from ..vocab import Vocab
from . import common

MAX_SEQ_LEN = 16  # reference eval_cls_rnn.py:11


def compute_cls(captions_file_prefix: str, data_type: str,
                checkpoint_dir: str = "./checkpoint") -> dict:
    dataset_name = "flickr30k" if "flickr30k" in captions_file_prefix \
        else "coco"
    corpus_type = "full" if "full" in captions_file_prefix else "part"

    opt = Opts(dataset_name=dataset_name, corpus_type=corpus_type,
               checkpoint=checkpoint_dir)
    path = common.best_checkpoint(opt, "sent_senti_cls")
    print(f"====> loading checkpoint '{path}'")
    meta = ckpt.load_metadata(path)
    settings = Settings.from_dict(meta["settings"])
    vocab = Vocab(meta["idx2word"])
    cats = meta["sentiment_categories"]
    template = ss_cls.init_params(jax.random.PRNGKey(0), len(vocab),
                                  len(cats), settings)
    params, _, _ = ckpt.load(path, template)

    val_sets = {"all": []}
    for senti_id, senti in enumerate(cats):
        val_sets[senti] = []
        fn = f"{captions_file_prefix}_{senti}_{data_type}.txt"
        with open(fn) as f:
            for line in f:
                ids = [int(t) for t in line.split()]
                val_sets[senti].append([senti_id, ids])
                val_sets["all"].append([senti_id, ids])

    @jax.jit
    def predict(caps, lengths):
        pred, _ = ss_cls.sample(params, caps, lengths, settings=settings)
        return pred

    acc = {}
    for senti, items in val_sets.items():
        loader = common.senti_sents_loader(items, MAX_SEQ_LEN, vocab.pad_id,
                                           bs=80, shuffle=False,
                                           drop_last=False)
        total = wrong = 0
        for batch in loader:
            pred = np.asarray(predict(batch["caps"], batch["lengths"]))
            valid = batch.get("valid", len(batch["labels"]))
            wrong += int((pred[:valid] != batch["labels"][:valid]).sum())
            total += valid
        acc[senti] = 1 - wrong / max(total, 1)
        print(f"{senti} acc_rate: {acc[senti]:.6f}")
    return acc


def main(argv=None):
    args = argv if argv is not None else sys.argv[1:]
    compute_cls(args[0], args[1])


if __name__ == "__main__":
    main()
