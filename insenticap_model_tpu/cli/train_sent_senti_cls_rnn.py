"""Sentence-sentiment-classifier training (reference
train_sent_senti_cls_rnn.py).

Train/val split carved from senti_captions.json (first 5000 neutral / 1000
pos / 1000 neg sentences as val, reference :72-79), integer-ratio upsampling
of the train pos/neg lists (:80-81), fixed shuffle seed 100 (:18), per-class
val accuracy with lr-halving when overall accuracy drops (:168-172).
Sentences are tokenized WITHOUT SOS and with EOS appended, lengths not
decremented (:88-93, dataloader.py:123-134).
"""
from __future__ import annotations

import copy
import os
import random

import jax
import numpy as np

from ..config import Opts
from ..models import sent_senti_cls as ss_cls
from ..data.loaders import device_prefetch
from ..training import checkpoint as ckpt
from ..training import optim, steps
from . import common
from .opts import parse_opt


def build_datasets(senti_captions, vocab, sentiment_categories, seed=100):
    """Returns (train_set, val_set) of [senti_id, ids] items, reproducing
    the reference's split + upsampling (train_sent_senti_cls_rnn.py:67-95)."""
    rng = random.Random(seed)
    caps = {s: [c[0] for c in senti_captions[s]] for s in senti_captions}
    for s in caps:
        rng.shuffle(caps[s])
    split = {"train": {}, "val": {}}
    for senti, n_val in (("neutral", 5000), ("positive", 1000),
                         ("negative", 1000)):
        # guard for corpora smaller than the reference's fixed val sizes
        # (identical behavior at real scale, where len >> n_val)
        n_val = min(n_val, len(caps[senti]) // 2)
        split["val"][senti] = copy.deepcopy(caps[senti][:n_val])
        split["train"][senti] = copy.deepcopy(caps[senti][n_val:])
    for senti in ("positive", "negative"):
        ratio = int(len(split["train"]["neutral"])
                    / max(len(split["train"][senti]), 1))
        split["train"][senti] = split["train"][senti] * ratio

    label2idx = {w: i for i, w in enumerate(sentiment_categories)}
    train_set, val_set = [], {}
    for senti in sentiment_categories:
        sid = label2idx[senti]
        for cap in split["train"][senti]:
            train_set.append(
                [sid, [vocab.word_to_id(w) for w in cap] + [vocab.eos_id]])
        val_set[senti] = [
            [sid, [vocab.word_to_id(w) for w in cap] + [vocab.eos_id]]
            for cap in split["val"][senti]]
    rng.shuffle(train_set)
    return train_set, val_set


def train(opt: Opts):
    rt = common.Runtime(opt)
    vocab = common.load_vocab(opt)
    senti_captions = common.load_json(
        common.corpus_path(opt, "senti_captions.json"))

    params = ss_cls.init_params(jax.random.PRNGKey(opt.seed), len(vocab),
                                len(opt.sentiment_categories), opt.settings)
    lr = 4e-4  # hardcoded in the reference (:39)
    tx = optim.make_optimizer(lr, opt.grad_clip)
    opt_state = tx.init(params)
    epoch0 = 0
    if opt.senti_resume:  # the reference uses a module-level `resume` var
        print(f"====> loading checkpoint '{opt.senti_resume}'")
        params, opt_state, meta = ckpt.load(opt.senti_resume, params,
                                            opt_state)
        ckpt.validate_metadata(
            meta, settings=opt.settings, idx2word=vocab.idx2word,
            sentiment_categories=opt.sentiment_categories,
            dataset_name=opt.dataset_name, corpus_type=opt.corpus_type)
        lr = meta.get("lr", lr)
        opt_state = optim.set_lr(opt_state, lr)
        epoch0 = meta["epoch"] + 1

    train_set, val_set = build_datasets(senti_captions, vocab,
                                        opt.sentiment_categories)
    bs = rt.round_bs(80)  # reference dataloader default (dataloader.py:364)
    train_loader = common.senti_sents_loader(train_set, opt.max_seq_len,
                                             vocab.pad_id, bs, seed=opt.seed)
    val_loaders = {s: common.senti_sents_loader(
        v, opt.max_seq_len, vocab.pad_id, bs, shuffle=False, drop_last=False)
        for s, v in val_set.items()}

    train_step, eval_step = steps.make_cls_steps(opt.settings, tx)
    params = rt.replicate(rt.cast(params))
    opt_state = rt.replicate(opt_state)

    ck_dir, result_dir = common.stage_dirs(opt, "sent_senti_cls")
    previous_acc = None
    for epoch in range(epoch0, 30):  # 30 epochs hardcoded (:110)
        print(f"--------------------epoch: {epoch}")
        train_loss, n = 0.0, 0
        for i, b in enumerate(device_prefetch(train_loader, rt.put)):
            params, opt_state, loss = train_step(
                params, opt_state, b,
                jax.random.fold_in(jax.random.PRNGKey(opt.seed),
                                   epoch * 100000 + i))
            train_loss += float(loss)
            n += 1
        train_loss /= max(n, 1)

        total = wrong = 0
        senti_acc = {}
        for senti, loader in val_loaders.items():
            s_tot = s_wrong = 0
            for batch in loader:
                b = rt.put(batch)
                _, _, pred = eval_step(params, b)
                valid = batch.get("valid", len(batch["labels"]))
                pred = np.asarray(pred)[:valid]
                s_wrong += int((pred != batch["labels"][:valid]).sum())
                s_tot += valid
            senti_acc[senti] = 100 - s_wrong / max(s_tot, 1) * 100
            total += s_tot
            wrong += s_wrong
        all_acc = 100 - wrong / max(total, 1) * 100

        if previous_acc is not None and all_acc < previous_acc:
            lr *= 0.5
            opt_state = optim.set_lr(opt_state, lr)
        previous_acc = all_acc

        print(f"train_loss: {train_loss:.4f}, all_acc_rate: {all_acc:.4f}, "
              f"senti_acc_rate: {senti_acc}")
        common.metrics_line(os.path.join(ck_dir, "metrics.jsonl"), {
            "epoch": epoch, "train_loss": train_loss, "all_acc": all_acc,
            **{f"acc_{k}": v for k, v in senti_acc.items()}})
        ckpt.save(ckpt.checkpoint_name(ck_dir, epoch, train_loss, all_acc),
                  params, opt_state, {
                      "epoch": epoch, "lr": lr,
                      "settings": opt.settings.to_dict(),
                      "idx2word": vocab.idx2word,
                      "sentiment_categories": list(opt.sentiment_categories),
                      "dataset_name": opt.dataset_name,
                      "corpus_type": opt.corpus_type})


def main(argv=None):
    common.run_with_post_mortem(train, parse_opt(argv))


if __name__ == "__main__":
    main()
