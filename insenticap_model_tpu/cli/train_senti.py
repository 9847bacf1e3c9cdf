"""Image-sentiment-detector training (reference train_senti.py).

CE on att-feature grids of sentiment-labeled images; plateau lr-halving;
per-epoch test accuracy with threshold-0 sampling (every prediction counts,
reference train_senti.py:99-108). Features come from the sentiment image
store at <feats_dir>/sentiment/feats_att.h5 (reference :58).
"""
from __future__ import annotations

import os

import jax
import numpy as np

from ..config import Opts
from ..models import sentiment_detector as senti_det
from ..data.loaders import device_prefetch
from ..training import checkpoint as ckpt
from ..training import optim, steps
from . import common
from .opts import parse_opt


def train(opt: Opts):
    rt = common.Runtime(opt)
    params = senti_det.module_for(opt.settings).init_params(
        jax.random.PRNGKey(opt.seed), len(opt.sentiment_categories),
        opt.settings)
    lr = opt.senti_lr
    tx = optim.make_optimizer(lr, opt.grad_clip)
    opt_state = tx.init(params)
    epoch0 = 0
    if opt.senti_resume:
        print(f"====> loading checkpoint '{opt.senti_resume}'")
        params, opt_state, meta = ckpt.load(opt.senti_resume, params,
                                            opt_state)
        ckpt.validate_metadata(
            meta, settings=opt.settings,
            sentiment_categories=opt.sentiment_categories)
        lr = meta.get("lr", lr)
        opt_state = optim.set_lr(opt_state, lr)
        epoch0 = meta["epoch"] + 1
        print(f"====> loaded checkpoint, epoch: {meta['epoch']}")

    img_senti_labels = common.load_json(opt.img_senti_labels)
    label2idx = {w: i for i, w in enumerate(opt.sentiment_categories)}
    items = {split: [(fn, label2idx[s]) for fn, s in pairs]
             for split, pairs in img_senti_labels.items()}

    att_store = common.open_store(common.sniff_store_path(
        os.path.join(opt.feats_dir, "sentiment", "feats_att.h5")))
    bs = rt.round_bs(opt.senti_bs)
    loaders = {split: common.senti_image_loader(
        att_store, items[split], bs, shuffle=(split == "train"),
        drop_last=(split == "train"), seed=opt.seed)
        for split in ("train", "val", "test")}

    train_step, eval_step = steps.make_senti_steps(opt.settings, tx)
    params = rt.replicate(rt.cast(params))
    opt_state = rt.replicate(opt_state)

    def run_epoch(split, training, epoch):
        nonlocal params, opt_state
        tot, n = 0.0, 0
        for i, b in enumerate(device_prefetch(loaders[split], rt.put)):
            if training:
                params, opt_state, loss = train_step(
                    params, opt_state, b,
                    jax.random.fold_in(jax.random.PRNGKey(opt.seed),
                                       epoch * 100000 + i))
                tot += float(loss)
                n += 1
            else:
                # masked sums: eval-padding rows contribute nothing
                loss_sum, cnt, _ = eval_step(params, b)
                tot += float(loss_sum)
                n += float(cnt)
        return tot / max(n, 1)

    ck_dir = common.ensure_dir(os.path.join(opt.checkpoint, "sentiment"))
    previous_loss = None
    for epoch in range(epoch0, opt.senti_epochs):
        print(f"--------------------epoch: {epoch}")
        train_loss = run_epoch("train", True, epoch)
        val_loss = run_epoch("val", False, epoch)

        corr = tot = 0
        for batch in loaders["test"]:
            b = rt.put(batch)
            _, _, pred = eval_step(params, b)
            valid = batch.get("valid", len(batch["labels"]))
            pred = np.asarray(pred)[:valid]
            corr += int((pred == batch["labels"][:valid]).sum())
            tot += valid
        corr_rate = corr / max(tot, 1)

        if previous_loss is not None and val_loss > previous_loss:
            lr *= 0.5
            opt_state = optim.set_lr(opt_state, lr)
        previous_loss = val_loss

        print(f"train_loss: {train_loss:.4f}, val_loss: {val_loss:.4f}, "
              f"corr_rate: {corr_rate:.4f}")
        common.metrics_line(os.path.join(ck_dir, "metrics.jsonl"), {
            "epoch": epoch, "train_loss": train_loss, "val_loss": val_loss,
            "corr_rate": corr_rate})
        # reference saves at epoch 0 and epochs > 5 (train_senti.py:120)
        if epoch == 0 or epoch > 5:
            ckpt.save(
                ckpt.checkpoint_name(ck_dir, epoch, train_loss, val_loss),
                params, opt_state, {
                    "epoch": epoch, "lr": lr,
                    "settings": opt.settings.to_dict(),
                    "sentiment_categories": list(opt.sentiment_categories)})


def main(argv=None):
    common.run_with_post_mortem(train, parse_opt(argv))


if __name__ == "__main__":
    main()
