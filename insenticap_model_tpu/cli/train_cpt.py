"""Concept-detector training (reference train_cpt.py).

Multi-label BCE over fc features, plateau lr-halving, per-epoch test
precision/recall@num_concepts. The whole train step is one jitted XLA
program over the data mesh; top-k sampling for the test metrics runs jitted
too, with precision/recall reduced on host exactly as the reference does
(train_cpt.py:107-128).
"""
from __future__ import annotations

import os

import jax
import numpy as np

from ..config import Opts
from ..models import concept_detector as cpt_det
from ..training import checkpoint as ckpt
from ..data.loaders import device_prefetch
from ..training import optim, steps
from . import common
from .opts import parse_opt


def train(opt: Opts):
    rt = common.Runtime(opt)
    idx2concept = common.load_json(
        common.dataset_path(opt, "idx2concept.json"))
    img_concepts = common.load_json(
        common.dataset_path(opt, "img_concepts.json"))
    concept2idx = {w: i for i, w in enumerate(idx2concept)}
    ground_truth = {fn: list(cpts)
                    for fn, cpts in img_concepts["test"].items()}

    concepts_id = {
        split: {fn: [concept2idx[c] for c in cpts if c in concept2idx]
                for fn, cpts in d.items()}
        for split, d in img_concepts.items()}

    params = cpt_det.init_params(jax.random.PRNGKey(opt.seed),
                                 len(idx2concept), opt.settings)
    lr = opt.concept_lr
    tx = optim.make_optimizer(lr, opt.grad_clip)
    opt_state = tx.init(params)
    epoch0 = 0
    if opt.concept_resume:
        print(f"====> loading checkpoint '{opt.concept_resume}'")
        params, opt_state, meta = ckpt.load(opt.concept_resume, params,
                                            opt_state)
        ckpt.validate_metadata(meta, settings=opt.settings,
                               dataset_name=opt.dataset_name)
        if list(meta.get("idx2concept", idx2concept)) != list(idx2concept):
            raise ckpt.CheckpointError("idx2concept mismatch")
        lr = meta.get("lr", lr)
        opt_state = optim.set_lr(opt_state, lr)
        epoch0 = meta["epoch"] + 1
        print(f"====> loaded checkpoint, epoch: {meta['epoch']}")

    fc_path, _ = common.feature_paths(opt)
    fc_store = common.open_store(fc_path)
    bs = rt.round_bs(opt.concept_bs)
    loaders = {}
    for split in ("train", "val", "test"):
        items = list(concepts_id[split].items())
        loaders[split] = common.concept_loader(
            fc_store, items, len(idx2concept), bs,
            shuffle=(split == "train"), drop_last=(split == "train"),
            seed=opt.seed)

    train_step, eval_step = steps.make_concept_steps(opt.settings, tx)

    @jax.jit
    def sample_step(params, fc):
        return cpt_det.sample(params, fc, opt.num_concepts)

    params = rt.replicate(rt.cast(params))
    opt_state = rt.replicate(opt_state)

    def run_epoch(split, training, epoch):
        tot, n = 0.0, 0
        nonlocal params, opt_state
        for i, b in enumerate(device_prefetch(loaders[split], rt.put)):
            if training:
                params, opt_state, loss = train_step(
                    params, opt_state, b,
                    jax.random.fold_in(jax.random.PRNGKey(opt.seed),
                                       epoch * 100000 + i))
                tot += float(loss)
                n += 1
            else:
                # masked sums: eval-padding rows contribute nothing and the
                # per-row normalization happens once over the whole split
                loss_sum, cnt, _ = eval_step(params, b)
                tot += float(loss_sum)
                n += float(cnt)
        return tot / max(n, 1)

    ck_dir = common.ensure_dir(os.path.join(opt.checkpoint, "concept",
                                            opt.dataset_name))
    previous_loss = None
    for epoch in range(epoch0, opt.concept_epochs):
        print(f"--------------------epoch: {epoch}")
        train_loss = run_epoch("train", True, epoch)
        val_loss = run_epoch("val", False, epoch)

        # test: precision/recall@k on ground-truth words
        # (reference train_cpt.py:103-128)
        test_loss = pre = recall = last_score = 0.0
        test_rows = 0.0
        nb = 0
        for batch in loaders["test"]:
            b = rt.put(batch)
            loss_sum, cnt, _ = eval_step(params, b)
            _, top_idx, top_scores = sample_step(params, b["fc"])
            top_idx = np.asarray(top_idx)
            valid = batch.get("valid", len(batch["fns"]))
            tmp_pre = tmp_rec = 0.0
            for i, fn in enumerate(batch["fns"][:valid]):
                cpts = {idx2concept[j] for j in top_idx[i]}
                grdt = set(ground_truth[fn])
                inter = len(grdt & cpts)
                tmp_pre += inter / len(cpts)
                tmp_rec += inter / len(grdt)
            test_loss += float(loss_sum)
            test_rows += float(cnt)
            pre += tmp_pre / valid
            recall += tmp_rec / valid
            last_score += float(np.asarray(top_scores)[:valid, -1].mean())
            nb += 1
        nb = max(nb, 1)
        test_loss /= max(test_rows, 1)
        pre, recall, last_score = (
            x / nb for x in (pre, recall, last_score))

        if previous_loss is not None and val_loss > previous_loss:
            lr *= 0.5
            opt_state = optim.set_lr(opt_state, lr)
        previous_loss = val_loss

        print(f"train_loss: {train_loss:.4f}, val_loss: {val_loss:.4f}, "
              f"test_loss: {test_loss:.4f}, precision: {pre:.4f}, "
              f"recall: {recall:.4f}, last_score: {last_score:.4f}")
        common.metrics_line(os.path.join(ck_dir, "metrics.jsonl"), {
            "epoch": epoch, "train_loss": train_loss, "val_loss": val_loss,
            "test_loss": test_loss, "precision": pre, "recall": recall})
        ckpt.save(ckpt.checkpoint_name(ck_dir, epoch, train_loss, val_loss),
                  params, opt_state, {
                      "epoch": epoch, "lr": lr,
                      "settings": opt.settings.to_dict(),
                      "idx2concept": idx2concept,
                      "dataset_name": opt.dataset_name})


def main(argv=None):
    common.run_with_post_mortem(train, parse_opt(argv))


if __name__ == "__main__":
    main()
