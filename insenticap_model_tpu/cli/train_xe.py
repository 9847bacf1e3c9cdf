"""Captioner XE pre-training (reference train_xe.py).

Per-epoch flow mirrors the reference exactly: scheduled-sampling schedule
(:209-212), jitted train step computing xe + domain-alignment + seq2seq
losses with frozen ss-cls pseudo labels (steps.make_xe_steps), val pass,
whole-test-split beam-search dump (:219-232) — here one jitted batched
beam decode instead of per-image Python loops — lr halving on val plateau
(:234-238), and checkpoints at the reference's epoch set (:241-254).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Opts
from ..models import captioner as cap
from ..models import sent_senti_cls as ss_cls
from ..training import checkpoint as ckpt
from ..training import optim, steps
from .. import inference
from ..data.loaders import CycleIterator, device_prefetch
from . import common
from .opts import parse_opt

CKPT_EPOCHS = {0, 10, 15, 20, 25, 29, 30, 35, 39}  # train_xe.py:240


def load_frozen_cls(opt: Opts, vocab):
    """Frozen sentence-sentiment classifier from its best checkpoint
    (train_xe.py:58-74)."""
    path = common.best_checkpoint(opt, "sent_senti_cls")
    print(f"====> loading checkpoint '{path}'")
    template = ss_cls.init_params(jax.random.PRNGKey(0), len(vocab),
                                  len(opt.sentiment_categories), opt.settings)
    params, _, meta = ckpt.load(path, template)
    ckpt.validate_metadata(meta, settings=opt.settings,
                           idx2word=vocab.idx2word,
                           sentiment_categories=opt.sentiment_categories,
                           dataset_name=opt.dataset_name,
                           corpus_type=opt.corpus_type)
    return params


def train(opt: Opts):
    rt = common.Runtime(opt)
    vocab = common.load_vocab(opt)
    ids = common.token_ids(vocab, opt.sentiment_categories)
    img_captions = common.load_json(
        common.dataset_path(opt, "img_captions.json"))
    img_det_concepts = common.load_json(
        common.dataset_path(opt, "img_det_concepts.json"))
    senti_captions = common.load_json(
        common.corpus_path(opt, "senti_captions.json"))

    params = cap.init_params(jax.random.PRNGKey(opt.seed), len(vocab),
                             len(opt.sentiment_categories), opt.settings)
    lr = opt.xe_lr
    tx = optim.make_optimizer(lr, opt.grad_clip)
    opt_state = tx.init(params)
    epoch0 = 0
    if opt.xe_resume:
        print(f"====> loading checkpoint '{opt.xe_resume}'")
        params, opt_state, meta = ckpt.load(opt.xe_resume, params, opt_state)
        ckpt.validate_metadata(meta, settings=opt.settings,
                               idx2word=vocab.idx2word,
                               sentiment_categories=opt.sentiment_categories,
                               dataset_name=opt.dataset_name,
                               corpus_type=opt.corpus_type)
        lr = meta.get("lr", lr)
        opt_state = optim.set_lr(opt_state, lr)
        epoch0 = meta["epoch"] + 1
        print(f"====> loaded checkpoint, epoch: {meta['epoch']}")

    cls_params = load_frozen_cls(opt, vocab)

    print("====> tokenizing artifacts")
    captions_id = common.tokenize_captions(img_captions, vocab)
    concepts_id = common.tokenize_concepts(img_det_concepts, vocab)
    scs_id = common.tokenize_senti_corpus(senti_captions, vocab,
                                          opt.sentiment_categories)

    fc_path, att_path = common.feature_paths(opt)
    fc_store = common.open_store(fc_path)
    att_store = common.open_store(att_path)
    bs = rt.round_bs(opt.xe_bs)
    train_data = common.caption_loader(fc_store, att_store,
                                       captions_id["train"], concepts_id,
                                       vocab, opt, bs, seed=opt.seed)
    val_data = common.caption_loader(fc_store, att_store, captions_id["val"],
                                     concepts_id, vocab, opt, bs,
                                     shuffle=False, drop_last=False)
    scs_data = CycleIterator(common.scs_loader(scs_id, vocab, opt,
                                               rt.round_bs(80),
                                               seed=opt.seed))
    test_fns = sorted(captions_id["test"])

    train_step, eval_step = steps.make_xe_steps(opt.settings, tx)

    @jax.jit
    def decode_step(params, fc, att):
        return inference.decode_xe(params, fc, att, settings=opt.settings,
                                   ids=ids, beam_size=opt.beam_size,
                                   max_seq_len=opt.max_seq_len)

    params = rt.place_captioner(rt.cast(params))
    rt.disable_pallas_for_sharded_decode()  # before decode_step traces
    cls_params = rt.replicate(rt.cast(cls_params))
    opt_state = rt.place_opt_state(opt_state, params, tx)

    ck_dir, result_dir = common.stage_dirs(opt, "xe")
    previous_loss = None
    for epoch in range(epoch0, opt.xe_epochs):
        print(f"--------------------epoch: {epoch}")
        ss_prob = 0.0
        if epoch > opt.scheduled_sampling_start >= 0:
            frac = ((epoch - opt.scheduled_sampling_start)
                    // opt.scheduled_sampling_increase_every)
            ss_prob = min(opt.scheduled_sampling_increase_prob * frac,
                          opt.scheduled_sampling_max_prob)
        print(f"ss_prob: {ss_prob}")

        agg, n = {}, 0
        for i, b in enumerate(device_prefetch(train_data, rt.put)):
            scs_b = rt.put(scs_data.next())
            params, opt_state, losses = train_step(
                params, opt_state, cls_params, b, scs_b,
                jax.random.fold_in(jax.random.PRNGKey(opt.seed),
                                   epoch * 1000000 + i),
                jnp.float32(ss_prob))
            for k, v in losses.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n += 1
        train_loss = {k: v / max(n, 1) for k, v in agg.items()}

        # val: aggregate masked SUMS across batches and divide once, so the
        # padded duplicate rows of the final eval batch contribute nothing
        # and the result is invariant to how the split is batched
        sums, cnts = {}, {}
        for i, b in enumerate(device_prefetch(val_data, rt.put)):
            s, c = eval_step(params, cls_params, b, jax.random.PRNGKey(i))
            for k in s:
                sums[k] = sums.get(k, 0.0) + float(s[k])
                cnts[k] = cnts.get(k, 0.0) + float(c[k])
        val_loss = {k: sums[k] / max(cnts[k], 1.0) for k in sums}
        val_loss["cap_loss"] = val_loss["xe_loss"] + val_loss["da_loss"]
        val_loss["all_loss"] = val_loss["cap_loss"]

        # whole-test-split beam dump (train_xe.py:219-232), batched decode
        results = []
        for s in range(0, len(test_fns), bs):
            chunk = test_fns[s:s + bs]
            pad = bs - len(chunk)
            fns = chunk + [chunk[-1]] * pad
            fc = fc_store.batch(fns).astype(np.float32)
            att = att_store.batch(fns).astype(np.float32)
            b = rt.put({"fc": fc, "att": att})
            seqs, _ = decode_step(params, b["fc"], b["att"])
            seqs = np.asarray(seqs)
            for i, fn in enumerate(chunk):
                cap_txt = vocab.decode_to_text(seqs[i, 0])
                results.append({"image_id": fn, "caption": cap_txt,
                                "ids": [int(t) for t in seqs[i, 0]]})
        common.dump_results(result_dir, str(epoch), results, vocab)

        if previous_loss is not None and \
                val_loss["all_loss"] > previous_loss:
            lr *= 0.5
            opt_state = optim.set_lr(opt_state, lr)
        previous_loss = val_loss["all_loss"]

        print(f"train_loss: {train_loss}, val_loss: {val_loss}")
        common.metrics_line(os.path.join(ck_dir, "metrics.jsonl"), {
            "epoch": epoch, "ss_prob": ss_prob, "lr": lr,
            **{f"train_{k}": v for k, v in train_loss.items()},
            **{f"val_{k}": v for k, v in val_loss.items()}})
        if epoch in CKPT_EPOCHS:
            ckpt.save(
                ckpt.checkpoint_name(ck_dir, epoch,
                                     train_loss["all_loss"],
                                     val_loss["all_loss"]),
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
