"""SCST RL fine-tuning (reference train_rl.py + models/decoder.py).

The reference's per-batch loop round-trips both rollouts to host for CPU
CIDEr scoring (SURVEY.md §3.2); here the whole inner loop — sentiment
detection, multinomial + greedy rollouts, on-device CIDEr-D and cls rewards,
and the xe/da/seq2seq auxiliary losses — is one jitted XLA program
(steps.make_rl_steps). Loop structure, bootstrap, 500-batch epoch cap
(decoder.py:65), and the per-sentiment test dumps mirror the reference.

Divergence-with-note (SURVEY.md §8.6): epoch losses are averaged over the
actual batch count, not the reference's accidental division by the tuple
length 2.
"""
from __future__ import annotations

import os
import random
from collections import defaultdict

import jax
import numpy as np

from ..config import Opts
from ..models import captioner as cap
from ..models import sent_senti_cls as ss_cls
from ..models import sentiment_detector as senti_det
from ..ops import ciderd_device
from ..rewards.ciderd import build_scorer
from ..training import checkpoint as ckpt
from ..training import optim, steps
from ..utils import dtypes
from .. import inference
from ..data.loaders import CycleIterator, device_prefetch
from . import common
from .opts import parse_opt

MAX_BATCHES_PER_EPOCH = 500  # reference decoder.py:65


def _load_sub(path, template, opt, vocab=None, check_ds=True):
    print(f"====> loading checkpoint '{path}'")
    params, _, meta = ckpt.load(path, template)
    ckpt.validate_metadata(
        meta, settings=opt.settings,
        idx2word=vocab.idx2word if vocab else None,
        sentiment_categories=opt.sentiment_categories,
        dataset_name=opt.dataset_name if check_ds else None,
        corpus_type=opt.corpus_type if check_ds else None)
    return params


def train(opt: Opts):
    rt = common.Runtime(opt)
    vocab = common.load_vocab(opt)
    ids = common.token_ids(vocab, opt.sentiment_categories)
    label2idx = {w: i for i, w in enumerate(opt.sentiment_categories)}

    img_captions = common.load_json(
        common.dataset_path(opt, "img_captions.json"))
    img_det_concepts = common.load_json(
        common.dataset_path(opt, "img_det_concepts.json"))
    img_det_sentiments = common.load_json(
        common.corpus_path(opt, "img_det_sentiments.json"))
    img_senti_labels = common.load_json(opt.img_senti_labels)
    senti_captions = common.load_json(
        common.corpus_path(opt, "senti_captions.json"))

    cap_template = cap.init_params(jax.random.PRNGKey(opt.seed), len(vocab),
                                   len(opt.sentiment_categories),
                                   opt.settings)
    senti_template = senti_det.module_for(opt.settings).init_params(
        jax.random.PRNGKey(1), len(opt.sentiment_categories), opt.settings)
    cls_template = ss_cls.init_params(jax.random.PRNGKey(2), len(vocab),
                                      len(opt.sentiment_categories),
                                      opt.settings)

    epoch0 = 0
    if opt.rl_resume:
        # composite Detector checkpoint (train_rl.py:41-57)
        print(f"====> loading checkpoint '{opt.rl_resume}'")
        composite = {"captioner": cap_template,
                     "senti_detector": senti_template,
                     "sent_senti_cls": cls_template}
        composite, _, meta = ckpt.load(opt.rl_resume, composite)
        ckpt.validate_metadata(meta, settings=opt.settings,
                               idx2word=vocab.idx2word,
                               sentiment_categories=opt.sentiment_categories,
                               dataset_name=opt.dataset_name,
                               corpus_type=opt.corpus_type)
        if meta.get("max_seq_len") != opt.max_seq_len:
            raise ckpt.CheckpointError("max_seq_len mismatch")
        params = composite["captioner"]
        senti_params = composite["senti_detector"]
        cls_params = composite["sent_senti_cls"]
        epoch0 = meta["epoch"] + 1
    else:
        # multi-source bootstrap (train_rl.py:58-98)
        params = _load_sub(common.best_checkpoint(opt, "xe"), cap_template,
                           opt, vocab)
        if opt.rl_senti_resume:
            senti_params = _load_sub(opt.rl_senti_resume, senti_template,
                                     opt, check_ds=False)
        else:
            senti_params = senti_template
        cls_params = _load_sub(common.best_checkpoint(opt, "sent_senti_cls"),
                               cls_template, opt, vocab)

    print("====> tokenizing artifacts")
    captions_id = common.tokenize_captions(img_captions, vocab)
    concepts_id = common.tokenize_concepts(img_det_concepts, vocab)
    sentiments_id = common.tokenize_sentiments(img_det_sentiments, vocab)
    scs_id = common.tokenize_senti_corpus(senti_captions, vocab,
                                          opt.sentiment_categories)
    random.Random(opt.seed).shuffle(scs_id)

    print("====> building CIDEr-D tables")
    scorer = build_scorer(captions_id, vocab.sos_id, vocab.eos_id)
    reward_gts = {**captions_id["train"], **captions_id["val"]}
    image_order = list(reward_gts.keys())
    tables, fn2row = ciderd_device.build_tables(
        scorer, reward_gts, image_order, opt.max_seq_len, vocab.sos_id,
        vocab.eos_id)

    fc_path, att_path = common.feature_paths(opt)
    fc_store = common.open_store(fc_path)
    att_store = common.open_store(att_path)
    senti_base = os.path.join(opt.feats_dir, "sentiment")
    senti_fc_store = common.open_store(common.sniff_store_path(
        os.path.join(senti_base, "feats_fc.h5")))
    senti_att_store = common.open_store(common.sniff_store_path(
        os.path.join(senti_base, "feats_att.h5")))

    bs = rt.round_bs(opt.rl_bs)
    fact_train = common.rl_fact_loader(fc_store, att_store,
                                       captions_id["train"], concepts_id,
                                       sentiments_id, vocab, opt, bs,
                                       fn2row=fn2row, seed=opt.seed)
    fact_val = common.rl_fact_loader(fc_store, att_store, captions_id["val"],
                                     concepts_id, sentiments_id, vocab, opt,
                                     bs, fn2row=fn2row, shuffle=False,
                                     drop_last=False)
    senti_loaders = {split: common.rl_senti_loader(
        senti_fc_store, senti_att_store, img_senti_labels[split],
        concepts_id, sentiments_id, label2idx, vocab, opt, bs,
        shuffle=(split == "train"), drop_last=(split == "train"),
        seed=opt.seed) for split in ("train", "val", "test")}
    test_fns = sorted(captions_id["test"])
    scs_data = CycleIterator(common.scs_loader(scs_id, vocab, opt,
                                               rt.round_bs(80),
                                               seed=opt.seed))

    # optional LM reward (default off; the reference keeps this wired but
    # disabled, train_rl.py:212-216) — per-sentiment id-form ARPA LMs
    # scored on device inside the RL jit region
    lm_tables = None
    if opt.rl_lm_flag > 0.0:
        from ..ops import lm_device
        lm_dir = os.path.join(opt.captions_dir, opt.dataset_name,
                              opt.corpus_type, "lm")
        paths = [os.path.join(lm_dir, f"{senti}_id.sri")
                 for senti in opt.sentiment_categories]
        for p in paths:
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"--rl_lm_flag set but LM missing: {p} (run the "
                    "preprocess lm stage)")
        lm_tables = lm_device.build_lm_tables(paths, len(vocab))

    lr = opt.rl_lrs.get("cap_lr", 4e-5)
    tx = optim.make_optimizer(lr, opt.grad_clip)
    opt_state = tx.init(params)
    rl = steps.make_rl_steps(opt.settings, tx, ids, opt.max_seq_len, tables,
                             lm_tables=lm_tables, lm_flag=opt.rl_lm_flag)

    serving = inference.make_serving_fn(opt.settings, ids,
                                        beam_size=opt.beam_size,
                                        max_seq_len=opt.max_seq_len)

    params = rt.place_captioner(rt.cast(params))
    rt.disable_pallas_for_sharded_decode()  # before serving fns trace
    # Frozen-detector precision (config.rl_detector_dtype): the detector
    # is label-only inside the RL step and its sample runs outside the
    # differentiated closure, so bf16 staging engages the serving-grade
    # pallas Winograd stack without touching training numerics. Default
    # f32 per the measured chip A/B (-1.3% e2e for bf16 at rl_bs=40 —
    # tools/ab_rl_detector.py). Staged from the PRE-rt.cast params and
    # cast explicitly in BOTH directions so the knob is honored
    # independently of --compute_dtype (under compute_dtype=bfloat16 the
    # rt.cast copy is bf16; the measured f32 default must still win out).
    # Checkpoints and the serving test dumps keep the rt-staged
    # senti_params either way.
    frozen_det = rt.replicate(
        dtypes.cast_bf16(senti_params) if opt.rl_detector_dtype == "bf16"
        else dtypes.cast_f32(senti_params))
    senti_params = rt.replicate(rt.cast(senti_params))
    cls_params = rt.replicate(rt.cast(cls_params))
    opt_state = rt.place_opt_state(opt_state, params, tx)
    frozen = steps.RLModels(senti_detector=frozen_det,
                            sent_senti_cls=cls_params)

    PHASES = {"senti": 0, "fact": 1, "val": 2}

    def run_split(loader, data_type, training, epoch, use_scs, pass_idx=0):
        nonlocal params, opt_state
        import itertools
        agg, n = defaultdict(float), 0
        sums, cnts = defaultdict(float), defaultdict(float)
        # rollout keys fold in (epoch, phase, pass, batch) so repeated
        # passes (rl_senti_times/rl_fact_times > 1) and the senti vs fact
        # phases never reuse sampling keys — the reference advances its
        # global RNG continuously, so correlated rollouts would diverge
        # from its behavior
        base = jax.random.PRNGKey(opt.seed + 17)
        phase = PHASES[data_type if training else "val"]
        for v in (epoch, phase, pass_idx):
            base = jax.random.fold_in(base, v)
        # cap BEFORE collate/device_put so excess batches are never staged
        capped = itertools.islice(iter(loader), MAX_BATCHES_PER_EPOCH)
        for i, b in enumerate(device_prefetch(capped, rt.put)):
            key = jax.random.fold_in(base, i)
            if training:
                scs_b = rt.put(scs_data.next()) if use_scs else None
                params, opt_state, losses = rl[(data_type, True)](
                    params, opt_state, frozen, b, scs_b, key)
                for k, v in losses.items():
                    agg[k] += float(v)
                n += 1
            else:
                # eval steps return masked (sums, counts); dividing the
                # aggregates makes val losses invariant to batch padding
                s, c = rl[(data_type, False)](params, frozen, b, key)
                for k in s:
                    sums[k] += float(s[k])
                    cnts[k] += float(c[k])
        if training:
            return {k: v / max(n, 1) for k, v in agg.items()}
        return {k: sums[k] / max(cnts[k], 1.0) for k in sums}

    ck_dir, result_dir = common.stage_dirs(opt, "rl")
    for epoch in range(epoch0, opt.rl_epochs):
        print(f"--------------------epoch: {epoch}")
        for i in range(opt.rl_senti_times):
            print(f"----------rl_senti_times: {i}")
            loss = run_split(senti_loaders["train"], "senti", True, epoch,
                             True, pass_idx=i)
            print(f"senti_train_loss: {loss}")
        for i in range(opt.rl_fact_times):
            print(f"----------rl_fact_times: {i}")
            loss = run_split(fact_train, "fact", True, epoch, True,
                             pass_idx=i)
            print(f"fact_train_loss: {loss}")

        print("----------val")
        val_loss = run_split(fact_val, "fact", False, epoch, False)
        print(f"fact_val_loss: {val_loss}")

        # test: both splits through the serving path, grouped by detected
        # sentiment (train_rl.py:252-309)
        sparams = inference.ServingParams(captioner=params,
                                          senti_detector=senti_params)
        results, det_sentis, wrong_rate = run_test_dump(
            rt, opt, vocab, serving, sparams, test_fns, bs, fc_store,
            att_store, sentiments_id, senti_loaders["test"])

        _dump_rl_results(result_dir, epoch, results, det_sentis, wrong_rate,
                         vocab)
        common.metrics_line(os.path.join(ck_dir, "metrics.jsonl"), {
            "epoch": epoch, "det_sentis_wrong_rate": wrong_rate,
            **{f"val_{k}": v for k, v in val_loss.items()}})

        ckpt.save(os.path.join(
            ck_dir, f"model_{epoch}.ckpt"),
            {"captioner": params, "senti_detector": senti_params,
             "sent_senti_cls": cls_params}, opt_state, {
                "epoch": epoch, "settings": opt.settings.to_dict(),
                "idx2word": vocab.idx2word,
                "max_seq_len": opt.max_seq_len,
                "sentiment_categories": list(opt.sentiment_categories),
                "dataset_name": opt.dataset_name,
                "corpus_type": opt.corpus_type})


def run_test_dump(rt, opt, vocab, serving, sparams, test_fns, bs, fc_store,
                  att_store, sentiments_id, senti_test_loader):
    """Both test splits through the serving path, grouped by detected
    sentiment, tracking the detected-sentiment wrong-rate on the senti
    split (reference train_rl.py:252-281). Shared by the per-epoch RL
    test dump and the paper-table reproduction harness
    (cli/reproduce_table.py). Returns (results, det_sentis, wrong_rate)
    in the shapes _dump_rl_results expects."""
    results = {"fact": defaultdict(list), "senti": defaultdict(list)}
    det_sentis = defaultdict(dict)
    senti_n = senti_wrong = 0
    for data_type in ("fact", "senti"):
        if data_type == "fact":
            batches = _fact_test_batches(test_fns, bs, fc_store,
                                         att_store, sentiments_id,
                                         vocab, opt)
        else:
            batches = iter(senti_test_loader)
        for batch in batches:
            b = rt.put({k: v for k, v in batch.items()
                        if k in ("fc", "att", "sentis")})
            seqs, _, det_labels = serving(sparams, b["fc"], b["att"],
                                          b["sentis"])
            seqs = np.asarray(seqs)
            det_labels = np.asarray(det_labels)
            valid = batch.get("valid", len(batch["fns"]))
            for i, fn in enumerate(batch["fns"][:valid]):
                senti_name = opt.sentiment_categories[det_labels[i]]
                txt = vocab.decode_to_text(seqs[i, 0])
                results[data_type][senti_name].append(
                    {"image_id": fn, "caption": txt})
                det_sentis[data_type][fn] = senti_name
                if data_type == "senti":
                    senti_n += 1
                    if det_labels[i] != batch["senti_labels"][i]:
                        senti_wrong += 1
    return results, det_sentis, senti_wrong / max(senti_n, 1)


def _fact_test_batches(test_fns, bs, fc_store, att_store, sentiments_id,
                       vocab, opt):
    from ..data import collate
    for s in range(0, len(test_fns), bs):
        chunk = test_fns[s:s + bs]
        valid = len(chunk)
        fns = chunk + [chunk[-1]] * (bs - valid)
        yield {
            "fns": fns, "valid": valid,
            "fc": fc_store.batch(fns),
            "att": att_store.batch(fns),
            "sentis": np.stack([collate.pad_list(
                sentiments_id[fn], opt.num_sentiments, vocab.pad_id)
                for fn in fns]),
        }


def _dump_rl_results(result_dir, epoch, results, det_sentis, wrong_rate,
                     vocab):
    """Per-sentiment result files in the reference's exact formats
    (train_rl.py:283-309): .json, id-form .txt (eval_cls_rnn/eval_ppl input
    contract) and word-form _w.txt."""
    import json
    for data_type in results:
        for senti, ress in results[data_type].items():
            with open(os.path.join(
                    result_dir,
                    f"result_{epoch}_{senti}_{data_type}.json"), "w") as f:
                json.dump(ress, f)
            id_txt, w_txt = "", ""
            for res in ress:
                caption = res["caption"]
                w_txt += caption + "\n"
                id_cap = [str(vocab.word2idx[w]) for w in caption.split()]
                id_txt += " ".join(id_cap + [str(vocab.eos_id)]) + "\n"
            with open(os.path.join(
                    result_dir,
                    f"result_{epoch}_{senti}_{data_type}.txt"), "w") as f:
                f.write(id_txt)
            with open(os.path.join(
                    result_dir,
                    f"result_{epoch}_{senti}_{data_type}_w.txt"), "w") as f:
                f.write(w_txt)
        wr = 0 if data_type == "fact" else wrong_rate
        with open(os.path.join(
                result_dir,
                f"result_{epoch}_sentis_{wr}_{data_type}.json"), "w") as f:
            json.dump(det_sentis[data_type], f)


def main(argv=None):
    common.run_with_post_mortem(train, parse_opt(argv))


if __name__ == "__main__":
    main()
