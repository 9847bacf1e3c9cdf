"""Batch concept inference producing img_det_concepts.json (reference
detect_concepts.py): top-num_concepts concept words for every image in both
the dataset and sentiment feature stores, via one jitted sample pass."""
from __future__ import annotations

import json
import os

import jax
import numpy as np

from ..config import Opts
from ..models import concept_detector as cpt_det
from ..training import checkpoint as ckpt
from . import common
from .opts import parse_opt

BATCH = 100  # reference detect_concepts.py:36


def run(opt: Opts):
    print(f"====> loading checkpoint '{opt.eval_model}'")
    meta = ckpt.load_metadata(opt.eval_model)
    idx2concept = meta["idx2concept"]
    dataset_name = meta.get("dataset_name", opt.dataset_name)
    from ..config import Settings
    settings = Settings.from_dict(meta["settings"])
    template = cpt_det.init_params(jax.random.PRNGKey(0), len(idx2concept),
                                   settings)
    params, _, _ = ckpt.load(opt.eval_model, template)
    print(f"====> loaded checkpoint, epoch: {meta['epoch']}, "
          f"dataset_name: {dataset_name}")

    @jax.jit
    def sample(fc):
        return cpt_det.sample(params, fc, opt.num_concepts)

    fact_fc = common.open_store(common.sniff_store_path(os.path.join(
        opt.feats_dir, dataset_name, f"{dataset_name}_fc.h5")))
    senti_fc = common.open_store(common.sniff_store_path(os.path.join(
        opt.feats_dir, "sentiment", "feats_fc.h5")))

    predict = {}
    for store in (fact_fc, senti_fc):
        fns = store.keys()
        for s in range(0, len(fns), BATCH):
            chunk = fns[s:s + BATCH]
            pad = BATCH - len(chunk)
            feats = store.batch(chunk + [chunk[-1]] * pad)
            _, top_idx, _ = sample(feats.astype(np.float32))
            top_idx = np.asarray(top_idx)
            for j, fn in enumerate(chunk):
                predict[fn] = [idx2concept[k] for k in top_idx[j]]

    out = os.path.join(opt.captions_dir, dataset_name,
                       "img_det_concepts.json")
    with open(out, "w") as f:
        json.dump(predict, f)
    print(f"====> wrote {len(predict)} entries to {out}")


def main(argv=None):
    run(parse_opt(argv))


if __name__ == "__main__":
    main()
