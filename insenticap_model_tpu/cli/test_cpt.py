"""Single-image concept sanity check with wrong-rate printout (reference
test_cpt.py)."""
from __future__ import annotations

import os

import jax
import numpy as np

from ..config import Opts, Settings
from ..models import concept_detector as cpt_det
from ..training import checkpoint as ckpt
from . import common
from .opts import parse_opt


def run(opt: Opts):
    print(f"====> loading checkpoint '{opt.test_model}'")
    meta = ckpt.load_metadata(opt.test_model)
    idx2concept = meta["idx2concept"]
    dataset_name = meta.get("dataset_name", opt.dataset_name)
    settings = Settings.from_dict(meta["settings"])
    template = cpt_det.init_params(jax.random.PRNGKey(0), len(idx2concept),
                                   settings)
    params, _, _ = ckpt.load(opt.test_model, template)
    print(f"====> loaded checkpoint, epoch: {meta['epoch']}, "
          f"dataset_name: {dataset_name}")

    img_concepts = common.load_json(
        os.path.join(opt.captions_dir, dataset_name, "img_concepts.json"))
    fc = common.open_store(common.sniff_store_path(os.path.join(
        opt.feats_dir, dataset_name, f"{dataset_name}_fc.h5")))
    test_img = opt.image_file or sorted(img_concepts["test"])[0]
    feat = fc.get(test_img)[None].astype(np.float32)
    _, top_idx, top_scores = cpt_det.sample(params, feat, opt.num_concepts)
    concepts = [idx2concept[k] for k in np.asarray(top_idx)[0]]
    scores = np.asarray(top_scores)[0]

    print("test_img: ", test_img)
    print("concepts: ", concepts)
    print("scores: ", scores)
    print("ground truth: ", img_concepts["test"][test_img])
    wrong = [c for c in concepts if c not in img_concepts["test"][test_img]]
    print("\nwrong rate:", len(wrong) / len(concepts))
    print("wrong concepts:", wrong)


def main(argv=None):
    run(parse_opt(argv))


if __name__ == "__main__":
    main()
