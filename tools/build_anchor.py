"""Quality-metrics regression anchor (VERDICT r3 next #5).

Real COCO/SentiCap data is absent from this environment, so paper-table
parity (/root/reference/README.md:29-36) cannot be demonstrated
end-to-end. What CAN be regression-guarded is the full 7-stage pipeline
on the committed synthetic corpus (insenticap_model_tpu/synthetic.py):
this tool runs every stage to (tiny-scale) convergence, scores the
result with the paper-table harness (cli/reproduce_table), and writes
``ANCHOR.json`` — the metric table plus comparison tolerances. The slow
test ``tests/test_metrics_anchor.py`` re-runs the same pipeline and
asserts the table still matches, so any metric-affecting regression
(model math, data layer, beam search, reward/metric scorers) is caught
without COCO; the paper-parity run itself stays one data-drop away.

    python tools/build_anchor.py [--out ANCHOR.json]

Determinism: the corpus is a pure function of the seed, every trainer
takes Opts(seed=0), and decoding is beam search — on one platform the
rebuild is bit-identical; tolerances absorb cross-platform float drift.
"""
from __future__ import annotations

import argparse
import contextlib
import glob
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# pipeline scale: enough epochs that the tiny models converge (losses
# plateau, metrics stabilize) while a full anchor rebuild stays in
# CI-feasible single-digit minutes on CPU. senti needs the most: its
# train split is 8 images (epoch = 2 steps) and the detector must
# clear the 0.7 neutral threshold on TEST images for the dump to carry
# all three sentiments (measured: test acc 1.0 at 50 epochs)
EPOCHS = {"concept": 5, "senti": 50, "xe": 8, "rl": 2}

# |rebuilt - anchored| bounds per metric family. Same-platform rebuilds
# are bit-identical (seeded corpus + seeded trainers + beam decode);
# these absorb cross-platform/XLA-version float drift flipping a beam
# tie or one classification.
TOLERANCES = {
    "quality_abs": 5.0,      # Bleu-*/METEOR*/CIDEr-D, 0-100 scale
    "ppl_rel": 0.25,         # per-sentiment trigram perplexities
    "cls_abs": 0.2,          # cls accuracy, 0-1 scale
    "wrong_rate_abs": 0.2,   # det_sentis_wrong_rate, 0-1 scale
}


@contextlib.contextmanager
def _chdir(d):
    cwd = os.getcwd()
    os.chdir(d)
    try:
        yield
    finally:
        os.chdir(cwd)


def _epoch_of(path):
    return int(os.path.basename(path).split("_")[1].split(".")[0])


def _last(pattern):
    ck = glob.glob(pattern)
    assert ck, f"no checkpoints match {pattern}"
    return sorted(ck, key=_epoch_of)[-1]


def _promote_best(stage_dir):
    shutil.copy(_last(os.path.join(stage_dir, "model_*.ckpt")),
                os.path.join(stage_dir, "model-best.ckpt"))


# anchor-scale architecture (tiny dims: pipeline rebuild stays minutes)
ANCHOR_SETTINGS = dict(word_emb_dim=16, fc_feat_dim=32, att_feat_dim=32,
                       feat_emb_dim=16, rnn_hid_dim=16, att_hid_dim=16,
                       concept_mid_dim=24)


def anchor_opts(seed: int = 0, **kw):
    """The Opts every anchor stage runs with (one definition so
    tools/anchor_tpu.py rescoring uses the exact pipeline config)."""
    from insenticap_model_tpu.config import Opts, Settings
    return Opts(settings=Settings(**ANCHOR_SETTINGS), num_concepts=3,
                max_seq_len=8, seed=seed, **kw)


def score_checkpoint(root: str, seed: int = 0, tag: str = "anchor",
                     out: str = "result/anchor_table.json", **opt_kw) -> dict:
    """Stage 7 alone: run the paper-table harness on the last RL
    checkpoint of an existing pipeline tree (a prior run_pipeline
    workdir). opt_kw lets callers flip serving config — e.g.
    compute_dtype='bfloat16' for the TPU serving-policy table."""
    from insenticap_model_tpu.cli import reproduce_table
    with _chdir(root):
        return reproduce_table.reproduce(
            anchor_opts(seed=seed, rl_bs=6, beam_size=2,
                        img_senti_labels="data/captions/"
                                         "img_senti_labels.json", **opt_kw),
            _last("checkpoint/rl/coco/part/model_*.ckpt"),
            tag=tag,
            anno_file="data/captions/coco/anno_captions.json",
            out=out)


def run_pipeline(root: str, seed: int = 0, epochs=EPOCHS) -> dict:
    """Fabricate the synthetic tree under `root`, run all 7 stages, and
    return the reproduce_table metric table (the anchor payload).
    Mirrors tests/test_cli_stages.py's stage sequence a→g."""
    from insenticap_model_tpu import preprocessing as pp
    from insenticap_model_tpu import synthetic
    from insenticap_model_tpu.cli import (detect_concepts,
                                          train_cpt, train_rl, train_senti,
                                          train_sent_senti_cls_rnn as tcls,
                                          train_xe)
    from insenticap_model_tpu.config import Settings

    settings = Settings(**ANCHOR_SETTINGS)

    def opts(**kw):
        return anchor_opts(seed=seed, **kw)

    os.makedirs(root, exist_ok=True)
    synthetic.build_tree(root, settings, seed=seed)
    with _chdir(root):
        # 1. concept detector + batch detection
        train_cpt.train(opts(concept_epochs=epochs["concept"],
                             concept_bs=8))
        detect_concepts.run(opts(
            eval_model=_last("checkpoint/concept/coco/model_*.ckpt")))
        # 2. image sentiment detector
        train_senti.train(opts(
            senti_epochs=epochs["senti"], senti_bs=4,
            img_senti_labels="data/captions/img_senti_labels.json"))
        senti_ck = _last("checkpoint/sentiment/model_*.ckpt")
        # 3. sentence sentiment classifier (reference-fixed 30 epochs)
        tcls.train(opts())
        _promote_best("checkpoint/sent_senti_cls/coco/part")
        # 4. XE captioner
        train_xe.train(opts(xe_epochs=epochs["xe"], xe_bs=6, beam_size=2))
        _promote_best("checkpoint/xe/coco/part")
        # 5. RL stage artifacts the real pipeline gets from preprocessing
        det = json.load(open("data/captions/coco/img_det_concepts.json"))
        with open("data/captions/coco/part/img_det_sentiments.json",
                  "w") as f:
            json.dump({fn: ["happy", "sad"] for fn in det}, f)
        os.makedirs("data/corpus/part", exist_ok=True)
        with open("data/corpus/part/sentiment_words.json", "w") as f:
            json.dump({"positive": {"happy": 1.0},
                       "negative": {"sad": 1.0}}, f)
        train_rl.train(opts(
            rl_epochs=epochs["rl"], rl_bs=6, beam_size=2,
            rl_senti_resume=senti_ck, rl_senti_times=1,
            img_senti_labels="data/captions/img_senti_labels.json"))
        # 6. scoring inputs: word-form ground truth + per-sentiment LMs
        img_captions = json.load(
            open("data/captions/coco/img_captions.json"))
        anno = {fn: [" ".join(c) for c in caps]
                for split in img_captions
                for fn, caps in img_captions[split].items()}
        # senti test images need references too, or the senti-split
        # quality rows come back empty (the real pipeline gets these
        # from SentiCap ground truth)
        import numpy as np
        ga = np.random.default_rng(seed + 1)
        labels = json.load(open("data/captions/img_senti_labels.json"))
        for fn, _ in labels["test"]:
            anno[fn] = [" ".join(
                synthetic.WORDS[int(j)]
                for j in ga.integers(0, len(synthetic.WORDS), 5))
                for _ in range(3)]
        with open("data/captions/coco/anno_captions.json", "w") as f:
            json.dump(anno, f)
        pp.get_lm_sents("./data/captions", ["coco"], "part")
    # 7. paper-table harness on the last RL checkpoint
    return score_checkpoint(root, seed=seed)


def compare_tables(anchored: dict, rebuilt: dict, tol=None) -> list:
    """Return a list of human-readable violations (empty = within
    tolerance). Shared by the guarding test so the comparison semantics
    are defined in exactly one place."""
    tol = tol or TOLERANCES
    bad = []

    def num(x):
        return isinstance(x, (int, float)) and not isinstance(x, bool)

    a_wr, r_wr = (anchored["det_sentis_wrong_rate"],
                  rebuilt["det_sentis_wrong_rate"])
    if abs(a_wr - r_wr) > tol["wrong_rate_abs"]:
        bad.append(f"det_sentis_wrong_rate {r_wr} vs anchored {a_wr}")
    for split in anchored["splits"]:
        a_s = anchored["splits"][split]
        r_s = rebuilt["splits"].get(split, {})
        for senti, row in a_s["quality"].items():
            for m, v in row.items():
                if m == "n" or not num(v):
                    continue
                rv = r_s.get("quality", {}).get(senti, {}).get(m)
                if rv is None or abs(rv - v) > tol["quality_abs"]:
                    bad.append(f"{split}/{senti}/{m}: {rv} vs anchored "
                               f"{v} (±{tol['quality_abs']})")
        for section, bound, rel in (("ppl", tol["ppl_rel"], True),
                                    ("cls", tol["cls_abs"], False)):
            a_v = a_s.get(section)
            if not a_v:
                continue
            r_v = r_s.get(section) or {}
            for k, v in a_v.items():
                if not num(v):
                    continue
                rv = r_v.get(k)
                lim = bound * abs(v) if rel else bound
                if rv is None or abs(rv - v) > lim:
                    bad.append(f"{split}/{section}/{k}: {rv} vs anchored "
                               f"{v} (±{lim:.3g})")
    return bad


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "ANCHOR.json"))
    ap.add_argument("--workdir", default="",
                    help="keep the pipeline tree here (default: temp)")
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)

    # ppl needs the native isclm (tests/conftest.py builds it the same way)
    subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True)

    import tempfile
    root = a.workdir or tempfile.mkdtemp(prefix="isc_anchor_")
    table = run_pipeline(root, seed=a.seed)
    anchor = {"seed": a.seed, "epochs": EPOCHS, "tolerances": TOLERANCES,
              "corpus": "insenticap_model_tpu/synthetic.py",
              "table": table}
    with open(a.out, "w") as f:
        json.dump(anchor, f, indent=1, sort_keys=True)
    print(f"====> wrote {a.out} (pipeline tree: {root})")


if __name__ == "__main__":
    main()
