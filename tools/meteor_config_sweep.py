"""Quantify METEOR*'s default-config gap vs full Meteor 1.5
(VERDICT r4 next #5).

rewards/meteor.py implements every Meteor-1.5 stage, but in the default
environment two inputs are absent (non-redistributable): the official
``paraphrase-en`` table and the corpus-derived ``function.words`` list,
and WordNet may be missing too — so the shipped score runs exact+stem
with a stand-in closed-class word list and labels itself METEOR*. This
tool gives that caveat a MAGNITUDE: it sweeps the stage configuration
over two probes and records how many points each missing stage moves
the score. All stage data here is SYNTHETIC/seeded (clearly non-Meteor
data) — the numbers are sensitivities, not claims about the official
resources.

Probe A — the anchor pipeline's own decode dumps (an anchor tree built
by tools/build_anchor.py or tools/anchor_tpu.py, e.g.
``--workdir /tmp/isc_anchor_tpu_r5``): seeded synonym pairs + seeded
bigram->unigram paraphrases over the 16-word synthetic vocabulary.
Note the function-word stages are structurally INERT on this corpus:
its vocabulary shares no word with any English function-word list, and
a list derived from the corpus itself (derive_function_words, Meteor's
published >1e-3 relative-frequency rule) contains EVERY corpus word —
and a uniform weight cancels out of the weighted P/R ratios. That
degeneracy is itself a finding (recorded in the output).

Probe B — a committed English caption-like set (below) with real
function words, morphological variants, synonym pairs, and phrase
paraphrases, so every stage can actually fire: exact-only vs +stem vs
+synonym vs +paraphrase vs the function-word list {builtin, none}.

    python tools/meteor_config_sweep.py [--workdir TREE] [--out JSON]

Prints the delta table (paste target: DESIGN.md round-5 METEOR entry).
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from insenticap_model_tpu import text
from insenticap_model_tpu.rewards import meteor as M
from insenticap_model_tpu.synthetic import WORDS

# ---------------------------------------------------------------------------
# Probe B: English caption-like (hypothesis, [references]) pairs.
# Deterministic, caption-register, built to exercise each stage:
# function words, -s/-ing/-ed variants (stem), word synonyms, phrase
# paraphrases.
ENGLISH_PAIRS = [
    ("a man rides a bike down the street",
     ["a guy riding a bicycle along the road",
      "a man is riding his bike down a street"]),
    ("a group of people standing next to a bus",
     ["several people stand beside a bus",
      "a group of persons next to the bus"]),
    ("a happy child plays with a dog on the couch",
     ["a glad kid playing with a puppy on the sofa",
      "a happy child is playing with a dog on a couch"]),
    ("two cats sleeping on a large bed",
     ["two cats sleep on a big bed", "a pair of cats asleep on the bed"]),
    ("a woman holding an umbrella in the rain",
     ["a lady holds an umbrella in the rain",
      "a woman with an umbrella during the rain"]),
    ("a plate of food with vegetables and meat",
     ["a dish of food with veggies and meat",
      "a plate filled with vegetables and some meat"]),
    ("an old photo of a car parked near a house",
     ["an old picture of an automobile parked by a home",
      "an old photo shows a car near the house"]),
    ("a boy jumps over a small fence",
     ["a young boy jumping over a little fence",
      "the boy jumped over a small fence"]),
    ("a kitchen with a stove and a refrigerator",
     ["a kitchen that has a stove and a fridge",
      "the kitchen contains a stove and refrigerator"]),
    ("a train travels down the tracks in front of a station",
     ["a train traveling along the tracks before a station",
      "the train moves down the tracks at the station"]),
    ("a sad man sitting alone on a bench",
     ["an unhappy guy sits alone on the bench",
      "a sad man sat by himself on a bench"]),
    ("a beautiful bird flying over the water",
     ["a pretty bird flies above the water",
      "a beautiful bird in flight over water"]),
]

# Synonym pairs probe B's synthetic WordNet index declares (hyp-side
# word <-> ref-side word above; exact/stem do NOT already match these).
ENGLISH_SYNONYMS = [
    ("man", "guy"), ("bike", "bicycle"), ("street", "road"),
    ("happy", "glad"), ("child", "kid"), ("dog", "puppy"),
    ("couch", "sofa"), ("large", "big"), ("woman", "lady"),
    ("photo", "picture"), ("car", "automobile"), ("house", "home"),
    ("small", "little"), ("refrigerator", "fridge"), ("sad", "unhappy"),
    ("beautiful", "pretty"), ("over", "above"), ("food", "dish"),
]

# Phrase pairs for probe B's paraphrase table.
ENGLISH_PARAPHRASES = [
    ("next to", "beside"), ("in front of", "before"),
    ("a group of people", "several people"), ("down the street",
                                              "along the road"),
    ("rides a bike", "riding a bicycle"), ("in the rain",
                                           "during the rain"),
    ("vegetables", "veggies"), ("near", "by"),
    ("travels down", "traveling along"), ("alone", "by himself"),
    ("flying over", "in flight over"),
]


def _tok(s):
    return tuple(text.tokenize(s.strip().lower()))


def write_fake_wordnet(pairs, d):
    """A WNdb-format index.noun declaring each pair one shared synset —
    synthetic data for the synonym stage (WordNetSynonyms parses the
    real format: lemma pos synset_cnt p_cnt sense_cnt tagsense_cnt
    offsets...)."""
    with open(os.path.join(d, "index.noun"), "w") as f:
        for k, (a, b) in enumerate(pairs):
            for w in (a, b):
                f.write(f"{w} n 1 0 1 1 {k:08d}\n")
    return d


def write_paraphrases(pairs, path):
    with open(path, "w") as f:
        for a, b in pairs:
            f.write(f"{a} ||| {b}\n")
    return path


def load_anchor_pairs(workdir):
    """(hyp, refs) pairs from every decode dump of an anchor tree."""
    anno_path = os.path.join(workdir, "data/captions/coco",
                             "anno_captions.json")
    with open(anno_path) as f:
        anno = {fn: [_tok(s) for s in sents]
                for fn, sents in json.load(f).items()}
    pairs = []
    rdir = os.path.join(workdir, "result/rl/coco/part")
    for fn in sorted(os.listdir(rdir)):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(rdir, fn)) as f:
            blob = json.load(f)
        if not (isinstance(blob, list)
                and all(isinstance(r, dict) and "image_id" in r
                        for r in blob)):
            continue   # not a decode dump (e.g. a metrics table)
        for r in blob:
            if r["image_id"] in anno:
                pairs.append((_tok(r["caption"]), anno[r["image_id"]]))
    return pairs


def score(pairs, wordnet=None, function_words=M.FUNCTION_WORDS,
          paraphrases=None, stem=True):
    """Mean sentence score ×100 under one stage config. stem=False
    disables the Porter stage by scoring with identity 'stems'
    (exact-only — the one config the public API cannot express)."""
    orig = M._stem
    if not stem:
        M._stem = lambda w: w
    try:
        vals = [M.score_sentence(h, rs, wordnet=wordnet,
                                 function_words=function_words,
                                 paraphrases=paraphrases)
                for h, rs in pairs]
    finally:
        M._stem = orig
    return 100.0 * sum(vals) / max(len(vals), 1)


def sweep(pairs, wordnet, paraphrases, label):
    rows = collections.OrderedDict()
    rows["exact only"] = score(pairs, stem=False)
    base = score(pairs)
    rows["exact+stem (shipped METEOR* default)"] = base
    rows["+synonym (synthetic table)"] = score(pairs, wordnet=wordnet)
    rows["+paraphrase (synthetic table)"] = score(pairs,
                                                  paraphrases=paraphrases)
    rows["+synonym+paraphrase"] = score(pairs, wordnet=wordnet,
                                        paraphrases=paraphrases)
    rows["function words: none (no discount)"] = score(
        pairs, function_words=None)
    print(f"\n== {label} ({len(pairs)} hyp/ref pairs) ==")
    print(f"{'config':<42}{'METEOR*':>9}{'delta':>8}")
    for k, v in rows.items():
        print(f"{k:<42}{v:>9.2f}{v - base:>+8.2f}")
    return {k: round(v, 3) for k, v in rows.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="",
                    help="anchor pipeline tree for probe A (skipped "
                         "when absent)")
    ap.add_argument("--out", default="")
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)

    out = {"note": ("synthetic/seeded stage data — sensitivities, not "
                    "official-resource scores; see module docstring")}
    tmp = tempfile.mkdtemp(prefix="isc_meteor_sweep_")

    # Probe B: English caption-like set
    pairs_en = [(_tok(h), [_tok(r) for r in rs])
                for h, rs in ENGLISH_PAIRS]
    os.makedirs(os.path.join(tmp, "wn_en"), exist_ok=True)
    wn_en = M.WordNetSynonyms(write_fake_wordnet(
        ENGLISH_SYNONYMS, os.path.join(tmp, "wn_en")))
    para_en = M.ParaphraseTable(write_paraphrases(
        ENGLISH_PARAPHRASES, os.path.join(tmp, "para_en.txt")))
    out["english_probe"] = sweep(pairs_en, wn_en, para_en,
                                 "probe B: English caption set")

    # Probe A: anchor decode dumps with corpus-level synthetic tables
    if a.workdir and os.path.isdir(os.path.join(a.workdir, "result")):
        import numpy as np
        g = np.random.default_rng(a.seed)
        perm = g.permutation(len(WORDS))
        syn_pairs = [(WORDS[perm[2 * i]], WORDS[perm[2 * i + 1]])
                     for i in range(len(WORDS) // 2)]
        pairs_an = load_anchor_pairs(a.workdir)
        # most frequent reference bigrams -> seeded unigrams drawn from
        # the DECODED captions (so the table can actually fire: one side
        # in a reference, the other in a hypothesis)
        big = collections.Counter()
        hyp_words = collections.Counter()
        for h, refs in pairs_an:
            hyp_words.update(h)
            for r in refs:
                big.update(zip(r, r[1:]))
        hyp_vocab = [w for w, _ in hyp_words.most_common()] or list(WORDS)
        para_pairs = [(" ".join(bg),
                       hyp_vocab[int(g.integers(len(hyp_vocab)))])
                      for bg, _ in big.most_common(20)]
        os.makedirs(os.path.join(tmp, "wn_an"), exist_ok=True)
        wn_an = M.WordNetSynonyms(write_fake_wordnet(
            syn_pairs, os.path.join(tmp, "wn_an")))
        para_an = M.ParaphraseTable(write_paraphrases(
            para_pairs, os.path.join(tmp, "para_an.txt")))
        out["anchor_probe"] = sweep(pairs_an, wn_an, para_an,
                                    "probe A: anchor decode dumps")
        out["anchor_probe_tables"] = {
            "synonym_pairs": syn_pairs, "paraphrase_pairs": para_pairs}
        # degeneracy check: corpus-derived function words = whole vocab
        derived = M.derive_function_words(
            [r for _, refs in pairs_an for r in refs])
        all_words = {w for _, refs in pairs_an for r in refs for w in r}
        out["anchor_fw_degenerate"] = sorted(all_words) == sorted(
            w for w in derived if w in all_words) and bool(all_words)
        print(f"\nanchor-corpus derived function-word list covers the "
              f"whole vocabulary: {out['anchor_fw_degenerate']} "
              f"(uniform discount cancels out of weighted P/R — the "
              f"fw stage is inert on this corpus)")

    if a.out:
        with open(a.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"\n====> wrote {a.out}")


if __name__ == "__main__":
    main()
