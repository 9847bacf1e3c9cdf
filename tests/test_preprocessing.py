"""Offline-pipeline tests: tokenizer/tagger, corpus mining, vocabularies,
LM training+scoring through the native isclm tool, native feature store."""
import json
import os
import subprocess

import numpy as np
import pytest

from insenticap_model_tpu import preprocessing as pp
from insenticap_model_tpu import text

NATIVE = os.path.join(os.path.dirname(__file__), "..", "native", "build")


def test_tokenize_treebank():
    toks = text.tokenize("A man, who runs quickly!")
    assert "," in toks and "A" in toks and "runs" in toks


def test_rule_tagger_classes():
    tagged = dict(text.pos_tag(
        ["the", "happy", "dog", "runs", ",", "quickly", "beautiful"]))
    assert tagged["the"] == "DET"
    assert tagged["happy"] == "ADJ"
    assert tagged["dog"] == "NOUN"
    assert tagged["runs"] == "VERB"
    assert tagged[","] == "."
    assert tagged["quickly"] == "ADV"
    assert tagged["beautiful"] == "ADJ"


@pytest.fixture()
def corpus_tree(tmp_path):
    """dataset_<nm>.json + senti_corpus.json in the reference schemas."""
    ds_dir = tmp_path / "caption_datasets"
    ds_dir.mkdir()
    g = np.random.default_rng(0)
    nouns = ["man", "dog", "cat", "tree", "park"]
    verbs = ["runs", "sits", "walks"]
    adjs_pos = ["happy", "beautiful", "lovely"]
    adjs_neg = ["ugly", "terrible", "sad"]

    def sent(words):
        return {"raw": " ".join(words) + "."}

    images = []
    for split, n in (("train", 8), ("restval", 2), ("val", 3), ("test", 3)):
        for i in range(n):
            w1, w2 = nouns[int(g.integers(5))], verbs[int(g.integers(3))]
            images.append({
                "filename": f"{split}_{i}.jpg", "split": split,
                "sentences": [sent(["the", w1, w2, "in", "the", "park"]),
                              sent(["a", w1, w2])]})
    (ds_dir / "dataset_coco.json").write_text(json.dumps({"images": images}))

    corpus = {"positive": [], "negative": []}
    for i in range(30):
        a = adjs_pos[i % 3]
        n1 = nouns[i % 5]
        corpus["positive"].append(f"the {a} {n1} runs.")
        corpus["negative"].append(
            f"a {adjs_neg[i % 3]} {nouns[(i+1) % 5]} sits.")
    (tmp_path / "corpus" / "part").mkdir(parents=True)
    (tmp_path / "corpus" / "part" / "senti_corpus.json").write_text(
        json.dumps(corpus))
    return tmp_path


def test_full_corpus_pipeline(corpus_tree):
    t = corpus_tree
    captions_dir = str(t / "captions")
    corpus_dir = str(t / "corpus")

    pp.process_caption_datasets(str(t / "caption_datasets"), captions_dir,
                                ["coco"])
    caps = json.load(open(t / "captions/coco/img_captions.json"))
    assert set(caps) == {"train", "val", "test"}
    assert len(caps["train"]) == 10  # restval folds into train
    # punctuation stripped
    assert all("." not in w for c in caps["train"].values()
               for cap in c for w in cap)
    concepts = json.load(open(t / "captions/coco/img_concepts.json"))
    some = next(iter(concepts["train"].values()))
    assert any(w in ("man", "dog", "cat", "tree", "park", "runs", "sits",
                     "walks") for w in some)

    pp.process_senti_corpus(corpus_dir, "part")
    sw = json.load(open(t / "corpus/part/sentiment_words.json"))
    assert set(sw) == {"positive", "negative"}
    assert "happy" in sw["positive"] and "ugly" in sw["negative"]
    # disjoint after removal pass
    assert not set(sw["positive"]) & set(sw["negative"])
    det = json.load(open(t / "corpus/part/sentiment_detector.json"))
    assert det  # noun -> [(senti word, weight)]
    for noun, entries in det.items():
        assert all(isinstance(w, str) and s > 0 for w, s in entries)

    pp.build_idx2concept(captions_dir, ["coco"])
    idx2concept = json.load(open(t / "captions/coco/idx2concept.json"))
    assert 0 < len(idx2concept) <= 2000

    pp.build_idx2word(captions_dir, corpus_dir, ["coco"], "part")
    idx2word = json.load(open(t / "captions/coco/part/idx2word.json"))
    assert idx2word[:4] == ["<PAD>", "<SOS>", "<EOS>", "<UNK>"]
    assert len(idx2word) == len(set(idx2word))

    pp.get_senti_captions(captions_dir, corpus_dir, ["coco"], "part")
    sc = json.load(open(t / "captions/coco/part/senti_captions.json"))
    assert "neutral" in sc and "positive" in sc
    for senti, caps_list in sc.items():
        for cap, cpts, sentis in caps_list:
            assert cpts and sentis
    # neutral captions exclude sentiment words
    all_sw = set(sw["positive"]) | set(sw["negative"])
    for cap, _, _ in sc["neutral"]:
        assert not set(cap) & all_sw

    pp.get_anno_captions(str(t / "caption_datasets"), captions_dir, ["coco"])
    anno = json.load(open(t / "captions/coco/anno_captions.json"))
    assert len(anno) == 3

    # det_sentiments from a fabricated det_concepts
    det_concepts = {fn: list(concepts["train"][fn])[:3]
                    for fn in concepts["train"]}
    json.dump(det_concepts,
              open(t / "captions/coco/img_det_concepts.json", "w"))
    pp.get_img_det_sentiments(captions_dir, corpus_dir, ["coco"], "part")
    ds = json.load(open(t / "captions/coco/part/img_det_sentiments.json"))
    assert set(ds) == set(det_concepts)

    # LM stage through isclm (SRILM absent in this image)
    pp.get_lm_sents(captions_dir, ["coco"], "part")
    lm_dir = t / "captions/coco/part/lm"
    assert (lm_dir / "neutral_w.txt").exists()
    assert (lm_dir / "neutral_w.sri").exists()
    assert (lm_dir / "neutral_id.txt").exists()


def test_img_senti_labels(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for senti in ("positive", "negative", "neutral"):
        for i in range(210):
            (d / f"{senti}_{i}.jpg").touch()
    out = tmp_path / "img_senti_labels.json"
    pp.get_img_senti_labels(str(d), str(out), seed=0)
    labels = json.load(open(out))
    assert len(labels["val"]) == 250
    assert len(labels["test"]) == 250
    assert len(labels["train"]) == 3 * 210 - 500
    # deterministic given the seed
    pp.get_img_senti_labels(str(d), str(out), seed=0)
    assert json.load(open(out)) == labels


@pytest.mark.skipif(not os.path.exists(os.path.join(NATIVE, "isclm")),
                    reason="native isclm not built")
def test_isclm_ppl_discriminates(tmp_path):
    rng = np.random.default_rng(0)
    words = ["the", "man", "runs", "a", "dog", "sits", "on", "mat"]
    with open(tmp_path / "train.txt", "w") as f:
        for _ in range(500):
            f.write("the man runs on a mat\n" if rng.random() < 0.5
                    else "a dog sits on the mat\n")
    with open(tmp_path / "good.txt", "w") as f:
        f.write("the man runs on a mat\n")
    with open(tmp_path / "bad.txt", "w") as f:
        for _ in range(20):
            f.write(" ".join(rng.choice(words, 6)) + "\n")
    lm = str(tmp_path / "lm.arpa")
    subprocess.run([os.path.join(NATIVE, "isclm"), "train",
                    str(tmp_path / "train.txt"), lm], check=True)

    def ppl(path):
        out = subprocess.run([os.path.join(NATIVE, "isclm"), "ppl", lm,
                              str(path)], capture_output=True,
                             text=True).stdout.split()
        return float(out[out.index("ppl=") + 1])

    assert ppl(tmp_path / "good.txt") < ppl(tmp_path / "bad.txt")
    assert ppl(tmp_path / "good.txt") < 2.0


@pytest.mark.skipif(
    not os.path.exists(os.path.join(NATIVE, "libfstore.so")),
    reason="native libfstore not built")
def test_native_store_exact_fp16(tmp_path):
    from insenticap_model_tpu.data.feature_store import (
        NativeFeatureStore, write_native_store)
    g = np.random.default_rng(0)
    data = {f"i{k}": g.normal(size=(6, 8)).astype(np.float16)
            for k in range(20)}
    path = str(tmp_path / "s.isc")
    write_native_store(path, iter(data.items()), shape=(6, 8),
                       dtype="float16")
    st = NativeFeatureStore(path)
    assert st._native is not None, "C++ reader must be active when built"
    fns = ["i3", "i0", "i19"]
    out = st.batch(fns)
    ref = np.stack([data[f].astype(np.float32) for f in fns])
    np.testing.assert_array_equal(out, ref)  # widening must be exact


@pytest.mark.skipif(not os.path.exists(os.path.join(NATIVE, "isclm")),
                    reason="native isclm not built")
def test_eval_ppl_cli(tmp_path, monkeypatch):
    """eval_ppl end-to-end: train per-sentiment LMs with isclm, score
    generated word-form captions, in-domain < shuffled."""
    from insenticap_model_tpu.cli import eval_ppl
    monkeypatch.chdir(tmp_path)
    lm_dir = tmp_path / "data/captions/coco/part/lm"
    lm_dir.mkdir(parents=True)
    g = np.random.default_rng(0)
    sents = ["the dog runs in the park", "a cat sits on the mat"]
    for senti in ("positive", "negative", "neutral"):
        with open(lm_dir / f"{senti}_w.txt", "w") as f:
            for _ in range(300):
                f.write(sents[int(g.integers(2))] + "\n")
        subprocess.run([os.path.join(NATIVE, "isclm"), "train",
                        str(lm_dir / f"{senti}_w.txt"),
                        str(lm_dir / f"{senti}_w.sri")], check=True)
    # generated result files: in-domain captions
    for senti in ("positive", "negative", "neutral"):
        with open(tmp_path / f"result_0_{senti}_fact_w.txt", "w") as f:
            f.write(sents[0] + "\n")
    scores = eval_ppl.compute_ppl(str(tmp_path / "result_0"), "fact")
    assert all(0 < v < 5 for v in scores.values()), scores
    # shuffled captions score worse
    for senti in ("positive", "negative", "neutral"):
        with open(tmp_path / f"result_1_{senti}_fact_w.txt", "w") as f:
            f.write("park the dog mat in runs a\n")
    bad = eval_ppl.compute_ppl(str(tmp_path / "result_1"), "fact")
    assert all(bad[s] > scores[s] for s in scores)
    # missing inputs must raise, not silently deflate the sum with 0.0
    with pytest.raises(FileNotFoundError):
        eval_ppl.compute_ppl(str(tmp_path / "result_missing"), "fact")
