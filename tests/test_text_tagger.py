"""Quantify the rule-tagger fallback divergence (VERDICT r1 weak #6).

ADJ tagging drives the entire sentiment-word mining stage
(preprocessing.process_senti_corpus; reference preprocess.py:104-158) and
NOUN tagging drives the noun->senti-word table. nltk's perceptron data is
not installable in this environment (no network), so the divergence is
bounded against a hand-gold caption-domain fixture instead: per-tag
accuracy of the rule tagger, and end-to-end overlap of the mined
sentiment_words.json / sentiment_detector.json artifacts under
rule-tagging vs gold-tagging.
"""
import json
import os


from insenticap_model_tpu import preprocessing as pp
from insenticap_model_tpu import text

# Caption-domain gold fixture: (sentence, {word: universal tag}) — tags
# follow nltk's universal tagset (the reference tags with
# pos_tag_sents(tagset='universal'), preprocess.py:108-109).
GOLD = [
    ("a happy dog runs in the lovely park",
     {"a": "DET", "happy": "ADJ", "dog": "NOUN", "runs": "VERB",
      "in": "ADP", "the": "DET", "lovely": "ADJ", "park": "NOUN"}),
    ("the sad old man sits on a broken bench",
     {"the": "DET", "sad": "ADJ", "old": "ADJ", "man": "NOUN",
      "sits": "VERB", "on": "ADP", "a": "DET", "broken": "ADJ",
      "bench": "NOUN"}),
    ("two beautiful birds fly over the calm water",
     {"two": "NUM", "beautiful": "ADJ", "birds": "NOUN", "fly": "VERB",
      "over": "ADP", "the": "DET", "calm": "ADJ", "water": "NOUN"}),
    ("an ugly cat sleeps near a dirty window",
     {"an": "DET", "ugly": "ADJ", "cat": "NOUN", "sleeps": "VERB",
      "near": "ADP", "a": "DET", "dirty": "ADJ", "window": "NOUN"}),
    ("a delicious meal with fresh bread and great wine",
     {"a": "DET", "delicious": "ADJ", "meal": "NOUN", "with": "ADP",
      "fresh": "ADJ", "bread": "NOUN", "and": "CONJ", "great": "ADJ",
      "wine": "NOUN"}),
    ("the terrible storm destroyed many small houses",
     {"the": "DET", "terrible": "ADJ", "storm": "NOUN",
      "destroyed": "VERB", "many": "ADJ", "small": "ADJ",
      "houses": "NOUN"}),
    ("a cute child plays with a wonderful toy",
     {"a": "DET", "cute": "ADJ", "child": "NOUN", "plays": "VERB",
      "with": "ADP", "wonderful": "ADJ", "toy": "NOUN"}),
    ("some people walk slowly through the quiet street",
     {"some": "DET", "people": "NOUN", "walk": "VERB", "slowly": "ADV",
      "through": "ADP", "the": "DET", "quiet": "ADJ", "street": "NOUN"}),
    ("the angry crowd shouts at the nervous driver",
     {"the": "DET", "angry": "ADJ", "crowd": "NOUN", "shouts": "VERB",
      "at": "ADP", "nervous": "ADJ", "driver": "NOUN"}),
    ("a lonely woman stands beside the gorgeous fountain",
     {"a": "DET", "lonely": "ADJ", "woman": "NOUN", "stands": "VERB",
      "beside": "ADP", "the": "DET", "gorgeous": "ADJ",
      "fountain": "NOUN"}),
]


def test_rule_tagger_adj_noun_accuracy():
    """ADJ/NOUN decisions are what the mining stage consumes; bound their
    error on the gold fixture and print the measured rates."""
    stats = {t: {"tp": 0, "fp": 0, "fn": 0} for t in ("ADJ", "NOUN")}
    correct = total = 0
    for sent, gold in GOLD:
        tagged = text.pos_tag(sent.split())
        for w, p in tagged:
            g = gold[w]
            correct += p == g
            total += 1
            for t in stats:
                if p == t and g == t:
                    stats[t]["tp"] += 1
                elif p == t:
                    stats[t]["fp"] += 1
                elif g == t:
                    stats[t]["fn"] += 1
    acc = correct / total
    report = {"overall_acc": round(acc, 3)}
    for t, s in stats.items():
        prec = s["tp"] / max(s["tp"] + s["fp"], 1)
        rec = s["tp"] / max(s["tp"] + s["fn"], 1)
        report[f"{t}_precision"] = round(prec, 3)
        report[f"{t}_recall"] = round(rec, 3)
        assert prec >= 0.9, (t, report)
        assert rec >= 0.9, (t, report)
    assert acc >= 0.9, report
    print("rule-tagger vs gold:", json.dumps(report))


def test_mined_artifacts_overlap_gold_tagging(tmp_path, monkeypatch):
    """End-to-end: sentiment_words.json / sentiment_detector.json mined
    with the rule tagger vs mined with gold tags must overlap >= 90%
    (Jaccard on word sets) — bounds what the fallback can shift."""
    # synthetic senti corpus built by repeating the gold sentences with
    # sentiment-specific adjectives so mining has enough counts (>=3)
    pos_s = [s for s, _ in GOLD[:5]] + [GOLD[6][0]]
    neg_s = [s for s, _ in GOLD[3:6]] + [GOLD[8][0], GOLD[9][0]]
    neu_s = [GOLD[7][0]]
    corpus = {"positive": pos_s * 5, "negative": neg_s * 5,
              "neutral": neu_s * 5}

    gold_map = {}
    for _, g in GOLD:
        gold_map.update(g)

    def run(tagger, out_dir):
        d = tmp_path / out_dir / "part"
        os.makedirs(d)
        with open(d / "senti_corpus.json", "w") as f:
            json.dump(corpus, f)
        monkeypatch.setattr(
            text, "pos_tag_sents",
            lambda sents: [tagger(s) for s in sents])
        pp.process_senti_corpus(str(tmp_path / out_dir), "part")
        with open(d / "sentiment_words.json") as f:
            words = json.load(f)
        with open(d / "sentiment_detector.json") as f:
            table = json.load(f)
        return words, table

    rule_w, rule_t = run(lambda s: [(w, text._rule_tag(w)) for w in s],
                         "rule")
    gold_w, gold_t = run(lambda s: [(w, gold_map[w]) for w in s], "gold")

    for senti in gold_w:
        a = set(rule_w.get(senti, {}))
        b = set(gold_w[senti])
        union = a | b
        jac = len(a & b) / len(union) if union else 1.0
        assert jac >= 0.9, (senti, sorted(a), sorted(b))
    nouns_a, nouns_b = set(rule_t), set(gold_t)
    union = nouns_a | nouns_b
    jac = len(nouns_a & nouns_b) / len(union) if union else 1.0
    assert jac >= 0.9, (sorted(nouns_a), sorted(nouns_b))
