"""CLI tool tests: convert_checkpoint roundtrip from a reference-format
.pth, and the eval_metrics table computation."""
import json
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not available")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import torch  # noqa: E402

import jax  # noqa: E402

from insenticap_model_tpu.config import Settings  # noqa: E402

SENTI_CATS = ["positive", "negative", "neutral"]
IDX2WORD = ["<PAD>", "<UNK>", "<SOS>", "<EOS>"] + [f"w{i}" for i in range(30)]


def _ref_settings():
    return {"word_emb_dim": 16, "fc_feat_dim": 24, "att_feat_dim": 24,
            "feat_emb_dim": 16, "dropout_p": 0.5, "rnn_hid_dim": 16,
            "att_hid_dim": 16, "concept_mid_him": 20,
            "sentiment_convs_num": 2, "sentiment_fcs_num": 2}


def test_convert_checkpoint_roundtrip(tmp_path):
    """reference .pth -> convert_checkpoint CLI -> checkpoint.load produces
    the exact same forward outputs as direct conversion."""
    from models.captioner import Captioner
    from insenticap_model_tpu import convert
    from insenticap_model_tpu.cli import convert_checkpoint
    from insenticap_model_tpu.models import captioner as jcap
    from insenticap_model_tpu.training import checkpoint as ckpt

    torch.manual_seed(0)
    m = Captioner(IDX2WORD, SENTI_CATS, _ref_settings())
    blob = {"epoch": 7, "model": m.state_dict(),
            "settings": _ref_settings(), "idx2word": IDX2WORD,
            "sentiment_categories": SENTI_CATS,
            "dataset_name": "coco", "corpus_type": "part"}
    pth = tmp_path / "model-best.pth"
    torch.save(blob, pth)
    out = tmp_path / "model-best.ckpt"
    convert_checkpoint.run("captioner", str(pth), str(out))

    settings = Settings.from_dict(_ref_settings())
    template = jcap.init_params(jax.random.PRNGKey(0), len(IDX2WORD),
                                len(SENTI_CATS), settings)
    params, _, meta = ckpt.load(str(out), template)
    assert meta["epoch"] == 7
    ckpt.validate_metadata(meta, settings=settings, idx2word=IDX2WORD,
                           sentiment_categories=SENTI_CATS,
                           dataset_name="coco", corpus_type="part")

    direct = convert.captioner_from_torch(m.state_dict())
    a_leaves = {jax.tree_util.keystr(p): np.asarray(x) for p, x in
                jax.tree_util.tree_leaves_with_path(params)}
    b_leaves = {jax.tree_util.keystr(p): np.asarray(x) for p, x in
                jax.tree_util.tree_leaves_with_path(direct)}
    assert set(a_leaves) == set(b_leaves)
    for key in a_leaves:
        np.testing.assert_array_equal(a_leaves[key], b_leaves[key])


def test_eval_metrics_table(tmp_path, monkeypatch, capsys):
    from insenticap_model_tpu.cli import eval_metrics
    anno = {f"img{i}.jpg": ["a dog runs in the park",
                            "the dog is running"] for i in range(6)}
    # distinct refs so idf is non-degenerate
    anno["img0.jpg"] = ["a cat sits on the mat", "the cat is sitting"]
    anno["img1.jpg"] = ["a man walks on the street", "the man is walking"]
    anno_file = tmp_path / "anno.json"
    anno_file.write_text(json.dumps(anno))
    for senti in ("positive", "neutral"):
        res = [{"image_id": f"img{i}.jpg",
                "caption": anno[f"img{i}.jpg"][0]} for i in range(6)]
        (tmp_path / f"res_{senti}_fact.json").write_text(json.dumps(res))
    table = eval_metrics.compute_metrics(str(tmp_path / "res"), "fact",
                                         str(anno_file))
    assert set(table) == {"positive", "neutral"}
    for senti in table:
        assert table[senti]["Bleu-1"] == pytest.approx(100.0, abs=0.1)
        assert table[senti]["CIDEr-D"] > 0


@pytest.mark.slow
def test_caption_cli_end_to_end(tmp_path):
    """Cold-start serving: raw image file -> caption, through the real CLI
    composition (encoder -> concepts -> senti words -> detect -> beam)."""
    from PIL import Image
    from insenticap_model_tpu.cli import caption as caption_cli
    from insenticap_model_tpu.models import (captioner as cap,
                                             concept_detector as cpt_det,
                                             encoder as enc,
                                             sentiment_detector as senti_det)
    from insenticap_model_tpu.training import checkpoint as ckpt

    settings = Settings(word_emb_dim=16, fc_feat_dim=2048, att_feat_dim=2048,
                        feat_emb_dim=16, rnn_hid_dim=16, att_hid_dim=16,
                        concept_mid_dim=24)
    words = ["<PAD>", "<UNK>", "<SOS>", "<EOS>", "dog", "cat", "happy",
             "sad", "runs", "sits"]
    cats = SENTI_CATS
    concepts = ["dog", "cat", "runs", "sits"]

    comp = {"captioner": cap.init_params(jax.random.PRNGKey(0), len(words),
                                         3, settings),
            "senti_detector": senti_det.init_params(jax.random.PRNGKey(1),
                                                    3, settings)}
    ckpt.save(str(tmp_path / "rl.ckpt"), comp, None, {
        "epoch": 0, "settings": settings.to_dict(), "idx2word": words,
        "sentiment_categories": cats, "max_seq_len": 8})
    ckpt.save(str(tmp_path / "cpt.ckpt"),
              cpt_det.init_params(jax.random.PRNGKey(2), len(concepts),
                                  settings), None,
              {"epoch": 0, "settings": settings.to_dict(),
               "idx2concept": concepts})
    ckpt.save(str(tmp_path / "resnet.ckpt"),
              enc.init_params(jax.random.PRNGKey(3)), None, {"epoch": -1})
    (tmp_path / "senti_det.json").write_text(json.dumps(
        {"dog": [["happy", 0.5]], "cat": [["sad", 0.4]]}))

    g = np.random.default_rng(0)
    img = tmp_path / "test.jpg"
    Image.fromarray(g.integers(0, 255, size=(64, 64, 3)).astype(
        np.uint8)).save(img)

    for senti in ("auto", "positive"):
        out = caption_cli.run(caption_cli.build_parser().parse_args([
            "-i", str(img), "--rl_model", str(tmp_path / "rl.ckpt"),
            "--concept_model", str(tmp_path / "cpt.ckpt"),
            "--resnet101_ckpt", str(tmp_path / "resnet.ckpt"),
            "--sentiment_detector_json", str(tmp_path / "senti_det.json"),
            "--sentiment", senti, "--max_seq_len", "6", "--beam_size", "2",
            "--num_concepts", "2", "--num_sentiments", "4",
            "--dump_attention", str(tmp_path / "att")]))
        assert len(out) == 1
        rec = out[0]
        assert rec["image"] == "test.jpg"
        assert rec["sentiment"] in cats
        assert isinstance(rec["caption"], str)
        if senti != "auto":
            assert rec["sentiment"] == senti
        # one 14x14 content-attention map per generated word (SURVEY §8.14)
        att_npz = np.load(rec["attention"], allow_pickle=False)
        n_words = len(rec["caption"].split())
        assert att_npz["cont"].shape == (n_words, 14, 14)
        assert att_npz["words"].shape == (n_words,)
        np.testing.assert_allclose(att_npz["cont"].sum((-1, -2)), 1.0,
                                   atol=1e-5)


def test_meteor_lite():
    from insenticap_model_tpu.rewards.meteor import Meteor, score_sentence
    ref = "a dog runs in the park".split()
    exact = score_sentence(ref, [ref])
    # Meteor 1.5's fragmentation penalty caps even perfect matches well
    # below 1 (gamma*(1/m)^beta with beta=0.2) — COCO-scale scores ~0.25
    assert 0.5 < exact <= 1.0
    # stem stage: running vs runs still matches, slightly discounted
    hyp = "a dog running in the park".split()
    stem = score_sentence(hyp, [ref])
    assert 0.0 < stem < exact
    # unrelated caption scores 0
    assert score_sentence("purple elephants fly".split(), [ref]) == 0.0
    # word-salad of the same tokens is penalized vs the ordered hypothesis
    salad = "park the in runs dog a".split()
    assert score_sentence(salad, [ref]) < exact
    m, scores = Meteor().compute_score(
        {"i": [ref]}, [{"image_id": "i", "caption": [tuple(hyp)]}])
    assert 0 < m <= 1 and len(scores) == 1


def test_meteor_function_word_discount():
    """δ=0.75 content weighting (Meteor 1.5 'en'): missing a FUNCTION
    word costs less than missing a CONTENT word."""
    from insenticap_model_tpu.rewards.meteor import score_sentence
    # structurally identical pairs (2 matches, 1 chunk, mismatch at
    # position 0): one mismatches a FUNCTION word, one a CONTENT word
    s_func = score_sentence("an dog runs".split(),
                            ["the dog runs".split()])
    s_content = score_sentence("cat dog runs".split(),
                               ["fox dog runs".split()])
    assert s_content < s_func
    # with the discount disabled the asymmetry disappears
    sf0 = score_sentence("an dog runs".split(), ["the dog runs".split()],
                         function_words=None)
    sc0 = score_sentence("cat dog runs".split(),
                         ["fox dog runs".split()], function_words=None)
    assert sf0 == pytest.approx(sc0)


def test_meteor_synonym_stage(tmp_path):
    """The WordNet synonym stage (w=0.8) matches words sharing a synset
    offset, parsed from standard WNdb index files."""
    from insenticap_model_tpu.rewards.meteor import (
        Meteor, WordNetSynonyms, score_sentence)

    wn = tmp_path / "wordnet"
    wn.mkdir()
    # minimal index.noun in the WNdb format:
    #   lemma pos synset_cnt p_cnt [ptrs] sense_cnt tagsense_cnt offsets
    (wn / "index.noun").write_text(
        "  1 this software... license header\n"
        "canine n 1 1 @ 1 0 02083346\n"
        "dog n 2 2 @ ~ 2 1 02084071 02083346\n"
        "cat n 1 1 @ 1 0 02121620\n")

    syn = WordNetSynonyms(str(wn))
    assert syn.are_synonyms("dog", "canine")
    assert syn.are_synonyms("canine", "dog")
    assert not syn.are_synonyms("dog", "cat")
    assert not syn.are_synonyms("dog", "unknownword")

    ref = "a canine runs".split()
    hyp = "a dog runs".split()
    base = score_sentence(hyp, [ref])                     # no wordnet
    with_syn = score_sentence(hyp, [ref], wordnet=syn)
    assert with_syn > base                                # synonym matched
    exact = score_sentence(ref, [ref], wordnet=syn)
    assert with_syn < exact                               # w=0.8 < 1.0

    m = Meteor(wordnet_dir=str(wn))
    # name is ALWAYS METEOR* (no-paraphrase + stand-in function words);
    # mode records that the synonym stage was active
    assert m.name == "METEOR*" and "+syn" in m.mode
    mean, _ = m.compute_score({"i": [ref]},
                              [{"image_id": "i", "caption": [tuple(hyp)]}])
    assert mean == pytest.approx(with_syn)


def test_meteor_degrades_without_wordnet(monkeypatch):
    from insenticap_model_tpu.rewards import meteor as M
    monkeypatch.setattr(M, "find_wordnet_dir", lambda: None)
    m = M.Meteor()
    assert m.name == "METEOR*" and m.wordnet is None


def _oracle_align_key(cand, n_hyp, n_ref):
    """Brute-force Meteor resolution oracle: enumerate EVERY one-to-one
    match set over the candidate lists and return the lexicographically
    best (-matches, chunks, sum|i-j|) key. Independent of the production
    DFS — a plain product over per-position choices, no pruning."""
    import itertools
    best = (1, 0, 0)
    # choice per hyp position: one of its candidate refs, or None
    options = [[None] + [j for j, _ in cand[i]] for i in range(n_hyp)]
    for pick in itertools.product(*options):
        used = [j for j in pick if j is not None]
        if len(set(used)) != len(used):
            continue  # not one-to-one on ref side
        pairs = [(i, j) for i, j in enumerate(pick) if j is not None]
        m = len(pairs)
        chunks = sum(1 for k, (i, j) in enumerate(pairs)
                     if k == 0 or pairs[k - 1] != (i - 1, j - 1))
        dist = sum(abs(i - j) for i, j in pairs)
        key = (-m, chunks, dist)
        if key < best:
            best = key
    return best


def _align_key(align):
    m = len(align)
    chunks = sum(1 for k, (i, j, _) in enumerate(align)
                 if k == 0 or (align[k - 1][0], align[k - 1][1])
                 != (i - 1, j - 1))
    return (-m, chunks, sum(abs(i - j) for i, j, _ in align))


def test_meteor_align_exact_vs_bruteforce_oracle():
    """VERDICT r3 #4: the production aligner must realize EXACTLY the
    Meteor 1.5 resolution criteria (max matches, then min chunks, then
    min total offset). Property-tested against a no-pruning brute-force
    oracle over random repetition-heavy pairs; also quantifies how often
    the retired greedy stage-order aligner diverged (must be >0 — that
    divergence is why it was retired)."""
    import random
    from insenticap_model_tpu.rewards.meteor import (
        _align, _align_greedy, _candidate_matches, _stem)

    rng = random.Random(0)
    # tiny vocab with stem-collision pairs ("run"/"runs") to force
    # multi-stage, multi-candidate alignments with repeats
    vocab = ["a", "the", "dog", "dogs", "run", "runs", "park",
             "cat", "big", "sits"]
    greedy_diverged = 0
    trials = 300
    for _ in range(trials):
        hyp = [rng.choice(vocab) for _ in range(rng.randint(1, 6))]
        ref = [rng.choice(vocab) for _ in range(rng.randint(1, 6))]
        hs, rs = [_stem(w) for w in hyp], [_stem(w) for w in ref]
        cand = _candidate_matches(hyp, ref, hs, rs, None)
        oracle = _oracle_align_key(cand, len(hyp), len(ref))
        got = _align_key(_align(hyp, ref, hs, rs, None))
        assert got == oracle, (hyp, ref, got, oracle)
        if _align_key(_align_greedy(hyp, ref, hs, rs, None)) != oracle:
            greedy_diverged += 1
    # the retired aligner really was wrong on a measurable fraction
    assert greedy_diverged > 0


def test_meteor_paraphrase_table_formats(tmp_path):
    """All three accepted table layouts (PPDB '|||', TSV, Meteor-1.5
    consecutive-line pairs; plain or gzipped) parse to the same
    symmetric phrase relation."""
    import gzip
    from insenticap_model_tpu.rewards.meteor import ParaphraseTable

    ppdb = tmp_path / "ppdb.txt"
    ppdb.write_text("big ||| large\n"
                    "[NP] ||| runs quickly ||| sprints ||| feats ||| al\n")
    tsv = tmp_path / "tab.txt"
    tsv.write_text("big\tlarge\nruns quickly\tsprints\n")
    pairs_gz = tmp_path / "pairs.gz"
    with gzip.open(pairs_gz, "wt") as f:
        f.write("big\nlarge\nruns quickly\nsprints\n")

    tables = [ParaphraseTable(str(p)) for p in (ppdb, tsv, pairs_gz)]
    for t in tables:
        assert t.table == tables[0].table
        assert ("large",) in t.lookup(("big",))          # symmetric
        assert ("big",) in t.lookup(("large",))
        assert ("sprints",) in t.lookup(("runs", "quickly"))
        assert t.lookup(("unknown",)) == set() or not t.lookup(("unknown",))
        assert t.max_len == 2

    with pytest.raises(ValueError):
        empty = tmp_path / "empty.txt"
        empty.write_text("# only a comment\n")
        ParaphraseTable(str(empty))


def test_meteor_paraphrase_stage(tmp_path):
    """Paraphrase stage (w=0.6): phrase spans of the hypothesis align to
    phrase spans of the reference; earlier word modules keep precedence
    on 1:1 pairs; scoring covers every word of each side's span."""
    from insenticap_model_tpu.rewards.meteor import (
        Meteor, ParaphraseTable, _align_spans, _candidate_spans,
        score_sentence, _stem)

    tab = tmp_path / "para.txt"
    tab.write_text("runs quickly ||| sprints\nbig ||| large\n"
                   "big ||| big\n")   # self-pair must be ignored
    pt = ParaphraseTable(str(tab))
    assert ("big",) not in pt.lookup(("big",))

    # multi-word hyp span <-> shorter ref span, chained with the exact
    # matches before it (1 chunk): hand-resolved alignment
    hyp = "the dog runs quickly".split()
    ref = "the dog sprints".split()
    cand = _candidate_spans(hyp, ref, [_stem(w) for w in hyp],
                            [_stem(w) for w in ref], None, pt)
    align = _align_spans(cand, len(hyp))
    assert align == [(0, 1, 0, 1, 1.0), (1, 1, 1, 1, 1.0),
                     (2, 2, 2, 1, 0.6)]
    base = score_sentence(hyp, [ref])
    with_para = score_sentence(hyp, [ref], paraphrases=pt)
    assert with_para > base
    # hand-computed (weighted P/R over covered words, 1 chunk,
    # m=(4+3)/2): pins the span scoring semantics
    p = (1.0 * 0.25 + 1.0 * 0.75 + 0.6 * 1.5) / 2.5
    r = (1.0 * 0.25 + 1.0 * 0.75 + 0.6 * 0.75) / 1.75
    fmean = p * r / (0.85 * p + 0.15 * r)
    expect = fmean * (1.0 - 0.6 * (1 / 3.5) ** 0.2)
    assert with_para == pytest.approx(expect)

    # 1:1 paraphrase behaves like a w=0.6 word stage, and exact-stage
    # precedence wins when the same pair matches both
    s_syn = score_sentence("a big dog".split(), ["a large dog".split()],
                           paraphrases=pt)
    s_base = score_sentence("a big dog".split(), ["a large dog".split()])
    s_exact = score_sentence("a big dog".split(), ["a big dog".split()],
                             paraphrases=pt)
    assert s_base < s_syn < s_exact

    m = Meteor(paraphrase_path=str(tab))
    assert m.name == "METEOR*" and "+para" in m.mode
    mean, _ = m.compute_score(
        {"i": [ref]}, [{"image_id": "i", "caption": [tuple(hyp)]}])
    assert mean == pytest.approx(with_para)


def test_meteor_paraphrase_env_discovery(tmp_path, monkeypatch):
    from insenticap_model_tpu.rewards import meteor as M
    tab = tmp_path / "para.txt"
    tab.write_text("big ||| large\n")
    monkeypatch.setenv("ISC_METEOR_PARAPHRASE", str(tab))
    m = M.Meteor()
    assert m.paraphrases is not None and "+para" in m.mode
    monkeypatch.delenv("ISC_METEOR_PARAPHRASE")
    assert M.find_paraphrase_path() is None


def test_meteor_function_words_derive_load_env(tmp_path, monkeypatch):
    """derive_function_words applies Meteor's own definition (relative
    frequency > 1e-3); a derived list round-trips through the
    function.words file format and the ISC_METEOR_FUNCTION_WORDS hook,
    and Meteor().mode records the source."""
    from insenticap_model_tpu.rewards import meteor as M

    # 1203 tokens total: 'rare' appears once (1/1203 < 1e-3, excluded at
    # the DEFAULT threshold), the fillers appear 400x (included)
    corpus = [["the", "dog", "runs"]] * 400 + [["the", "rare", "word"]]
    fw = M.derive_function_words(corpus)
    assert "the" in fw and "dog" in fw          # frequent -> included
    assert "rare" not in fw and "word" not in fw  # below 1e-3 -> excluded
    assert M.derive_function_words(corpus, min_rel_freq=0.5) == set()
    assert M.derive_function_words([]) == set()

    path = tmp_path / "function.words"
    path.write_text("# header comment\n" + "\n".join(sorted(fw)) + "\n")
    assert M.load_function_words(str(path)) == fw

    monkeypatch.setenv("ISC_METEOR_FUNCTION_WORDS", str(path))
    m = M.Meteor()
    assert m.function_words == fw
    assert "function_words=file" in m.mode
    monkeypatch.delenv("ISC_METEOR_FUNCTION_WORDS")
    assert M.find_function_words_path() is None
    assert "function_words=builtin" in M.Meteor().mode
    assert "function_words=none" in M.Meteor(function_words=None).mode


def _oracle_span_key(cand, n_hyp):
    """Brute-force span-resolution oracle: enumerate EVERY subset of the
    flattened candidate span list, keep those one-to-one on both sides,
    return the lexicographically best (-covered, chunks, dist) key."""
    import itertools
    flat = [(i, hl, j, rl, w) for i in range(n_hyp)
            for hl, j, rl, w in cand[i]]
    assert len(flat) <= 16, "oracle instance too large"
    best = (1, 0, 0)
    for size in range(len(flat) + 1):
        for sub in itertools.combinations(flat, size):
            hyp_cov, ref_cov = set(), set()
            ok = True
            for i, hl, j, rl, _ in sub:
                hspan, rspan = set(range(i, i + hl)), set(range(j, j + rl))
                if hyp_cov & hspan or ref_cov & rspan:
                    ok = False
                    break
                hyp_cov |= hspan
                ref_cov |= rspan
            if not ok:
                continue
            sub = sorted(sub)
            chunks = sum(
                1 for k, (i, hl, j, rl, _) in enumerate(sub)
                if k == 0 or (sub[k - 1][0] + sub[k - 1][1],
                              sub[k - 1][2] + sub[k - 1][3]) != (i, j))
            key = (-(len(hyp_cov) + len(ref_cov)), chunks,
                   sum(abs(i - j) for i, _, j, _, _ in sub))
            if key < best:
                best = key
    return best


def test_meteor_span_align_vs_bruteforce_oracle(tmp_path):
    """The span resolver realizes the exact Meteor criteria (max covered
    words over both sides, min chunks, min offset sum) with phrase
    matches in play — property-tested against a no-pruning subset
    oracle."""
    import random
    from insenticap_model_tpu.rewards.meteor import (
        ParaphraseTable, _align_spans, _candidate_spans, _stem)

    tab = tmp_path / "para.txt"
    tab.write_text("big ||| large\ndog ||| puppy\n"
                   "runs quickly ||| sprints\nthe park ||| a garden\n")
    pt = ParaphraseTable(str(tab))
    vocab = ["the", "a", "big", "large", "dog", "puppy", "runs",
             "quickly", "sprints", "park", "garden"]
    rng = random.Random(1)
    checked = 0
    while checked < 120:
        hyp = [rng.choice(vocab) for _ in range(rng.randint(1, 5))]
        ref = [rng.choice(vocab) for _ in range(rng.randint(1, 5))]
        cand = _candidate_spans(hyp, ref, [_stem(w) for w in hyp],
                                [_stem(w) for w in ref], None, pt)
        if sum(len(r) for r in cand) > 16:
            continue  # keep the subset oracle tractable
        align = _align_spans(cand, len(hyp))
        chunks = sum(
            1 for k, (i, hl, j, rl, _) in enumerate(align)
            if k == 0 or (align[k - 1][0] + align[k - 1][1],
                          align[k - 1][2] + align[k - 1][3]) != (i, j))
        got = (-sum(hl + rl for _, hl, _, rl, _ in align), chunks,
               sum(abs(i - j) for i, _, j, _, _ in align))
        assert got == _oracle_span_key(cand, len(hyp)), (hyp, ref)
        checked += 1


def test_meteor_align_beam_fallback(monkeypatch):
    """Node-budget exhaustion falls back to the width-40 beam (what Java
    Meteor itself uses) and still returns a full-coverage alignment on
    the worst case for DFS: all-identical tokens."""
    from insenticap_model_tpu.rewards import meteor as M
    hyp = ["dog"] * 12
    ref = ["dog"] * 12
    monkeypatch.setattr(M, "_MAX_NODES", 50)
    align = M._align(hyp, ref, hyp, ref, None)
    assert _align_key(align) == (-12, 1, 0)  # identity = 1 chunk, 0 dist
