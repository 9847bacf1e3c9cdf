"""Exact numerical parity against the reference implementation.

These tests import the reference PyTorch modules from /root/reference (read
only), copy their randomly-initialized weights into our param pytrees via
insenticap_model_tpu.convert, and assert forward-pass equality in eval mode.
This validates both the models and the checkpoint-conversion path a reference
user would take. Skipped when the reference tree is unavailable.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not available")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from insenticap_model_tpu import convert  # noqa: E402
from insenticap_model_tpu.config import Settings  # noqa: E402
from insenticap_model_tpu.models import (captioner as jcap,  # noqa: E402
                                         concept_detector as jcpt,
                                         sent_senti_cls as jcls,
                                         sentiment_detector as jsd)
from insenticap_model_tpu.ops import beam as jbeam  # noqa: E402

SENTI_CATS = ["positive", "negative", "neutral"]
IDX2WORD = ["<PAD>", "<UNK>", "<SOS>", "<EOS>"] + [f"w{i}" for i in range(30)]


def ref_settings():
    return {
        "word_emb_dim": 16, "fc_feat_dim": 24, "att_feat_dim": 24,
        "feat_emb_dim": 16, "dropout_p": 0.5, "rnn_hid_dim": 16,
        "att_hid_dim": 16, "concept_mid_him": 20,
        "sentiment_convs_num": 2, "sentiment_fcs_num": 2,
    }


def our_settings():
    return Settings(word_emb_dim=16, fc_feat_dim=24, att_feat_dim=24,
                    feat_emb_dim=16, dropout_p=0.5, rnn_hid_dim=16,
                    att_hid_dim=16, concept_mid_dim=20)


@pytest.fixture(scope="module")
def ref_captioner():
    from models.captioner import Captioner
    torch.manual_seed(0)
    m = Captioner(IDX2WORD, SENTI_CATS, ref_settings())
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_cap_params(ref_captioner):
    return convert.captioner_from_torch(ref_captioner.state_dict())


def _ids():
    return jcap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)


def test_forward_xe_parity(ref_captioner, jax_cap_params):
    g = np.random.default_rng(0)
    bs, N, T1 = 3, 9, 8
    fc = g.normal(size=(bs, 24)).astype(np.float32)
    att = g.normal(size=(bs, N, 24)).astype(np.float32)
    cpts = g.integers(4, 34, size=(bs, 5))
    caps = np.concatenate([
        np.full((bs, 1), 2), g.integers(4, 34, size=(bs, T1 - 2)),
        np.full((bs, 1), 3)], axis=1)
    labels = g.integers(0, 3, size=(bs,))

    with torch.no_grad():
        ref = ref_captioner(torch.from_numpy(fc), torch.from_numpy(att),
                            torch.from_numpy(cpts), torch.from_numpy(caps),
                            torch.from_numpy(labels), mode="xe")
    ours, aux = jcap.forward_xe(
        jax_cap_params, jnp.asarray(fc), jnp.asarray(att), jnp.asarray(cpts),
        jnp.asarray(caps), jnp.asarray(labels), settings=our_settings(),
        rng=jax.random.PRNGKey(0), ss_prob=0.0, deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)
    # aux feats for the domain-alignment loss
    np.testing.assert_allclose(np.asarray(aux["fc_emb"]),
                               ref_captioner.fc_feats.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux["cpt_feats"]),
                               ref_captioner.cpt_feats.numpy(), atol=1e-5)


def test_forward_seq2seq_parity(ref_captioner, jax_cap_params):
    g = np.random.default_rng(1)
    bs, T1, M = 3, 7, 6
    caps = np.concatenate([
        np.full((bs, 1), 2), g.integers(4, 34, size=(bs, T1 - 2)),
        np.full((bs, 1), 3)], axis=1)
    cpts = g.integers(4, 34, size=(bs, 5))
    sentis = g.integers(4, 34, size=(bs, M))
    labels = g.integers(0, 3, size=(bs,))
    with torch.no_grad():
        ref = ref_captioner(torch.from_numpy(caps), torch.from_numpy(cpts),
                            torch.from_numpy(sentis), torch.from_numpy(labels),
                            mode="seq2seq")
    ours = jcap.forward_seq2seq(
        jax_cap_params, jnp.asarray(caps), jnp.asarray(cpts),
        jnp.asarray(sentis), jnp.asarray(labels), settings=our_settings(),
        rng=jax.random.PRNGKey(0), deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


def test_forward_rl_greedy_parity(ref_captioner, jax_cap_params):
    g = np.random.default_rng(2)
    bs, N, M, T = 4, 9, 6, 12
    fc = g.normal(size=(bs, 24)).astype(np.float32)
    att = g.normal(size=(bs, N, 24)).astype(np.float32)
    cpts = g.integers(4, 34, size=(bs, 5))
    sentis = g.integers(4, 34, size=(bs, M))
    labels = g.integers(0, 3, size=(bs,))
    with torch.no_grad():
        rseq, rlp, rmask = ref_captioner(
            torch.from_numpy(fc), torch.from_numpy(att),
            torch.from_numpy(cpts), torch.from_numpy(sentis),
            torch.from_numpy(labels), T, sample_max=1, mode="rl")
    seq, lp, mask, _ = jcap.forward_rl(
        jax_cap_params, jnp.asarray(fc), jnp.asarray(att), jnp.asarray(cpts),
        jnp.asarray(sentis), jnp.asarray(labels), settings=our_settings(),
        ids=_ids(), max_seq_len=T, sample_max=True,
        rng=jax.random.PRNGKey(0), deterministic=True)
    # the reference may early-break; compare the overlapping prefix and
    # check our suffix is fully masked
    Tr = rseq.shape[1]
    np.testing.assert_array_equal(np.asarray(seq[:, :Tr]), rseq.numpy())
    np.testing.assert_array_equal(np.asarray(mask[:, :Tr]), rmask.numpy())
    assert np.all(np.asarray(mask[:, Tr:]) == 0)
    valid = rmask.numpy() > 0
    np.testing.assert_allclose(np.asarray(lp[:, :Tr])[valid],
                               rlp.numpy()[valid], atol=2e-4)


def test_beam_search_parity(ref_captioner, jax_cap_params):
    g = np.random.default_rng(3)
    N, M, T = 9, 6, 12
    fc = g.normal(size=(24,)).astype(np.float32)
    att = g.normal(size=(N, 24)).astype(np.float32)
    sentis = g.integers(4, 34, size=(M,))
    label = np.array([1])
    with torch.no_grad():
        ref_caps, ref_scores = ref_captioner.sample(
            torch.from_numpy(fc), torch.from_numpy(att),
            torch.from_numpy(sentis), torch.from_numpy(label),
            beam_size=3, decoding_constraint=1, max_seq_len=T)

    s = our_settings()
    ctx, _ = jcap.build_visual_context(
        jax_cap_params, jnp.asarray(fc)[None], jnp.asarray(att)[None],
        s.dropout_p, jax.random.PRNGKey(0), True,
        senti_words=jnp.asarray(sentis)[None],
        senti_labels=jnp.asarray(label))
    seqs, scores = jbeam.beam_search(
        jax_cap_params, ctx, settings=s, ids=_ids(), beam_size=3,
        max_seq_len=T, mode="rl", decoding_constraint=True)
    texts = []
    for row in np.asarray(seqs):
        words = []
        for idx in row:
            if idx == 3:
                break
            words.append(IDX2WORD[idx])
        texts.append(" ".join(words))
    assert texts[0] == ref_caps[0]
    np.testing.assert_allclose(np.asarray(scores)[0], ref_scores[0], atol=1e-3)


def test_sentiment_detector_parity():
    from models.sentiment_detector import SentimentDetector
    torch.manual_seed(1)
    ref = SentimentDetector(SENTI_CATS, ref_settings())
    ref.eval()
    params = convert.sentiment_detector_from_torch(ref.state_dict())
    g = np.random.default_rng(4)
    feats = g.normal(size=(2, 5, 5, 24)).astype(np.float32)
    with torch.no_grad():
        rout, rmap = ref(torch.from_numpy(feats))
        rlab, _, _, rscore = ref.sample(torch.from_numpy(feats), 0.7)
    probs, smap = jsd.forward(params, jnp.asarray(feats), dropout_p=0.0)
    np.testing.assert_allclose(np.asarray(probs), rout.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(smap), rmap.numpy(), atol=1e-5)
    lab, _, score = jsd.sample(params, jnp.asarray(feats), 0.7, 2)
    np.testing.assert_array_equal(np.asarray(lab), rlab.numpy())
    np.testing.assert_allclose(np.asarray(score), rscore.numpy(), atol=1e-5)


def test_sentiment_detector_full_parity():
    """The reference-dead "full" variant (models/sentiment_detector_full.py
    :5-73; its settings knob is commented out at reference opts.py:91),
    implemented behind Settings.num_kernels_per_sentiment."""
    from models.sentiment_detector_full import SentimentDetector as FullSD
    from insenticap_model_tpu.models import sentiment_detector_full as jsdf
    from insenticap_model_tpu.models import sentiment_detector as jsd_mod
    import dataclasses

    torch.manual_seed(7)
    rs = ref_settings()
    rs["num_kernels_per_sentiment"] = 4
    ref = FullSD(SENTI_CATS, rs)
    ref.eval()
    params = convert.sentiment_detector_full_from_torch(ref.state_dict())
    g = np.random.default_rng(11)
    feats = g.normal(size=(2, 5, 5, 24)).astype(np.float32)
    with torch.no_grad():
        (rdet, rcls), rmap = ref(torch.from_numpy(feats))
        rlab, _, rnames, rscore = ref.sample(torch.from_numpy(feats), 0.7)
    det, cls_out, smap = jsdf.forward_full(params, jnp.asarray(feats),
                                           dropout_p=0.0)
    np.testing.assert_allclose(np.asarray(det), rdet.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls_out), rcls.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(smap), rmap.numpy(), atol=1e-5)
    lab, _, score = jsdf.sample(params, jnp.asarray(feats), 0.7,
                                SENTI_CATS.index("neutral"))
    np.testing.assert_array_equal(np.asarray(lab), rlab.numpy())
    np.testing.assert_allclose(np.asarray(score), rscore.numpy(), atol=1e-5)
    assert [SENTI_CATS[i] for i in np.asarray(lab)] == rnames

    # Settings selects the variant; init_params shapes match the converter's
    s_full = dataclasses.replace(our_settings(), num_kernels_per_sentiment=4)
    assert jsd_mod.module_for(s_full) is jsdf
    assert jsd_mod.module_for(our_settings()) is jsd_mod
    init = jsdf.init_params(jax.random.PRNGKey(0), len(SENTI_CATS), s_full)
    assert jax.tree_util.tree_structure(init) == \
        jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(init),
                    jax.tree_util.tree_leaves(params)):
        assert a.shape == b.shape


def test_concept_detector_parity():
    from models.concept_detector import ConceptDetector, MultiLabelClsLoss
    torch.manual_seed(2)
    cpts = [f"c{i}" for i in range(12)]
    ref = ConceptDetector(cpts, ref_settings())
    ref.eval()
    params = convert.concept_detector_from_torch(ref.state_dict())
    g = np.random.default_rng(5)
    feats = g.normal(size=(3, 24)).astype(np.float32)
    with torch.no_grad():
        rout = ref(torch.from_numpy(feats))
    ours = jcpt.forward(params, jnp.asarray(feats), dropout_p=0.0)
    np.testing.assert_allclose(np.asarray(ours), rout.numpy(), atol=1e-5)

    target = (g.random(size=(3, 12)) > 0.7).astype(np.float32)
    rloss = MultiLabelClsLoss()(rout, torch.from_numpy(target))
    ours_loss = jcpt.multi_label_loss(ours, jnp.asarray(target))
    np.testing.assert_allclose(float(ours_loss), float(rloss), atol=1e-5)

    _, top_idx, _ = jcpt.sample(params, jnp.asarray(feats), 5)
    with torch.no_grad():
        _, ref_concepts, _ = ref.sample(torch.from_numpy(feats), 5)
    for row, ref_row in zip(np.asarray(top_idx), ref_concepts):
        assert [cpts[i] for i in row] == ref_row


def test_sent_senti_cls_parity():
    from models.sent_senti_cls import SentenceSentimentClassifier
    torch.manual_seed(3)
    ref = SentenceSentimentClassifier(IDX2WORD, SENTI_CATS, ref_settings())
    ref.eval()
    params = convert.sent_senti_cls_from_torch(ref.state_dict())
    g = np.random.default_rng(6)
    bs, T = 4, 9
    lengths = np.array([9, 7, 5, 3])
    seqs = np.zeros((bs, T), np.int64)
    for i, L in enumerate(lengths):
        seqs[i, :L] = g.integers(4, 34, size=L)
    with torch.no_grad():
        rpred, rw = ref(torch.from_numpy(seqs), list(lengths))
    ours, ow = jcls.forward(params, jnp.asarray(seqs), jnp.asarray(lengths),
                            settings=our_settings())
    np.testing.assert_allclose(np.asarray(ours), rpred.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ow), rw.numpy(), atol=1e-5)


def test_criteria_parity():
    sys.path.insert(0, REF)
    from models.captioner import XECriterion
    from self_critical.utils import RewardCriterion
    g = np.random.default_rng(7)
    bs, T, V = 3, 6, 10
    pred = np.log(g.dirichlet(np.ones(V), size=(bs, T))).astype(np.float32)
    target = g.integers(0, V, size=(bs, T))
    lengths = [6, 4, 2]
    ref = XECriterion()(torch.from_numpy(pred), torch.from_numpy(target),
                        lengths)
    ours = jcap.xe_criterion(jnp.asarray(pred), jnp.asarray(target),
                             jnp.asarray(lengths))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    lp = g.normal(size=(bs, T)).astype(np.float32)
    mask = (np.arange(T)[None] < np.array(lengths)[:, None]).astype(np.float32)
    rew = g.normal(size=(bs, T)).astype(np.float32)
    ref_r = RewardCriterion()(torch.from_numpy(lp), torch.from_numpy(mask),
                              torch.from_numpy(rew))
    ours_r = jcap.reward_criterion(jnp.asarray(lp), jnp.asarray(mask),
                                   jnp.asarray(rew))
    np.testing.assert_allclose(float(ours_r), float(ref_r), rtol=1e-5)


def test_ciderd_parity():
    from self_critical.cider.pyciderevalcap.ciderD.ciderD import CiderD as RefC
    from insenticap_model_tpu.rewards.ciderd import (build_scorer,
                                                     seq_from_ids)
    g = np.random.default_rng(8)
    # corpus of 20 images x 5 refs in id space
    corpus = {}
    for i in range(20):
        corpus[f"img{i}"] = [
            [2] + list(g.integers(4, 20, size=g.integers(3, 10))) + [3]
            for _ in range(5)]
    split = {"train": corpus}
    ours = build_scorer(split, sos=2, eos=3)

    def to_str(ids):
        return " ".join(str(t) for t in seq_from_ids(ids, 2, 3))

    refs_idxs = [[to_str(c) for c in caps] for caps in corpus.values()]
    ref_scorer = RefC(refs=refs_idxs)

    gts, res, gts_ref, res_ref = {}, [], {}, []
    for i in range(6):
        fn = f"img{i}"
        hyp = [2] + list(g.integers(4, 20, size=5)) + [3]
        gts[fn] = [seq_from_ids(c, 2, 3) for c in corpus[fn]]
        res.append({"image_id": fn, "caption": [seq_from_ids(hyp, 2, 3)]})
        gts_ref[fn] = [to_str(c) for c in corpus[fn]]
        res_ref.append({"image_id": fn, "caption": [to_str(hyp)]})
    _, ours_scores = ours.compute_score(gts, res)
    _, ref_scores = ref_scorer.compute_score(gts_ref, res_ref)
    np.testing.assert_allclose(ours_scores, ref_scores, rtol=1e-7)


def test_bleu_parity():
    from self_critical.bleu.bleu import Bleu as RefBleu
    from insenticap_model_tpu.rewards.bleu import Bleu
    g = np.random.default_rng(9)
    gts, res, gts_ref, res_ref = {}, [], {}, []
    for i in range(8):
        fn = f"img{i}"
        refs = [list(g.integers(4, 15, size=g.integers(4, 9)))
                for _ in range(5)]
        hyp = list(g.integers(4, 15, size=6))
        gts[fn] = refs
        res.append({"image_id": fn, "caption": [hyp]})
        gts_ref[fn] = [" ".join(map(str, r)) for r in refs]
        res_ref.append({"image_id": fn,
                        "caption": [" ".join(map(str, hyp))]})
    ours_b, ours_list = Bleu(4).compute_score(gts, res)
    ref_b, ref_list = RefBleu(4).compute_score(gts_ref, res_ref)
    np.testing.assert_allclose(ours_b, ref_b, rtol=1e-8)
    np.testing.assert_allclose(ours_list[3], np.array(ref_list[3]), rtol=1e-8)
