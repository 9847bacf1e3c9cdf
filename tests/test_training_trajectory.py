"""Training-trajectory equivalence against the torch reference.

Forward parity (test_reference_parity.py) proves the models agree; these
tests prove the TRAINING dynamics agree: starting from converted identical
weights, N reference optimizer steps (Adam + elementwise grad clamp,
train_xe.py:19-23,188-192) and N steps of steps.make_xe_steps on the same
fixture produce matching per-step loss trajectories and matching final
parameters — and one RL-style step with a deterministic (greedy) rollout
matches gradients through the RewardCriterion path
(self_critical/utils.py:169-177, decoder.py:52-180).

Dropout is disabled (dropout_p=0) and ss_prob=0 so both sides are
deterministic; remaining differences are pure float accumulation order.
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
from insenticap_model_tpu.models import captioner as jcap  # noqa: E402
from insenticap_model_tpu.training import optim, steps  # noqa: E402

SENTI_CATS = ["positive", "negative", "neutral"]
IDX2WORD = ["<PAD>", "<UNK>", "<SOS>", "<EOS>"] + [f"w{i}" for i in range(30)]
V = len(IDX2WORD)
IDS = jcap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
LR = 1e-3
GRAD_CLIP = 0.1  # reference opts.py:63


def ref_settings():
    return {
        "word_emb_dim": 16, "fc_feat_dim": 24, "att_feat_dim": 24,
        "feat_emb_dim": 16, "dropout_p": 0.0, "rnn_hid_dim": 16,
        "att_hid_dim": 16, "concept_mid_him": 20,
        "sentiment_convs_num": 2, "sentiment_fcs_num": 2,
    }


def our_settings():
    return Settings(word_emb_dim=16, fc_feat_dim=24, att_feat_dim=24,
                    feat_emb_dim=16, dropout_p=0.0, rnn_hid_dim=16,
                    att_hid_dim=16, concept_mid_dim=20)


def _caps(g, bs, Lmax):
    """Padded caption batch whose longest row spans the full width, so the
    reference XECriterion mask (width max(lengths)) matches pred width."""
    caps = np.zeros((bs, Lmax + 1), np.int64)
    lengths = []
    for i in range(bs):
        L = Lmax if i == 0 else int(g.integers(3, Lmax + 1))
        caps[i, 0] = IDS.sos
        caps[i, 1:L] = g.integers(4, V, size=L - 1)
        caps[i, L] = IDS.eos
        lengths.append(L)
    return caps, lengths


def _clip(optimizer):
    """Reference clip_gradient (train_xe.py:19-23): elementwise clamp."""
    for group in optimizer.param_groups:
        for p in group["params"]:
            if p.grad is not None:
                p.grad.data.clamp_(-GRAD_CLIP, GRAD_CLIP)


def _tree_max_diff(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
               for x, y in zip(fa, fb))


@pytest.mark.slow  # multi-step torch-reference trajectory (r5 re-tier)
def test_xe_training_trajectory_matches_reference():
    from models.captioner import Captioner
    from models.sent_senti_cls import SentenceSentimentClassifier

    torch.manual_seed(5)
    rcap = Captioner(IDX2WORD, SENTI_CATS, ref_settings())
    rcls = SentenceSentimentClassifier(IDX2WORD, SENTI_CATS,
                                       ref_settings()).eval()
    jp = convert.captioner_from_torch(rcap.state_dict())
    jcls_p = convert.sent_senti_cls_from_torch(rcls.state_dict())
    s = our_settings()

    g = np.random.default_rng(7)
    bs, N, Lmax, M = 4, 9, 7, 6
    fc = g.normal(size=(bs, 24)).astype(np.float32)
    att = g.normal(size=(bs, N, 24)).astype(np.float32)
    cpts = g.integers(4, V, size=(bs, 5))
    caps, lengths = _caps(g, bs, Lmax)
    s_caps, s_lengths = _caps(g, bs, Lmax)
    s_cpts = g.integers(4, V, size=(bs, 5))
    s_sentis = g.integers(4, V, size=(bs, M))
    s_labels = g.integers(0, 3, size=(bs,))

    # ---- reference: N steps of the train_xe.py:144-196 inner loop
    optimizer, xe_crit, da_crit = rcap.get_optim_criterion(LR)
    t = {k: torch.from_numpy(v) for k, v in {
        "fc": fc, "att": att, "cpts": cpts, "caps": caps,
        "s_caps": s_caps, "s_cpts": s_cpts, "s_sentis": s_sentis,
        "s_labels": s_labels}.items()}
    ref_traj = []
    n_steps = 5
    for _ in range(n_steps):
        rcap.train(True)
        with torch.no_grad():
            logits, _ = rcls(t["caps"][:, 1:], lengths)
            labels = logits.softmax(dim=-1).argmax(dim=-1).detach()
        pred = rcap(t["fc"], t["att"], t["cpts"], t["caps"], labels,
                    0.0, mode="xe")
        xe_loss = xe_crit(pred, t["caps"][:, 1:], lengths)
        da_loss = da_crit(rcap.cpt_feats, rcap.fc_feats.detach())
        pred2 = rcap(t["s_caps"], t["s_cpts"], t["s_sentis"], t["s_labels"],
                     0.0, mode="seq2seq")
        s2s = xe_crit(pred2, t["s_caps"][:, 1:], s_lengths)
        all_loss = xe_loss + da_loss + s2s
        optimizer.zero_grad()
        all_loss.backward()
        _clip(optimizer)
        optimizer.step()
        ref_traj.append({"xe_loss": xe_loss.item(), "da_loss": da_loss.item(),
                         "seq2seq_loss": s2s.item(),
                         "all_loss": all_loss.item()})

    # ---- ours: N steps of the jitted XE train step on the same fixture
    tx = optim.make_optimizer(LR, GRAD_CLIP)
    train_step, _ = steps.make_xe_steps(s, tx)
    opt_state = tx.init(jp)
    batch = {"fc": fc, "att": att,
             "caps": caps.astype(np.int32),
             "lengths": np.asarray(lengths, np.int32),
             "cpts": cpts.astype(np.int32)}
    scs = {"caps": s_caps.astype(np.int32),
           "lengths": np.asarray(s_lengths, np.int32),
           "cpts": s_cpts.astype(np.int32),
           "sentis": s_sentis.astype(np.int32),
           "senti_labels": s_labels.astype(np.int32)}
    our_traj = []
    for i in range(n_steps):
        jp, opt_state, losses = train_step(jp, opt_state, jcls_p, batch, scs,
                                           jax.random.PRNGKey(i),
                                           jnp.float32(0.0))
        our_traj.append({k: float(v) for k, v in losses.items()})

    for i, (r, o) in enumerate(zip(ref_traj, our_traj)):
        for k in r:
            assert o[k] == pytest.approx(r[k], rel=2e-3, abs=2e-4), (i, k)

    # final parameters agree (documents the drift bound after 5 Adam steps;
    # near-zero grads can flip the Adam update sign, bounded by 2*lr/step)
    ref_final = convert.captioner_from_torch(rcap.state_dict())
    assert _tree_max_diff(jp, ref_final) < 2 * LR * n_steps


@pytest.mark.slow  # multi-model torch-reference parity (r5 re-tier)
def test_rl_step_matches_reference_fixed_rollout():
    """One RL-style optimizer step with a deterministic greedy rollout and
    a fixed external reward tensor: the RewardCriterion + domain-alignment
    gradient path must match the reference's (decoder.py:86-128 with the
    rollout held fixed)."""
    from models.captioner import Captioner
    from self_critical.utils import RewardCriterion

    torch.manual_seed(6)
    rcap = Captioner(IDX2WORD, SENTI_CATS, ref_settings())
    jp = convert.captioner_from_torch(rcap.state_dict())
    s = our_settings()

    g = np.random.default_rng(9)
    bs, N, M, T = 4, 9, 6, 10
    fc = g.normal(size=(bs, 24)).astype(np.float32)
    att = g.normal(size=(bs, N, 24)).astype(np.float32)
    cpts = g.integers(4, V, size=(bs, 5))
    sentis = g.integers(4, V, size=(bs, M))
    labels = g.integers(0, 3, size=(bs,))
    rewards = g.normal(size=(bs, T)).astype(np.float32)

    # ---- reference
    rcap.train(True)
    crit = RewardCriterion()
    da_crit = torch.nn.MSELoss()
    optimizer = torch.optim.Adam(rcap.parameters(), lr=LR)
    seq, lp, mask = rcap(torch.from_numpy(fc), torch.from_numpy(att),
                         torch.from_numpy(cpts), torch.from_numpy(sentis),
                         torch.from_numpy(labels), T, sample_max=1,
                         mode="rl")
    Tr = seq.shape[1]
    rl_loss = crit(lp, mask, torch.from_numpy(rewards[:, :Tr]))
    da_loss = da_crit(rcap.cpt_feats, rcap.fc_feats.detach())
    loss = rl_loss + da_loss
    optimizer.zero_grad()
    loss.backward()
    _clip(optimizer)
    optimizer.step()

    # ---- ours
    def loss_fn(p):
        jseq, jlp, jmask, aux = jcap.forward_rl(
            p, jnp.asarray(fc), jnp.asarray(att), jnp.asarray(cpts),
            jnp.asarray(sentis), jnp.asarray(labels), settings=s, ids=IDS,
            max_seq_len=T, sample_max=True, rng=jax.random.PRNGKey(0),
            deterministic=True)
        rl = jcap.reward_criterion(jlp, jmask, jnp.asarray(rewards))
        da = jcap.domain_alignment_loss(aux["cpt_feats"], aux["fc_emb"])
        return rl + da, (rl, da)

    (total, (rl, da)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(jp)
    assert float(rl) == pytest.approx(float(rl_loss), rel=1e-3, abs=1e-4)
    assert float(da) == pytest.approx(float(da_loss), rel=1e-3, abs=1e-5)
    tx = optim.make_optimizer(LR, GRAD_CLIP)
    jp2, _ = optim.apply_updates(jp, grads, tx.init(jp), tx)
    ref_after = convert.captioner_from_torch(rcap.state_dict())
    assert _tree_max_diff(jp2, ref_after) < 2 * LR


def test_concept_detector_training_trajectory():
    """N steps of the reference train_cpt loop (Adam + clamp +
    MultiLabelClsLoss, train_cpt.py:78-90) vs steps.make_concept_steps
    from converted identical weights."""
    from models.concept_detector import ConceptDetector

    torch.manual_seed(7)
    n_cpts = 12
    ref = ConceptDetector([f"c{i}" for i in range(n_cpts)], ref_settings())
    jp = convert.concept_detector_from_torch(ref.state_dict())

    g = np.random.default_rng(12)
    bs = 6
    fc = g.normal(size=(bs, 24)).astype(np.float32)
    cpts = (g.random(size=(bs, n_cpts)) > 0.7).astype(np.float32)

    optimizer, criterion = ref.get_optim_criterion(LR)
    ref.train(True)
    tfc, tcpts = torch.from_numpy(fc), torch.from_numpy(cpts)
    ref_traj = []
    n_steps = 5
    for _ in range(n_steps):
        loss = criterion(ref(tfc), tcpts)
        optimizer.zero_grad()
        loss.backward()
        _clip(optimizer)
        optimizer.step()
        ref_traj.append(loss.item())

    from insenticap_model_tpu.training import steps as jsteps
    tx = optim.make_optimizer(LR, GRAD_CLIP)
    train_step, _ = jsteps.make_concept_steps(our_settings(), tx)
    st = tx.init(jp)
    batch = {"fc": jnp.asarray(fc), "cpts": jnp.asarray(cpts)}
    for i in range(n_steps):
        jp, st, loss = train_step(jp, st, batch, jax.random.PRNGKey(i))
        assert float(loss) == pytest.approx(ref_traj[i], rel=2e-3,
                                            abs=2e-4), i
    ref_final = convert.concept_detector_from_torch(ref.state_dict())
    assert _tree_max_diff(jp, ref_final) < 2 * LR * n_steps


def test_sentiment_detector_training_trajectory():
    """N steps of the reference train_senti loop (Adam + clamp + CE,
    train_senti.py:70-84) vs steps.make_senti_steps."""
    from models.sentiment_detector import SentimentDetector

    torch.manual_seed(8)
    ref = SentimentDetector(SENTI_CATS, ref_settings())
    jp = convert.sentiment_detector_from_torch(ref.state_dict())

    g = np.random.default_rng(13)
    bs = 6
    att = g.normal(size=(bs, 14, 14, 24)).astype(np.float32)
    labels = g.integers(0, 3, size=(bs,))

    optimizer, criterion = ref.get_optim_criterion(LR)
    ref.train(True)
    tatt = torch.from_numpy(att)
    tlab = torch.from_numpy(labels)
    ref_traj = []
    n_steps = 5
    for _ in range(n_steps):
        pred, _ = ref(tatt)
        loss = criterion(pred, tlab)
        optimizer.zero_grad()
        loss.backward()
        _clip(optimizer)
        optimizer.step()
        ref_traj.append(loss.item())

    from insenticap_model_tpu.training import steps as jsteps
    tx = optim.make_optimizer(LR, GRAD_CLIP)
    train_step, _ = jsteps.make_senti_steps(our_settings(), tx)
    st = tx.init(jp)
    batch = {"att": jnp.asarray(att),
             "labels": jnp.asarray(labels.astype(np.int32))}
    for i in range(n_steps):
        jp, st, loss = train_step(jp, st, batch, jax.random.PRNGKey(i))
        assert float(loss) == pytest.approx(ref_traj[i], rel=2e-3,
                                            abs=2e-4), i
    ref_final = convert.sentiment_detector_from_torch(ref.state_dict())
    assert _tree_max_diff(jp, ref_final) < 2 * LR * n_steps


def test_sent_senti_cls_training_trajectory():
    """N steps of the reference train_sent_senti_cls_rnn loop (Adam +
    clamp + CE, train_sent_senti_cls_rnn.py:114-125) vs
    steps.make_cls_steps (packed-LSTM semantics under scan)."""
    from models.sent_senti_cls import SentenceSentimentClassifier

    torch.manual_seed(9)
    ref = SentenceSentimentClassifier(IDX2WORD, SENTI_CATS, ref_settings())
    jp = convert.sent_senti_cls_from_torch(ref.state_dict())

    g = np.random.default_rng(14)
    bs, T = 6, 9
    lengths = np.asarray([9, 8, 7, 5, 4, 3])
    caps = np.zeros((bs, T), np.int64)
    for i, L in enumerate(lengths):
        caps[i, :L] = g.integers(4, V, size=L)
    labels = g.integers(0, 3, size=(bs,))

    optimizer, criterion = ref.get_optim_and_crit(LR)
    ref.train(True)
    tcaps, tlab = torch.from_numpy(caps), torch.from_numpy(labels)
    ref_traj = []
    n_steps = 5
    for _ in range(n_steps):
        pred, _ = ref(tcaps, list(lengths))
        loss = criterion(pred, tlab)
        optimizer.zero_grad()
        loss.backward()
        _clip(optimizer)
        optimizer.step()
        ref_traj.append(loss.item())

    from insenticap_model_tpu.training import steps as jsteps
    tx = optim.make_optimizer(LR, GRAD_CLIP)
    train_step, _ = jsteps.make_cls_steps(our_settings(), tx)
    st = tx.init(jp)
    batch = {"caps": jnp.asarray(caps.astype(np.int32)),
             "lengths": jnp.asarray(lengths.astype(np.int32)),
             "labels": jnp.asarray(labels.astype(np.int32))}
    for i in range(n_steps):
        jp, st, loss = train_step(jp, st, batch, jax.random.PRNGKey(i))
        assert float(loss) == pytest.approx(ref_traj[i], rel=2e-3,
                                            abs=2e-4), i
    ref_final = convert.sent_senti_cls_from_torch(ref.state_dict())
    assert _tree_max_diff(jp, ref_final) < 2 * LR * n_steps
