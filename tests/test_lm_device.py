"""On-device ARPA trigram LM reward: device == host parity and RL-step
integration (the reference's capability-present-default-off LM reward,
/root/reference/train_rl.py:212-216, self_critical/utils.py:86-100)."""
import os
import subprocess

import numpy as np
import pytest

import jax

NATIVE = os.path.join(os.path.dirname(__file__), "..", "native", "build")
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(NATIVE, "isclm")),
    reason="native isclm not built")

V = 40
IDS_EOS, IDS_SOS = 3, 2


@pytest.fixture(scope="module")
def lm_paths(tmp_path_factory):
    """Three tiny id-form trigram LMs trained with isclm, mirroring
    preprocessing.get_lm_sents ({senti}_id.txt -> {senti}_id.sri): lines of
    word ids with the explicit EOS id appended."""
    d = tmp_path_factory.mktemp("lms")
    g = np.random.default_rng(0)
    paths = []
    for s in range(3):
        lines = []
        for _ in range(400):
            L = int(g.integers(3, 9))
            # per-sentiment id band makes the LMs genuinely different
            ids = list(4 + (s * 12 + g.integers(0, 12, size=L)) % (V - 4))
            lines.append(" ".join(map(str, ids + [IDS_EOS])))
        txt = d / f"s{s}_id.txt"
        txt.write_text("\n".join(lines))
        sri = d / f"s{s}_id.sri"
        subprocess.run([os.path.join(NATIVE, "isclm"), "train", str(txt),
                        str(sri)], check=True)
        paths.append(str(sri))
    return paths


def test_device_score_matches_host(lm_paths):
    from insenticap_model_tpu.ops import lm_device
    from insenticap_model_tpu.rewards.rewards import ArpaTrigramLM
    from insenticap_model_tpu.rewards.ciderd import seq_from_ids

    tables = lm_device.build_lm_tables(lm_paths, V)
    lms = [ArpaTrigramLM(p) for p in lm_paths]

    g = np.random.default_rng(1)
    bs, T = 16, 10
    # raw rollout-style sequences: some hit EOS early, some never;
    # includes OOV ids (outside every LM's band)
    seqs = g.integers(4, V, size=(bs, T)).astype(np.int32)
    for i in range(0, bs, 3):
        cut = int(g.integers(2, T))
        seqs[i, cut] = IDS_EOS
        seqs[i, cut + 1:] = 0
    labels = g.integers(0, 3, size=(bs,)).astype(np.int32)

    dev = np.asarray(lm_device.score_batch(tables, seqs, labels, IDS_EOS))
    host = np.array([lms[labels[i]].score(
        seq_from_ids(seqs[i], IDS_SOS, IDS_EOS)) for i in range(bs)])
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-4)


def test_device_reward_matches_host(lm_paths):
    from insenticap_model_tpu.ops import lm_device
    from insenticap_model_tpu.rewards import rewards as rw
    from insenticap_model_tpu.rewards.rewards import ArpaTrigramLM

    tables = lm_device.build_lm_tables(lm_paths, V)
    lms = [ArpaTrigramLM(p) for p in lm_paths]
    g = np.random.default_rng(2)
    bs, T = 12, 8
    sample = g.integers(4, V, size=(bs, T)).astype(np.int32)
    greedy = g.integers(4, V, size=(bs, T)).astype(np.int32)
    labels = g.integers(0, 3, size=(bs,)).astype(np.int32)

    dev = np.asarray(lm_device.lm_reward(tables, sample, greedy, labels,
                                         IDS_EOS))
    host = rw.get_lm_reward(sample, greedy, labels, IDS_SOS, IDS_EOS, lms)
    np.testing.assert_array_equal(dev, host)


@pytest.mark.slow
def test_rl_step_lm_reward_changes_loss(lm_paths, settings):
    """Opt-in knob: with lm_flag > 0 the RL loss/rewards change; with the
    default (no tables) the step signature and numerics are unchanged."""
    from insenticap_model_tpu.models import captioner as cap
    from insenticap_model_tpu.models import sent_senti_cls as ss_cls
    from insenticap_model_tpu.models import sentiment_detector as senti_det
    from insenticap_model_tpu.ops import ciderd_device, lm_device
    from insenticap_model_tpu.rewards.ciderd import build_scorer
    from insenticap_model_tpu.training import optim, steps

    IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
    g = np.random.default_rng(3)
    bs, T = 8, 8
    fns = [f"img{i}" for i in range(bs)]
    corpus = {fn: [[IDS.sos] + list(map(int, g.integers(4, V, size=5)))
                   + [IDS.eos] for _ in range(3)] for fn in fns}
    scorer = build_scorer({"train": corpus}, IDS.sos, IDS.eos)
    tables, fn2row = ciderd_device.build_tables(scorer, corpus, fns, T,
                                                IDS.sos, IDS.eos)
    lm_tables = lm_device.build_lm_tables(lm_paths, V)

    caps = np.zeros((bs, T + 1), np.int32)
    lengths = np.zeros((bs,), np.int32)
    for i in range(bs):
        L = int(g.integers(3, T + 1))
        caps[i, 0], caps[i, 1:L], caps[i, L] = (
            IDS.sos, g.integers(4, V, size=L - 1), IDS.eos)
        lengths[i] = L
    batch = {
        "fc": g.normal(size=(bs, settings.fc_feat_dim)).astype(np.float32),
        "att": g.normal(size=(bs, 14, 14, settings.att_feat_dim)).astype(
            np.float32),
        "caps": caps, "lengths": lengths,
        "cpts": g.integers(4, V, size=(bs, 5)).astype(np.int32),
        "sentis": g.integers(4, V, size=(bs, 6)).astype(np.int32),
        "img_rows": np.asarray([fn2row[fn] for fn in fns], np.int32),
    }

    tx = optim.make_optimizer(4e-5)
    frozen = steps.RLModels(
        senti_detector=senti_det.init_params(jax.random.PRNGKey(1), 3,
                                             settings),
        sent_senti_cls=ss_cls.init_params(jax.random.PRNGKey(2), V, 3,
                                          settings))

    def run(**kw):
        params = cap.init_params(jax.random.PRNGKey(0), V, 3, settings)
        rl = steps.make_rl_steps(settings, tx, IDS, T, tables, **kw)
        _, _, losses = rl[("fact", True)](params, tx.init(params), frozen,
                                          dict(batch), None,
                                          jax.random.PRNGKey(4))
        return {k: float(v) for k, v in losses.items()}

    off = run()
    on = run(lm_tables=lm_tables, lm_flag=0.3)
    assert "lm_reward" not in off
    assert "lm_reward" in on and np.isfinite(on["lm_reward"])
    assert on["all_rewards"] != pytest.approx(off["all_rewards"])
    assert on["cap_loss"] != pytest.approx(off["cap_loss"])
    # the LM term does not disturb the other reward components
    assert on["fact_reward"] == pytest.approx(off["fact_reward"], rel=1e-6)
    assert on["cls_reward"] == pytest.approx(off["cls_reward"], rel=1e-6)
