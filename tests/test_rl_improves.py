"""SCST gradient direction: RL fine-tuning from random init must increase
the greedy rollout's CIDEr-D against the ground-truth captions. Guards the
sign/masking of the policy-gradient loss and the on-device reward plumbing
end-to-end (a flipped advantage or mask would still produce finite losses)."""
import numpy as np

import jax
import jax.numpy as jnp

from insenticap_model_tpu.config import Settings
from insenticap_model_tpu.models import captioner as cap
from insenticap_model_tpu.models import sent_senti_cls as ss_cls
from insenticap_model_tpu.models import sentiment_detector as senti_det
from insenticap_model_tpu.ops import ciderd_device
from insenticap_model_tpu.rewards.ciderd import build_scorer
from insenticap_model_tpu.training import optim, steps
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast gate

IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
V = 24
T = 6


def test_rl_increases_greedy_cider():
    settings = Settings(word_emb_dim=16, fc_feat_dim=32, att_feat_dim=32,
                        feat_emb_dim=16, dropout_p=0.0, rnn_hid_dim=16,
                        att_hid_dim=16, concept_mid_dim=24)
    g = np.random.default_rng(0)
    bs = 8
    fns = [f"img{i}" for i in range(bs)]
    gt = {}
    caps = np.zeros((bs, T + 1), np.int32)
    lengths = np.zeros((bs,), np.int32)
    for i in range(bs):
        L = 5
        caps[i, 0] = IDS.sos
        caps[i, 1:L] = 4 + (np.arange(4) + 2 * i) % (V - 4)
        caps[i, L] = IDS.eos
        lengths[i] = L
        gt[fns[i]] = [list(caps[i, :L + 1])] * 3

    scorer = build_scorer({"train": gt}, IDS.sos, IDS.eos)
    tables, fn2row = ciderd_device.build_tables(scorer, gt, fns, T,
                                                IDS.sos, IDS.eos)

    batch = {
        "fc": jnp.asarray(g.normal(size=(bs, settings.fc_feat_dim)),
                          jnp.float32),
        "att": jnp.asarray(g.normal(size=(bs, 4, 4, settings.att_feat_dim)),
                           jnp.float32),
        "caps": jnp.asarray(caps), "lengths": jnp.asarray(lengths),
        "cpts": jnp.zeros((bs, 3), jnp.int32),
        "sentis": jnp.zeros((bs, 2), jnp.int32),
        "img_rows": jnp.asarray([fn2row[f] for f in fns], jnp.int32),
    }

    params = cap.init_params(jax.random.PRNGKey(0), V, 3, settings)
    frozen = steps.RLModels(
        senti_detector=senti_det.init_params(jax.random.PRNGKey(1), 3,
                                             settings),
        sent_senti_cls=ss_cls.init_params(jax.random.PRNGKey(2), V, 3,
                                          settings))
    tx = optim.make_optimizer(2e-3, grad_clip=10.0)
    opt_state = tx.init(params)
    rl = steps.make_rl_steps(settings, tx, IDS, T, tables)

    def greedy_cider(params):
        senti_labels, _, _ = senti_det.sample(frozen.senti_detector,
                                              batch["att"], 0.7, IDS.neutral)
        seq, _, _, _ = cap.forward_rl(
            params, batch["fc"], batch["att"], batch["cpts"],
            batch["sentis"], senti_labels, settings=settings, ids=IDS,
            max_seq_len=T, sample_max=True, rng=jax.random.PRNGKey(0),
            deterministic=True)
        ids_c, lens_c = jax.vmap(
            lambda s: ciderd_device.canonicalize(s, IDS.eos, T + 1))(seq)
        return float(ciderd_device.cider_d(tables, ids_c, lens_c,
                                           batch["img_rows"]).mean())

    before = greedy_cider(params)
    for i in range(120):
        params, opt_state, losses = rl[("fact", True)](
            params, opt_state, frozen, batch, None, jax.random.PRNGKey(i))
    after = greedy_cider(params)
    assert np.isfinite(after)
    assert after > before + 0.5, f"CIDEr-D did not improve: {before} -> {after}"
