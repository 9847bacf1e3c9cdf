"""Train-step integration tests on the 8-virtual-device CPU mesh: every
stage's jitted step runs with sharded batches, produces finite losses, and
the XE loss decreases over a few steps. Optimizer semantics parity vs torch
(Adam + elementwise grad clamp)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from insenticap_model_tpu.models import captioner as cap
from insenticap_model_tpu.models import concept_detector as cpt_det
from insenticap_model_tpu.models import sent_senti_cls as ss_cls
from insenticap_model_tpu.models import sentiment_detector as senti_det
from insenticap_model_tpu.ops import ciderd_device
from insenticap_model_tpu.parallel import mesh as pmesh
from insenticap_model_tpu.rewards.ciderd import build_scorer
from insenticap_model_tpu.training import optim, steps

IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
V = 40
MAXLEN = 8


def _cap_batch(g, bs, settings):
    caps = np.zeros((bs, MAXLEN + 1), np.int32)
    lengths = []
    for i in range(bs):
        L = int(g.integers(3, MAXLEN + 1))
        caps[i, 0] = IDS.sos
        caps[i, 1:L] = g.integers(4, V, size=L - 1)
        caps[i, L] = IDS.eos
        lengths.append(L)  # len-1 semantics: L+1 tokens -> length L
    return {
        "fc": g.normal(size=(bs, settings.fc_feat_dim)).astype(np.float32),
        "att": g.normal(size=(bs, 9, settings.att_feat_dim)).astype(
            np.float32),
        "caps": caps,
        "lengths": np.asarray(lengths, np.int32),
        "cpts": g.integers(4, V, size=(bs, 5)).astype(np.int32),
    }


def _scs_batch(g, bs, settings):
    b = _cap_batch(g, bs, settings)
    return {
        "caps": b["caps"], "lengths": b["lengths"], "cpts": b["cpts"],
        "sentis": g.integers(4, V, size=(bs, 6)).astype(np.int32),
        "senti_labels": g.integers(0, 3, size=(bs,)).astype(np.int32),
    }


def test_adam_clamp_matches_torch():
    g = np.random.default_rng(0)
    w0 = g.normal(size=(4, 3)).astype(np.float32)
    grads = [g.normal(size=(4, 3)).astype(np.float32) * 3 for _ in range(5)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=1e-3)
    for gr in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(gr.copy())
        tw.grad.data.clamp_(-0.1, 0.1)
        topt.step()

    tx = optim.make_optimizer(1e-3, grad_clip=0.1)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for gr in grads:
        params, state = optim.apply_updates(params, {"w": jnp.asarray(gr)},
                                            state, tx)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), atol=1e-6)


def test_lr_mutation():
    tx = optim.make_optimizer(4e-4)
    state = tx.init({"w": jnp.zeros(3)})
    assert optim.get_lr(state) == pytest.approx(4e-4)
    state = optim.set_lr(state, 2e-4)
    assert optim.get_lr(state) == pytest.approx(2e-4)


def test_xe_train_step_decreases_loss(settings):
    g = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)
    params = cap.init_params(key, V, 3, settings)
    cls_params = ss_cls.init_params(jax.random.PRNGKey(1), V, 3, settings)
    tx = optim.make_optimizer(1e-3)
    opt_state = tx.init(params)
    train_step, eval_step = steps.make_xe_steps(settings, tx)

    m = pmesh.make_mesh((8,))
    params = pmesh.replicate(m, params)
    cls_params = pmesh.replicate(m, cls_params)

    batch = _cap_batch(g, 16, settings)
    scs = _scs_batch(g, 16, settings)
    sbatch = pmesh.shard_batch(m, batch)
    sscs = pmesh.shard_batch(m, scs)

    losses0 = None
    for i in range(8):
        params, opt_state, losses = train_step(
            params, opt_state, cls_params, sbatch, sscs,
            jax.random.PRNGKey(i), jnp.float32(0.1))
        if losses0 is None:
            losses0 = {k: float(v) for k, v in losses.items()}
    assert all(np.isfinite(list(losses0.values())))
    assert float(losses["all_loss"]) < losses0["all_loss"]

    ev = eval_step(params, cls_params, sbatch, jax.random.PRNGKey(99))
    assert np.isfinite(float(ev["all_loss"]))


def _tiny_cider_tables(g, fns):
    corpus = {fn: [[IDS.sos] + list(map(int, g.integers(4, V, size=5)))
                   + [IDS.eos] for _ in range(3)] for fn in fns}
    scorer = build_scorer({"train": corpus}, IDS.sos, IDS.eos)
    tables, fn2row = ciderd_device.build_tables(
        scorer, corpus, list(fns), MAXLEN, IDS.sos, IDS.eos)
    return tables, fn2row, corpus


def test_rl_steps(settings):
    g = np.random.default_rng(2)
    bs = 8
    fns = [f"img{i}" for i in range(bs)]
    tables, fn2row, corpus = _tiny_cider_tables(g, fns)

    params = cap.init_params(jax.random.PRNGKey(0), V, 3, settings)
    frozen = steps.RLModels(
        senti_detector=senti_det.init_params(jax.random.PRNGKey(1), 3,
                                             settings),
        sent_senti_cls=ss_cls.init_params(jax.random.PRNGKey(2), V, 3,
                                          settings))
    tx = optim.make_optimizer(4e-5)
    opt_state = tx.init(params)
    rl = steps.make_rl_steps(settings, tx, IDS, MAXLEN, tables)

    batch = _cap_batch(g, bs, settings)
    batch["att"] = g.normal(
        size=(bs, 14, 14, settings.att_feat_dim)).astype(np.float32)
    batch["sentis"] = g.integers(4, V, size=(bs, 6)).astype(np.int32)
    batch["img_rows"] = np.asarray([fn2row[fn] for fn in fns], np.int32)
    scs = _scs_batch(g, bs, settings)

    fact_in = {k: v for k, v in batch.items()
               if k in ("fc", "att", "caps", "lengths", "cpts", "sentis",
                        "img_rows")}
    params2, opt_state, losses = rl[("fact", True)](
        params, opt_state, frozen, fact_in, scs, jax.random.PRNGKey(3))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert {"cap_loss", "da_loss", "xe_loss", "seq2seq_loss", "fact_reward",
            "cls_reward", "all_rewards"} <= set(losses)

    senti_in = {"fc": batch["fc"], "att": batch["att"],
                "cpts": batch["cpts"], "sentis": batch["sentis"],
                "senti_labels": np.asarray(
                    np.random.default_rng(5).integers(0, 3, size=(bs,)),
                    np.int32)}
    params3, opt_state, losses_s = rl[("senti", True)](
        params2, opt_state, frozen, senti_in, scs, jax.random.PRNGKey(4))
    assert np.isfinite(float(losses_s["cap_loss"]))
    assert "fact_reward" not in losses_s and "xe_loss" not in losses_s

    ev = rl[("fact", False)](params3, frozen, fact_in, jax.random.PRNGKey(5))
    assert np.isfinite(float(ev["cap_loss"]))


def test_head_steps(settings):
    g = np.random.default_rng(3)
    bs, n_cpts = 16, 12
    tx = optim.make_optimizer(4e-4)

    p = cpt_det.init_params(jax.random.PRNGKey(0), n_cpts, settings)
    st = tx.init(p)
    tr, ev = steps.make_concept_steps(settings, tx)
    batch = {"fc": g.normal(size=(bs, settings.fc_feat_dim)).astype(
        np.float32),
        "cpts": (g.random(size=(bs, n_cpts)) > 0.8).astype(np.float32)}
    l0 = None
    for i in range(5):
        p, st, loss = tr(p, st, batch, jax.random.PRNGKey(i))
        l0 = l0 or float(loss)
    assert float(loss) < l0
    loss, out = ev(p, batch)
    assert out.shape == (bs, n_cpts)

    p = senti_det.init_params(jax.random.PRNGKey(1), 3, settings)
    st = tx.init(p)
    tr, ev = steps.make_senti_steps(settings, tx)
    batch = {"att": g.normal(size=(bs, 14, 14, settings.att_feat_dim)).astype(
        np.float32),
        "labels": g.integers(0, 3, size=(bs,)).astype(np.int32)}
    for i in range(3):
        p, st, loss = tr(p, st, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(loss))
    loss, labels = ev(p, batch)
    assert labels.shape == (bs,)

    p = ss_cls.init_params(jax.random.PRNGKey(2), V, 3, settings)
    st = tx.init(p)
    tr, ev = steps.make_cls_steps(settings, tx)
    batch = {"caps": g.integers(4, V, size=(bs, MAXLEN)).astype(np.int32),
             "lengths": g.integers(2, MAXLEN, size=(bs,)).astype(np.int32),
             "labels": g.integers(0, 3, size=(bs,)).astype(np.int32)}
    l0 = None
    for i in range(5):
        p, st, loss = tr(p, st, batch, jax.random.PRNGKey(i))
        l0 = l0 or float(loss)
    assert float(loss) < l0
