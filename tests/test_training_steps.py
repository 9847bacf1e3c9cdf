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

    sums, cnts = eval_step(params, cls_params, sbatch,
                           jax.random.PRNGKey(99))
    assert np.isfinite(float(sums["xe_loss"]) / float(cnts["xe_loss"]))


def test_xe_eval_invariant_to_batch_boundaries(settings):
    """Aggregated val loss must be identical whether the split size divides
    the batch size or not (padded duplicate rows contribute nothing) —
    the reference-style per-batch average double-counted the repeated last
    item and that bias fed the lr-plateau decision."""
    g = np.random.default_rng(11)
    N = 10
    full = _cap_batch(g, N, settings)
    params = cap.init_params(jax.random.PRNGKey(0), V, 3, settings)
    cls_params = ss_cls.init_params(jax.random.PRNGKey(1), V, 3, settings)
    tx = optim.make_optimizer(1e-3)
    _, eval_step = steps.make_xe_steps(settings, tx)

    def val_loss(bs):
        sums, cnts = {}, {}
        for s in range(0, N, bs):
            rows = list(range(s, min(s + bs, N)))
            valid = len(rows)
            rows = rows + [rows[-1]] * (bs - valid)  # loader-style padding
            b = {k: v[rows] for k, v in full.items()}
            b["valid"] = np.int32(valid)
            bs_sums, bs_cnts = eval_step(params, cls_params, b,
                                         jax.random.PRNGKey(0))
            for k in bs_sums:
                sums[k] = sums.get(k, 0.0) + float(bs_sums[k])
                cnts[k] = cnts.get(k, 0.0) + float(bs_cnts[k])
        return {k: sums[k] / cnts[k] for k in sums}

    a, b_, c = val_loss(4), val_loss(5), val_loss(10)
    for k in a:
        assert a[k] == pytest.approx(b_[k], rel=1e-5), k
        assert a[k] == pytest.approx(c[k], rel=1e-5), k


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

    sums, cnts = rl[("fact", False)](params3, frozen, fact_in,
                                     jax.random.PRNGKey(5))
    assert np.isfinite(float(sums["cap_loss"]) / float(cnts["cap_loss"]))

    # padding rows must not leak into the eval aggregates: same shapes and
    # key, scrambled content in the invalid tail row -> identical sums
    valid = bs - 1
    a = dict(fact_in)
    a["valid"] = np.int32(valid)
    b2 = {k: v.copy() for k, v in fact_in.items()}
    g2 = np.random.default_rng(99)
    b2["fc"][-1] = g2.normal(size=b2["fc"][-1].shape).astype(np.float32)
    b2["att"][-1] = g2.normal(size=b2["att"][-1].shape).astype(np.float32)
    b2["caps"][-1] = 0
    b2["caps"][-1, 0], b2["caps"][-1, 1:4] = IDS.sos, [5, 6, IDS.eos]
    b2["lengths"][-1] = 3
    b2["valid"] = np.int32(valid)
    sa, ca = rl[("fact", False)](params3, frozen, a, jax.random.PRNGKey(7))
    sb, cb = rl[("fact", False)](params3, frozen, b2, jax.random.PRNGKey(7))
    for k in sa:
        assert float(sb[k]) == pytest.approx(float(sa[k]), rel=1e-5,
                                             abs=1e-7), k
        assert float(cb[k]) == pytest.approx(float(ca[k])), k


@pytest.mark.slow  # knob quantification, not a core gate (r5 re-tier)
def test_rl_detector_bf16_labels(settings):
    """The RL step routes the frozen sentiment detector by the STAGED
    dtype of its params (steps.py _forward): bf16-staged params engage
    the serving-grade conv stack (pallas Winograd on TPU, bf16 direct
    elsewhere) while training numerics stay f32. Verifies (a) the step
    executes end-to-end with bf16 frozen params, (b) label agreement
    with f32 at the production threshold is exact on this batch, and
    (c) the raw-argmax (threshold 0) flip rate is small — bf16 can only
    flip near-tie rows."""
    g = np.random.default_rng(11)
    bs = 8
    fns = [f"img{i}" for i in range(bs)]
    tables, fn2row, _ = _tiny_cider_tables(g, fns)
    params = cap.init_params(jax.random.PRNGKey(0), V, 3, settings)
    det_f32 = senti_det.init_params(jax.random.PRNGKey(1), 3, settings)
    det_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), det_f32)
    cls_params = ss_cls.init_params(jax.random.PRNGKey(2), V, 3, settings)

    batch = _cap_batch(g, bs, settings)
    batch["att"] = g.normal(
        size=(bs, 14, 14, settings.att_feat_dim)).astype(np.float32)
    batch["sentis"] = g.integers(4, V, size=(bs, 6)).astype(np.int32)
    batch["img_rows"] = np.asarray([fn2row[fn] for fn in fns], np.int32)
    scs = _scs_batch(g, bs, settings)

    # (b)+(c): label parity straight off the detector (same math the step
    # traces). Production threshold first, then raw argmax (thr=0).
    att = jnp.asarray(batch["att"])
    lab32 = np.asarray(senti_det.sample(det_f32, att, 0.7, IDS.neutral)[0])
    lab16 = np.asarray(senti_det.sample(
        det_bf16, att.astype(jnp.bfloat16), 0.7, IDS.neutral)[0])
    np.testing.assert_array_equal(lab32, lab16)
    arg32 = np.asarray(senti_det.sample(det_f32, att, 0.0, IDS.neutral)[0])
    arg16 = np.asarray(senti_det.sample(
        det_bf16, att.astype(jnp.bfloat16), 0.0, IDS.neutral)[0])
    assert (arg32 == arg16).mean() >= 0.75  # near-tie rows only

    # (a): the full jitted RL fact step runs with bf16 frozen detector
    tx = optim.make_optimizer(4e-5)
    rl = steps.make_rl_steps(settings, tx, IDS, MAXLEN, tables)
    frozen = steps.RLModels(senti_detector=det_bf16,
                            sent_senti_cls=cls_params)
    fact_in = {k: batch[k] for k in ("fc", "att", "caps", "lengths",
                                     "cpts", "sentis", "img_rows")}
    _, _, losses = rl[("fact", True)](params, tx.init(params), frozen,
                                      fact_in, scs, jax.random.PRNGKey(3))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def _tree_allclose(a, b, rtol=5e-3, atol=1e-4):
    # tolerance covers reduction-order drift amplified by the LSTM scan and
    # Adam's rsqrt; a wrong-axis mean/psum is off by O(n_devices), far above
    fa, ta = jax.tree_util.tree_flatten(a)
    fb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.mark.slow
def test_sharded_matches_single_device(settings):
    """One XE step and one RL step with identical inputs/keys on an (8,)
    mesh vs a (1,) mesh: losses AND updated params must agree up to
    reduction order. This is the check that catches a wrong-axis mean/psum
    (finite losses alone would not)."""
    g = np.random.default_rng(7)
    bs = 8
    fns = [f"img{i}" for i in range(bs)]
    tables, fn2row, _ = _tiny_cider_tables(g, fns)

    tx = optim.make_optimizer(1e-3)
    xe_train, _ = steps.make_xe_steps(settings, tx)
    rl = steps.make_rl_steps(settings, tx, IDS, MAXLEN, tables)

    batch = _cap_batch(g, bs, settings)
    batch["att"] = g.normal(
        size=(bs, 14, 14, settings.att_feat_dim)).astype(np.float32)
    batch["sentis"] = g.integers(4, V, size=(bs, 6)).astype(np.int32)
    batch["img_rows"] = np.asarray([fn2row[fn] for fn in fns], np.int32)
    scs = _scs_batch(g, bs, settings)

    def run(mesh_shape):
        m = pmesh.make_mesh(mesh_shape)
        # fresh params per mesh: the train steps donate their inputs
        params = pmesh.replicate(m, cap.init_params(
            jax.random.PRNGKey(0), V, 3, settings))
        cls_params = pmesh.replicate(m, ss_cls.init_params(
            jax.random.PRNGKey(1), V, 3, settings))
        senti_params = pmesh.replicate(m, senti_det.init_params(
            jax.random.PRNGKey(2), 3, settings))
        opt_state = pmesh.replicate(m, tx.init(params))
        sb, sscs = pmesh.shard_batch(m, batch), pmesh.shard_batch(m, scs)
        p2, opt_state, xe_losses = xe_train(
            params, opt_state, cls_params, sb, sscs, jax.random.PRNGKey(3),
            jnp.float32(0.1))
        frozen = steps.RLModels(senti_detector=senti_params,
                                sent_senti_cls=cls_params)
        opt2 = pmesh.replicate(m, tx.init(p2))
        p3, _, rl_losses = rl[("fact", True)](p2, opt2, frozen, sb, sscs,
                                              jax.random.PRNGKey(4))
        return xe_losses, rl_losses, p3

    xe8, rl8, p8 = run((8,))
    xe1, rl1, p1 = run((1,))
    _tree_allclose(xe8, xe1)
    _tree_allclose(rl8, rl1)
    _tree_allclose(p8, p1)


@pytest.mark.slow
def test_model_sharded_matches_single_device(settings):
    """2-D data x model mesh: the captioner's vocab-dim params (embedding
    + classifier) sharded over the `model` axis, batch over `data`. The
    SAME jitted XE and RL steps (no code changes — GSPMD partitions the
    vocab reductions) must reproduce the (1,)-mesh losses and params, and
    the beam decoder must emit identical tokens."""
    from insenticap_model_tpu import inference
    g = np.random.default_rng(11)
    bs = 8
    fns = [f"img{i}" for i in range(bs)]
    tables, fn2row, _ = _tiny_cider_tables(g, fns)

    tx = optim.make_optimizer(1e-3)
    xe_train, _ = steps.make_xe_steps(settings, tx)
    rl = steps.make_rl_steps(settings, tx, IDS, MAXLEN, tables)
    serve = inference.make_forced_serving_fn(settings, IDS, beam_size=3,
                                             max_seq_len=MAXLEN)

    batch = _cap_batch(g, bs, settings)
    batch["att"] = g.normal(
        size=(bs, 14, 14, settings.att_feat_dim)).astype(np.float32)
    batch["sentis"] = g.integers(4, V, size=(bs, 6)).astype(np.int32)
    batch["img_rows"] = np.asarray([fn2row[fn] for fn in fns], np.int32)
    scs = _scs_batch(g, bs, settings)

    def run(mesh_shape, model_sharded):
        m = pmesh.make_mesh(mesh_shape)  # default axes: (data, model)
        params = cap.init_params(jax.random.PRNGKey(0), V, 3, settings)
        if model_sharded:
            params = pmesh.place(params,
                                 pmesh.captioner_shardings(m, params))
        else:
            params = pmesh.replicate(m, params)
        cls_params = pmesh.replicate(m, ss_cls.init_params(
            jax.random.PRNGKey(1), V, 3, settings))
        senti_params = pmesh.replicate(m, senti_det.init_params(
            jax.random.PRNGKey(2), 3, settings))
        opt_state = tx.init(params)  # zeros_like inherits param shardings
        sb, sscs = pmesh.shard_batch(m, batch), pmesh.shard_batch(m, scs)
        p2, opt_state, xe_losses = xe_train(
            params, opt_state, cls_params, sb, sscs, jax.random.PRNGKey(3),
            jnp.float32(0.1))
        frozen = steps.RLModels(senti_detector=senti_params,
                                sent_senti_cls=cls_params)
        opt2 = tx.init(p2)
        p3, _, rl_losses = rl[("fact", True)](p2, opt2, frozen, sb, sscs,
                                              jax.random.PRNGKey(4))
        labels = pmesh.shard_batch(
            m, {"l": scs["senti_labels"]})["l"]
        seqs, scores = serve(p3, sb["fc"], sb["att"], sb["sentis"], labels)
        return xe_losses, rl_losses, p3, np.asarray(seqs), np.asarray(scores)

    xe2, rl2, p2d, seqs2, scores2 = run((4, 2), True)
    xe1, rl1, p1, seqs1, scores1 = run((1,), False)
    _tree_allclose(xe2, xe1)
    _tree_allclose(rl2, rl1)
    _tree_allclose(p2d, p1)
    np.testing.assert_array_equal(seqs2, seqs1)
    np.testing.assert_allclose(scores2, scores1, rtol=5e-3, atol=1e-4)


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
    loss_sum, cnt, out = ev(p, batch)
    assert out.shape == (bs, n_cpts)
    assert float(cnt) == bs
    # valid masking drops tail rows from both sum and count
    loss_sum2, cnt2, _ = ev(p, {**batch, "valid": np.int32(bs - 4)})
    assert float(cnt2) == bs - 4
    assert float(loss_sum2) < float(loss_sum)

    p = senti_det.init_params(jax.random.PRNGKey(1), 3, settings)
    st = tx.init(p)
    tr, ev = steps.make_senti_steps(settings, tx)
    batch = {"att": g.normal(size=(bs, 14, 14, settings.att_feat_dim)).astype(
        np.float32),
        "labels": g.integers(0, 3, size=(bs,)).astype(np.int32)}
    for i in range(3):
        p, st, loss = tr(p, st, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(loss))
    loss_sum, cnt, labels = ev(p, batch)
    assert labels.shape == (bs,) and float(cnt) == bs

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


def test_senti_steps_full_variant(settings):
    """Settings.num_kernels_per_sentiment > 0 routes train/eval/sample
    through the full detector variant (reference-dead code implemented in
    models/sentiment_detector_full.py) with no trainer changes."""
    import dataclasses
    from insenticap_model_tpu.models import sentiment_detector_full as sdf

    s_full = dataclasses.replace(settings, num_kernels_per_sentiment=2)
    assert senti_det.module_for(s_full) is sdf
    g = np.random.default_rng(9)
    bs = 8
    tx = optim.make_optimizer(4e-4)
    p = sdf.init_params(jax.random.PRNGKey(1), 3, s_full)
    st = tx.init(p)
    tr, ev = steps.make_senti_steps(s_full, tx)
    batch = {"att": g.normal(size=(bs, 14, 14, s_full.att_feat_dim)).astype(
        np.float32),
        "labels": g.integers(0, 3, size=(bs,)).astype(np.int32)}
    l0 = None
    for i in range(8):
        p, st, loss = tr(p, st, batch, jax.random.PRNGKey(i))
        l0 = l0 or float(loss)
    assert np.isfinite(float(loss)) and float(loss) < l0
    loss_sum, cnt, labels = ev(p, batch)
    assert labels.shape == (bs,) and float(cnt) == bs
    assert np.isfinite(float(loss_sum))


def test_runtime_places_captioner_model_sharded(settings):
    """cli/common.Runtime on a (4,2) data x model mesh shards the
    captioner's vocab-dim params + optimizer state and the jitted XE
    step runs on them; on a 1-D mesh everything replicates."""
    from jax.sharding import PartitionSpec as P
    from insenticap_model_tpu.cli.common import Runtime
    from insenticap_model_tpu.config import Opts

    opt = Opts(settings=settings, mesh_shape=(4, 2),
               compute_dtype="float32")
    rt = Runtime(opt)
    assert rt.round_bs(6) == 8  # data axis is 4, not 8

    tx = optim.make_optimizer(1e-3)
    params = cap.init_params(jax.random.PRNGKey(0), V, 3, settings)
    host_opt_state = tx.init(params)
    params = rt.place_captioner(rt.cast(params))
    spec = params["classifier"]["w"].sharding.spec
    assert spec == P(None, "model"), spec
    assert params["word_embed"]["table"].sharding.spec == P("model", None)
    assert params["fc_embed"]["w"].sharding.spec == P()

    opt_state = rt.place_opt_state(host_opt_state, params, tx)
    # the Adam moments must inherit the model sharding (the memory point
    # of tp) — a silent replication fallback here must fail the test
    moment_specs = [
        leaf.sharding.spec for leaf in jax.tree_util.tree_leaves(opt_state)
        if getattr(leaf, "ndim", 0) == 2
        and leaf.shape == params["classifier"]["w"].shape]
    assert moment_specs and all(s == P(None, "model")
                                for s in moment_specs), moment_specs
    cls_params = rt.replicate(ss_cls.init_params(
        jax.random.PRNGKey(1), V, 3, settings))
    g = np.random.default_rng(15)
    batch = _cap_batch(g, 8, settings)
    scs = _scs_batch(g, 8, settings)
    sb, sscs = rt.put(batch), rt.put(scs)
    train_step, _ = steps.make_xe_steps(settings, tx)
    p2, opt_state, losses = train_step(params, opt_state, cls_params, sb,
                                       sscs, jax.random.PRNGKey(2),
                                       jnp.float32(0.0))
    assert np.isfinite(float(losses["all_loss"]))
    # updated params keep the model sharding
    assert p2["classifier"]["w"].sharding.spec == P(None, "model")
