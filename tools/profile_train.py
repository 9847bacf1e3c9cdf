"""Per-stage breakdown of the XE and SCST-RL train steps (VERDICT r2
weak #2: serving got a stage profile and a measured dead-end table;
the train steps only had totals).

Each stage runs as its own jitted program at production shapes and is
timed min-of-3 x 20 iterations. Stage numbers INCLUDE the ~1.3 ms
per-call tunnel dispatch floor (CLAUDE.md) — subtract it before
comparing stages to each other or summing against the full step.

    python tools/profile_train.py [xe_bs] [rl_bs]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from insenticap_model_tpu.config import Settings  # noqa: E402
from insenticap_model_tpu.models import captioner as cap  # noqa: E402
from insenticap_model_tpu.models import sent_senti_cls as ss_cls  # noqa: E402
from insenticap_model_tpu.models import sentiment_detector as sd  # noqa: E402
from insenticap_model_tpu.ops import ciderd_device  # noqa: E402
from insenticap_model_tpu.rewards.ciderd import build_scorer  # noqa: E402
from insenticap_model_tpu.training import optim, steps  # noqa: E402

IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
V, T, M = 10000, 16, 10


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def bench(fn, *args, iters=20):
    sync(fn(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def _batch(g, bs, s):
    caps = np.zeros((bs, T + 1), np.int32)
    lengths = np.zeros((bs,), np.int32)
    for i in range(bs):
        L = int(g.integers(6, T + 1))
        caps[i, 0], caps[i, 1:L], caps[i, L] = (
            IDS.sos, g.integers(4, V, size=L - 1), IDS.eos)
        lengths[i] = L
    return {
        "fc": g.normal(size=(bs, s.fc_feat_dim)).astype(np.float32),
        "att": g.normal(size=(bs, 14, 14, s.att_feat_dim)).astype(
            np.float32),
        "caps": caps, "lengths": lengths,
        "cpts": g.integers(4, V, size=(bs, 5)).astype(np.int32),
        "sentis": g.integers(4, V, size=(bs, M)).astype(np.int32),
    }


def main():
    xe_bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rl_bs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    s = Settings()
    g = np.random.default_rng(0)
    key = jax.random.PRNGKey(5)

    params = jax.device_put(cap.init_params(jax.random.PRNGKey(0), V, 3, s))
    cls_params = jax.device_put(
        ss_cls.init_params(jax.random.PRNGKey(1), V, 3, s))
    senti_params = jax.device_put(sd.init_params(jax.random.PRNGKey(2), 3, s))
    stage = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda v: jax.device_put(np.asarray(v)), t)

    print("(stage numbers include the ~1.3 ms dispatch floor)")

    # ---------------- XE ----------------
    b = stage(_batch(g, xe_bs, s))
    scs = dict(b)
    scs["senti_labels"] = jax.device_put(
        g.integers(0, 3, size=(xe_bs,)).astype(np.int32))

    def named(label, fn, *args):
        print(f"  {label:<44} {bench(fn, *args):7.2f} ms")

    print(f"\nXE step stages (bs={xe_bs}):")
    pseudo = jax.jit(lambda caps, lens: steps._pseudo_senti_labels(
        cls_params, caps, lens, s))
    named("pseudo senti labels (frozen ss-cls fwd)", pseudo,
          b["caps"], b["lengths"])
    labels = pseudo(b["caps"], b["lengths"])

    fx = jax.jit(lambda p: cap.forward_xe(
        p, b["fc"], b["att"], b["cpts"], b["caps"], labels, settings=s,
        rng=key, ss_prob=jnp.float32(0.1), deterministic=False)[0].sum())
    named("forward_xe (train mode, fwd only)", fx, params)
    fs = jax.jit(lambda p: cap.forward_seq2seq(
        p, scs["caps"], scs["cpts"], scs["sentis"], scs["senti_labels"],
        settings=s, rng=key, ss_prob=jnp.float32(0.1),
        deterministic=False).sum())
    named("forward_seq2seq (train mode, fwd only)", fs, params)

    tx = optim.make_optimizer(4e-4)
    xe_train, _ = steps.make_xe_steps(s, tx)

    def full_xe():
        # donation-safe: fresh copies per call would hit the host link;
        # chain state instead
        nonlocal p_xe, st_xe
        p_xe, st_xe, losses = xe_train(p_xe, st_xe, cls_params, b, scs,
                                       key, jnp.float32(0.1))
        return losses["all_loss"]

    # donation-isolated copy: the step donates its params/opt_state, and
    # `params` must survive for the RL stages below
    p_xe = jax.tree_util.tree_map(jnp.copy, params)
    st_xe = tx.init(p_xe)
    named("FULL XE train step (grad+adam)", full_xe)

    # ---------------- RL ----------------
    print(f"\nRL fact step stages (bs={rl_bs}):")
    fns = [f"img{i}" for i in range(rl_bs)]
    corpus = {fn: [[IDS.sos] + list(map(int, g.integers(4, V, size=9)))
                   + [IDS.eos] for _ in range(3)] for fn in fns}
    scorer = build_scorer({"train": corpus}, IDS.sos, IDS.eos)
    tables, fn2row = ciderd_device.build_tables(scorer, corpus, fns, T,
                                                IDS.sos, IDS.eos)
    rb = _batch(g, rl_bs, s)
    rb["img_rows"] = np.asarray([fn2row[fn] for fn in fns], np.int32)
    rb = stage(rb)
    rscs = dict(stage(_batch(g, rl_bs, s)))
    rscs["senti_labels"] = jax.device_put(
        g.integers(0, 3, size=(rl_bs,)).astype(np.int32))

    det = jax.jit(lambda a: sd.sample(senti_params, a, 0.7, IDS.neutral)[0])
    named("sentiment detector sample", det, rb["att"])
    senti_labels = det(rb["att"])

    ctxf = jax.jit(lambda p: cap.build_visual_context(
        p, rb["fc"], rb["att"], s.dropout_p, key, False,
        senti_words=rb["sentis"], senti_labels=senti_labels,
        pad_id=IDS.pad)[0].fc.sum())
    named("context build (embeds, train mode)", ctxf, params)

    roll_s = jax.jit(lambda p: cap.forward_rl(
        p, rb["fc"], rb["att"], rb["cpts"], rb["sentis"], senti_labels,
        settings=s, ids=IDS, max_seq_len=T, sample_max=False, rng=key,
        deterministic=False)[1].sum())
    named("sample rollout (fwd only)", roll_s, params)
    roll_g = jax.jit(lambda p: cap.forward_rl(
        p, rb["fc"], rb["att"], rb["cpts"], rb["sentis"], senti_labels,
        settings=s, ids=IDS, max_seq_len=T, sample_max=True, rng=key,
        deterministic=True)[0].sum())
    named("greedy rollout (fwd only)", roll_g, params)

    seq_s = np.asarray(g.integers(4, V, size=(rl_bs, T)), np.int32)
    seq_g = np.asarray(g.integers(4, V, size=(rl_bs, T)), np.int32)
    cid = jax.jit(lambda a, b2: ciderd_device.self_critical_reward(
        tables, a, b2, rb["img_rows"], IDS.eos).sum())
    named("CIDEr-D self-critical reward", cid, seq_s, seq_g)

    masks = jnp.ones((rl_bs, T), jnp.float32)
    clsr = jax.jit(lambda a: steps._cls_reward(
        cls_params, a, masks, senti_labels, s).sum())
    named("cls reward (frozen ss-cls fwd)", clsr, seq_s)

    xe_aux = jax.jit(lambda p: cap.forward_xe(
        p, rb["fc"], rb["att"], rb["cpts"], rb["caps"], senti_labels,
        settings=s, rng=key, ss_prob=jnp.float32(0.5),
        deterministic=False)[0].sum())
    named("xe aux loss (fwd only)", xe_aux, params)
    s2s_aux = jax.jit(lambda p: cap.forward_seq2seq(
        p, rscs["caps"], rscs["cpts"], rscs["sentis"],
        rscs["senti_labels"], settings=s, rng=key,
        ss_prob=jnp.float32(0.25), deterministic=False).sum())
    named("seq2seq aux loss (fwd only)", s2s_aux, params)

    # backward cost of the policy term alone: grad of (sample rollout +
    # reward criterion) with a fixed reward tensor
    fixed_rw = jnp.asarray(g.normal(size=(rl_bs, T)), jnp.float32)

    def pol_loss(p):
        seq, lp, msk, _ = cap.forward_rl(
            p, rb["fc"], rb["att"], rb["cpts"], rb["sentis"], senti_labels,
            settings=s, ids=IDS, max_seq_len=T, sample_max=False, rng=key,
            deterministic=False)
        return cap.reward_criterion(lp, msk, fixed_rw)

    polg = jax.jit(lambda p: jax.tree_util.tree_leaves(
        jax.grad(pol_loss)(p))[0].sum())
    named("sample rollout + criterion (fwd+bwd)", polg, params)

    rl = steps.make_rl_steps(s, tx, IDS, T, tables)
    rl_step = rl[("fact", True)]
    frozen = steps.RLModels(senti_detector=senti_params,
                            sent_senti_cls=cls_params)

    def full_rl():
        nonlocal p_rl, st_rl
        p_rl, st_rl, losses = rl_step(p_rl, st_rl, frozen, rb, rscs, key)
        return losses["cap_loss"]

    p_rl = jax.tree_util.tree_map(jnp.copy, params)
    st_rl = tx.init(p_rl)
    named("FULL RL train step (grad+adam)", full_rl)


if __name__ == "__main__":
    main()
