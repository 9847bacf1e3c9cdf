"""Ablation-bound the TRUE fused e2e cost of each train-step stage.

Completes the ablation trilogy (tools/ablate_encoder.py,
tools/ablate_serving.py): the r3 train profile (tools/profile_train.py)
timed stages as standalone forward jits, which both pays the dispatch
floor per stage and misses each stage's BACKWARD share inside the real
differentiated step. Here each stage of the full jitted train step
(grad + adam, production dims — tools/bench_train.py conditions) swaps
for a shape-preserving stand-in; (baseline - ablated) is the true
end-to-end cost of that stage INCLUDING its autodiff and fusion share.

RL fact-step stand-ins (semantics-breaking on purpose — bounds):
  detector      -> constant labels      (frozen senti-detector forward)
  ciderd        -> zero advantage       (on-device CIDEr-D, both sides)
  cls_reward    -> zeros                (frozen ss-cls forward + gather)
  pseudo_labels -> constant labels      (frozen ss-cls forward on caps)
  greedy        -> zero rollout         (the no-grad baseline rollout)
  xe_aux        -> zero logprobs        (teacher-forced fwd+bwd)
  seq2seq       -> zero logprobs        (text-only fwd+bwd)

XE-step stand-ins (--step xe):
  pseudo_labels -> constant labels
  xe_fwd        -> zero logprobs + zero feats (the teacher-forced
                   scan, fwd+bwd — the step's main compute)
  da            -> zero loss             (domain-alignment MSE)
  seq2seq       -> zero logprobs         (text-only scan, fwd+bwd)

    python tools/ablate_train.py [--step rl|xe|both] [--bs N] [--iters N]

Run on the real chip; timing is pipelined (one sync, CLAUDE.md rules).
Chip record: see DESIGN.md round-4 (train ablation-bounds section).
"""
import argparse
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
from tools.bench_train import _batch  # noqa: E402

IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
V, T, M = 10000, 16, 10


# --- stand-ins --------------------------------------------------------------
# Every stand-in output is tied to a live input through a zero scalar
# (`_opaque`): plain jnp.zeros(...) constants let XLA constant-fold the
# consumers, which reshapes fusion decisions across the whole program —
# the first chip run measured xe_aux at -104% (46.6 vs 22.9 ms baseline)
# from exactly that, an ablation artifact, not a stage cost.

def _opaque(x, shape, dtype=jnp.float32):
    """Zero tensor of `shape` that XLA cannot treat as a constant.

    The zero MUST be formed in float arithmetic: XLA legally folds
    int 0*x to a constant (no NaN/inf to preserve), which disconnects
    the stand-in from the live input for int32 sources (sample_seq,
    caps) — verified by HLO dump. Float 0*x keeps the data dependency
    (x could be NaN/inf), and the final astype of a non-constant zero
    stays live for integer outputs too."""
    z = jnp.zeros((), jnp.float32) * x.reshape(-1)[0].astype(jnp.float32)
    return jnp.broadcast_to(z, shape).astype(dtype)


def _detector_stub(p, att, thr, neutral):
    return (_opaque(att, (att.shape[0],), jnp.int32), None, None)


def _ciderd_stub(tables, sample_seq, greedy_seq, img_rows, eos):
    return _opaque(sample_seq, sample_seq.shape)


def _cls_reward_stub(cls_params, sample_seq, seq_masks, senti_labels,
                     settings):
    return _opaque(seq_masks, seq_masks.shape)


def _pseudo_labels_stub(cls_params, caps, lengths, settings):
    return _opaque(caps, (caps.shape[0],), jnp.int32)


def _greedy_stub(orig):
    def fn(*a, **k):
        if k.get("sample_max"):
            fc = a[1]
            bs, tt = fc.shape[0], k["max_seq_len"]
            return (_opaque(fc, (bs, tt), jnp.int32),
                    _opaque(fc, (bs, tt)), _opaque(fc, (bs, tt)), {})
        return orig(*a, **k)
    return fn


def _xe_stub(params, fc, att, cpts, caps, labels, **k):
    # zero-feat aux so the XE step's domain-alignment term stays legal
    # (the RL step's forward_xe call discards aux — steps.py:258)
    v = params["classifier"]["w"].shape[1]
    fe = params["fc_embed"]["w"].shape[1]
    z = _opaque(fc, (caps.shape[0], fe))
    return (_opaque(fc, (caps.shape[0], caps.shape[1] - 1, v)),
            {"fc_emb": z, "cpt_feats": z})


def _da_stub(cpt_feats, fc_emb):
    return _opaque(fc_emb, ())


def _s2s_stub(params, caps, cpts, sentis, labels, **k):
    v = params["classifier"]["w"].shape[1]
    return _opaque(caps, (caps.shape[0], caps.shape[1] - 1, v))


ABLATIONS = {
    "detector": [(sd, "sample", _detector_stub)],
    "ciderd": [(ciderd_device, "self_critical_reward", _ciderd_stub)],
    "cls_reward": [(steps, "_cls_reward", _cls_reward_stub)],
    "pseudo_labels": [(steps, "_pseudo_senti_labels", _pseudo_labels_stub)],
    "greedy": [(cap, "forward_rl", _greedy_stub)],       # wraps original
    "xe_aux": [(cap, "forward_xe", _xe_stub)],
    "seq2seq": [(cap, "forward_seq2seq", _s2s_stub)],
}

XE_ABLATIONS = {
    "pseudo_labels": [(steps, "_pseudo_senti_labels", _pseudo_labels_stub)],
    "xe_fwd": [(cap, "forward_xe", _xe_stub)],
    "da": [(cap, "domain_alignment_loss", _da_stub)],
    "seq2seq": [(cap, "forward_seq2seq", _s2s_stub)],
}


def _build_and_time(tx, tables, fn2row, fns, bs, iters, params0,
                    cls_params, senti_params):
    """Fresh make_rl_steps (stubs bind at trace time), timed pipelined."""
    s = Settings()
    g = np.random.default_rng(1)
    rl = steps.make_rl_steps(s, tx, IDS, T, tables)
    step = rl[("fact", True)]
    stage = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    rb = _batch(g, bs, s)
    rb["img_rows"] = np.asarray([fn2row[fn] for fn in fns[:bs]], np.int32)
    rb = stage(rb)
    rscs = dict(rb)
    rscs["senti_labels"] = jnp.asarray(
        g.integers(0, 3, size=(bs,)).astype(np.int32))
    frozen = steps.RLModels(senti_detector=senti_params,
                            sent_senti_cls=cls_params)
    # params0 is a HOST pytree (numpy): the step donates its params
    # buffers, so each build must stage a fresh device copy
    p = jax.tree_util.tree_map(jnp.asarray, params0)
    st = tx.init(p)
    p, st, _ = step(p, st, frozen, rb, rscs, jax.random.PRNGKey(4))
    np.asarray(jax.tree_util.tree_leaves(p)[0][0])     # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        p, st, losses = step(p, st, frozen, rb, rscs, jax.random.PRNGKey(4))
    np.asarray(losses["cap_loss"])
    return (time.perf_counter() - t0) / iters * 1e3


def _build_and_time_xe(tx, bs, iters, params0, cls_params):
    """Fresh make_xe_steps (stubs bind at trace time), timed pipelined."""
    s = Settings()
    g = np.random.default_rng(1)
    xe_train, _ = steps.make_xe_steps(s, tx)
    stage = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    b = stage(_batch(g, bs, s))
    scs = dict(b)
    scs["senti_labels"] = jnp.asarray(
        g.integers(0, 3, size=(bs,)).astype(np.int32))
    p = jax.tree_util.tree_map(jnp.asarray, params0)
    st = tx.init(p)
    p, st, _ = xe_train(p, st, cls_params, b, scs, jax.random.PRNGKey(3),
                        jnp.float32(0.1))
    np.asarray(jax.tree_util.tree_leaves(p)[0][0])     # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        p, st, losses = xe_train(p, st, cls_params, b, scs,
                                 jax.random.PRNGKey(3), jnp.float32(0.1))
    np.asarray(losses["all_loss"])
    return (time.perf_counter() - t0) / iters * 1e3


def _run_ablations(label, ablations, build, bs, only=None):
    if only:
        ablations = {k: v for k, v in ablations.items() if k in only}
    base = build()
    print(f"{label} baseline       {base:7.2f} ms/step "
          f"({bs / base * 1e3:6.0f} samples/s)", flush=True)
    for name, patches in ablations.items():
        origs = [(mod, attr, getattr(mod, attr)) for mod, attr, _ in patches]
        for mod, attr, stub in patches:
            cur = getattr(mod, attr)
            setattr(mod, attr, stub(cur) if name == "greedy" else stub)
        try:
            t = build()
        finally:
            for mod, attr, orig in origs:
                setattr(mod, attr, orig)
        print(f"{label} ablate {name:<14s}{t:7.2f} ms/step  -> stage bound "
              f"{base - t:5.2f} ms ({(base - t) / base * 100:4.1f}% of "
              f"e2e)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", choices=("rl", "xe", "both"), default="rl")
    ap.add_argument("--bs", type=int, default=0,
                    help="0 = production bs on TPU (rl 40 / xe 128), "
                         "8 elsewhere")
    ap.add_argument("--iters", type=int, default=0,
                    help="0 = 20 on TPU, 2 elsewhere")
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict to these ablation names")
    a = ap.parse_args()
    on_tpu = jax.default_backend() == "tpu"
    iters = a.iters or (20 if on_tpu else 2)

    s = Settings()
    g = np.random.default_rng(0)
    tx = optim.make_optimizer(4e-4)
    params0 = jax.tree_util.tree_map(
        np.asarray, cap.init_params(jax.random.PRNGKey(0), V, 3, s))
    cls_params = ss_cls.init_params(jax.random.PRNGKey(1), V, 3, s)
    print(f"backend: {jax.default_backend()}  T={T} V={V}", flush=True)

    if a.step in ("rl", "both"):
        bs = a.bs or (40 if on_tpu else 8)
        fns = [f"img{i}" for i in range(bs)]
        corpus = {fn: [[IDS.sos] + list(map(int, g.integers(4, V, size=9)))
                       + [IDS.eos] for _ in range(3)] for fn in fns}
        scorer = build_scorer({"train": corpus}, IDS.sos, IDS.eos)
        tables, fn2row = ciderd_device.build_tables(scorer, corpus, fns, T,
                                                    IDS.sos, IDS.eos)
        senti_params = sd.init_params(jax.random.PRNGKey(2), 3, s)
        args = (tx, tables, fn2row, fns, bs, iters, params0, cls_params,
                senti_params)
        _run_ablations(f"RL(bs={bs})", ABLATIONS,
                       lambda: _build_and_time(*args), bs, a.only)

    if a.step in ("xe", "both"):
        bs = a.bs or (128 if on_tpu else 8)
        _run_ablations(
            f"XE(bs={bs})", XE_ABLATIONS,
            lambda: _build_and_time_xe(tx, bs, iters, params0, cls_params),
            bs, a.only)


if __name__ == "__main__":
    main()
