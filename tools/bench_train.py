"""Train-step throughput at production shapes on the current backend.

Measures one jitted XE step (xe + domain-align + seq2seq losses) and one
jitted SCST-RL step (2 rollouts + on-device CIDEr-D + cls reward + aux
losses) — the two hot training loops (reference train_xe.py / train_rl.py).

    python tools/bench_train.py [xe_bs] [rl_bs]

ISC_RL_DETECTOR_BF16=1 stages the frozen sentiment detector in bf16 (the
RL step then runs it through the serving-grade pallas Winograd stack —
steps.py routes the detector input by the frozen params' dtype); default
0 here = f32 exact. A/B: tools/ab_rl_detector.py.
"""
import os
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
from insenticap_model_tpu.utils.dtypes import cast_bf16  # noqa: E402

IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
V, T, M = 10000, 16, 10


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
    tx = optim.make_optimizer(4e-4)

    fns = [f"img{i}" for i in range(max(xe_bs, rl_bs))]
    corpus = {fn: [[IDS.sos] + list(map(int, g.integers(4, V, size=9)))
                   + [IDS.eos] for _ in range(3)] for fn in fns}
    scorer = build_scorer({"train": corpus}, IDS.sos, IDS.eos)
    tables, fn2row = ciderd_device.build_tables(scorer, corpus, fns, T,
                                                IDS.sos, IDS.eos)

    xe_train, _ = steps.make_xe_steps(s, tx)
    rl = steps.make_rl_steps(s, tx, IDS, T, tables)

    params = cap.init_params(jax.random.PRNGKey(0), V, 3, s)
    cls_params = ss_cls.init_params(jax.random.PRNGKey(1), V, 3, s)
    senti_params = sd.init_params(jax.random.PRNGKey(2), 3, s)
    if os.environ.get("ISC_RL_DETECTOR_BF16", "0") == "1":
        # the one policy cast (utils/dtypes) so the A/B stages exactly
        # what train_rl --rl_detector_dtype bf16 ships
        senti_params = cast_bf16(senti_params)
        print("frozen senti detector staged bf16 (pallas Winograd path)")

    # XE: steps donate params/opt_state — rebuild per call is unfair;
    # instead chain donation by reusing returned state inside the timer.
    # Batches are pre-staged on device: numpy inputs would re-cross the
    # host link every call (CLAUDE.md: ~700 ms per 32 MB on the tunnel).
    stage = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    b = stage(_batch(g, xe_bs, s))
    scs = dict(b)
    scs["senti_labels"] = jnp.asarray(
        g.integers(0, 3, size=(xe_bs,)).astype(np.int32))

    def xe_once(p, st):
        p2, st2, losses = xe_train(p, st, cls_params, b, scs,
                                   jax.random.PRNGKey(3), jnp.float32(0.1))
        return p2, st2, losses

    p, st = params, tx.init(params)
    p, st, _ = xe_once(p, st)  # compile
    np.asarray(jax.tree_util.tree_leaves(p)[0][0])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        p, st, losses = xe_once(p, st)
    np.asarray(losses["all_loss"])
    xe_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"XE step bs={xe_bs}: {xe_ms:.1f} ms -> "
          f"{xe_bs / xe_ms * 1e3:.0f} samples/s")

    rb = _batch(g, rl_bs, s)
    rb["img_rows"] = np.asarray([fn2row[fn] for fn in fns[:rl_bs]],
                                np.int32)
    rb = stage(rb)
    rscs = dict(rb)
    rscs["senti_labels"] = jnp.asarray(
        g.integers(0, 3, size=(rl_bs,)).astype(np.int32))
    frozen = steps.RLModels(senti_detector=senti_params,
                            sent_senti_cls=cls_params)
    step = rl[("fact", True)]

    def rl_once(p, st):
        return step(p, st, frozen, rb, rscs, jax.random.PRNGKey(4))

    p2, st2, _ = rl_once(p, tx.init(p))
    np.asarray(jax.tree_util.tree_leaves(p2)[0][0])
    t0 = time.perf_counter()
    for _ in range(n):
        p2, st2, losses = rl_once(p2, st2)
    np.asarray(losses["cap_loss"])
    rl_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"RL step bs={rl_bs}: {rl_ms:.1f} ms -> "
          f"{rl_bs / rl_ms * 1e3:.0f} samples/s")


if __name__ == "__main__":
    main()
