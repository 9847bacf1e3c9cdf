"""Ablation timing of the serving decode loop: which stage owns the time.

Each stage of the beam decode step is timed as its own 16-iteration
lax.scan at serving shapes, so stage costs can be compared against the
full pipeline (sum of stages ~ full loop when nothing unexpected
dominates). Run on the default (TPU) env:

    python tools/profile_serving.py [batch_size]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from insenticap_model_tpu import inference, nn  # noqa: E402
from insenticap_model_tpu.config import Settings  # noqa: E402
from insenticap_model_tpu.models import captioner as cap  # noqa: E402
from insenticap_model_tpu.models import sentiment_detector as sd  # noqa: E402
from insenticap_model_tpu.ops import beam as beam_mod  # noqa: E402

IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
V, M, T, B = 10000, 10, 16, 3


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


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    s = Settings()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    g = np.random.default_rng(0)
    params = cap.init_params(jax.random.PRNGKey(0), V, 3, s)
    sd_params = sd.init_params(jax.random.PRNGKey(1), 3, s)
    castf = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t)
    params, sd_params = castf(params), castf(sd_params)

    fc = jnp.asarray(g.normal(size=(bs, s.fc_feat_dim)), dtype)
    att = jnp.asarray(g.normal(size=(bs, 14, 14, s.att_feat_dim)), dtype)
    sentis = jnp.asarray(g.integers(4, V, size=(bs, M)), jnp.int32)
    rows = bs * B
    h = jnp.asarray(g.normal(size=(rows, s.rnn_hid_dim)), dtype)

    # full pipeline
    serve = inference.make_serving_fn(s, IDS, beam_size=B, max_seq_len=T)
    sp = inference.ServingParams(captioner=params, senti_detector=sd_params)
    full = bench(lambda: serve(sp, fc, att, sentis))
    print(f"full serving (bs={bs}): {full:.2f} ms "
          f"-> {bs / full * 1e3:.0f} captions/s")

    # stage: sentiment detector alone
    sd_fn = jax.jit(lambda a: sd.sample(sd_params, a, 0.7, IDS.neutral)[0])
    print(f"senti_detector:         {bench(lambda: sd_fn(att)):.2f} ms")

    # stage: context build alone
    zl = jnp.zeros((bs,), jnp.int32)
    ctx_fn = jax.jit(lambda p, fc, att, sentis, zl: cap.build_visual_context(
        p, fc, att, s.dropout_p, jax.random.PRNGKey(0), True,
        senti_words=sentis, senti_labels=zl, pad_id=IDS.pad)[0])
    print(f"context build:          "
          f"{bench(ctx_fn, params, fc, att, sentis, zl):.2f} ms")

    # scan stages (16 steps each at [rows, .] shapes)
    w = params["classifier"]["w"]
    b = params["classifier"]["b"]

    @jax.jit
    def scan_classifier_topk(h):
        def step(carry, _):
            logits = jnp.dot(carry, w, preferred_element_type=jnp.float32) \
                + b.astype(jnp.float32)
            logprobs = nn.log_softmax(logits)
            tv, ti = beam_mod._topk_argmax(logprobs, B)
            return carry + ti.sum(-1, keepdims=True).astype(carry.dtype) * 0,\
                tv.sum()
        _, ys = jax.lax.scan(step, h, jnp.arange(T))
        return ys

    print(f"classifier+topk x16:    {bench(scan_classifier_topk, h):.2f} ms")

    @jax.jit
    def scan_classifier_only(h):
        def step(carry, _):
            logits = jnp.dot(carry, w, preferred_element_type=jnp.float32) \
                + b.astype(jnp.float32)
            return carry, logits.max()
        _, ys = jax.lax.scan(step, h, jnp.arange(T))
        return ys
    print(f"classifier only x16:    {bench(scan_classifier_only, h):.2f} ms")

    # decode cell (LSTMs + fused/beam attention) without classifier
    ctx, _ = cap.build_visual_context(
        params, fc, att, s.dropout_p, jax.random.PRNGKey(0), True,
        senti_words=sentis, senti_labels=jnp.zeros((bs,), jnp.int32),
        pad_id=IDS.pad)
    bctx = beam_mod._tile_ctx(ctx, B)
    sctx = bctx._replace(att=None, p_att=None)
    z = jnp.zeros((rows, s.rnn_hid_dim), dtype)
    state0 = cap.DecodeState(z, z, z, z)
    last0 = jnp.full((rows,), IDS.sos, jnp.int32)
    fa_tile = 8 if bs % 8 == 0 else 4

    @jax.jit
    def scan_cell_fa(params, sctx, catt, cpatt, state0):
        def step(state, _):
            out, ns = beam_mod._decode_cell_shared_att(
                params, sctx, catt, cpatt, state, last0, mode="rl",
                B=B, tile_b=fa_tile)
            return ns, out.sum()
        _, ys = jax.lax.scan(step, state0, jnp.arange(T))
        return ys
    print(f"decode cell (fa) x16:   "
          f"{bench(scan_cell_fa, params, sctx, ctx.att, ctx.p_att, state0):.2f} ms")

    @jax.jit
    def scan_cell_xla(params, bctx, state0):
        def step(state, _):
            out, ns, _ = cap.decode_cell(
                params, bctx, state, last0, mode="rl", dropout_p=0.0,
                drop_key=jax.random.PRNGKey(0), deterministic=True)
            return ns, out.sum()
        _, ys = jax.lax.scan(step, state0, jnp.arange(T))
        return ys
    print(f"decode cell (xla) x16:  "
          f"{bench(scan_cell_xla, params, bctx, state0):.2f} ms")

    # beam state selection via one-hot einsum
    sel_mat = jax.nn.one_hot(
        jnp.zeros((bs, B), jnp.int32), B, dtype=dtype)

    @jax.jit
    def scan_select(state0):
        def step(state, _):
            def sel(f):
                fb = f.reshape(bs, B, -1)
                return jnp.einsum("bkj,bjh->bkh", sel_mat, fb).reshape(
                    rows, -1)
            return cap.DecodeState(*(sel(f) for f in state)), ()
        st, _ = jax.lax.scan(step, state0, jnp.arange(T))
        return st
    print(f"beam select x16:        {bench(scan_select, state0):.2f} ms")

    # controllable-sentiment sweep (BASELINE config 2): every image under
    # all 3 labels in ONE fused trace (label axis folded into batch).
    # bs//3 images so total decode rows match the main serving number.
    bs_sw = max(bs // 3, 1)
    sweep_fn = jax.jit(lambda p, fc, att, sbl: inference.sweep_sentiments(
        p, fc, att, sbl, settings=s, ids=IDS, num_labels=3, beam_size=B,
        max_seq_len=T))
    sbl = jnp.asarray(g.integers(4, V, size=(3, bs_sw, M)), jnp.int32)
    t_sw = bench(lambda: sweep_fn(params, fc[:bs_sw], att[:bs_sw], sbl))
    print(f"3-label sweep (bs={bs_sw}): {t_sw:.2f} ms -> "
          f"{3 * bs_sw / t_sw * 1e3:.0f} captions/s "
          f"({bs_sw} images x 3 labels, one trace)")


if __name__ == "__main__":
    main()
