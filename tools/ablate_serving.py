"""Ablation-bound the TRUE fused e2e cost of each serving-path stage.

Companion to tools/ablate_encoder.py (same discipline, same motivation:
the r4 encoder ablations showed scan-staged profiles overstate stages
that fuse with neighbors — the serving stage table in DESIGN.md round-2
is standalone-scan numbers too). Each ablation swaps one stage of the
full detect_and_decode program (bench.py conditions: bs=384, beam=3,
T=16, bf16, random weights so the early exit never fires) for the
cheapest shape-preserving stand-in; (baseline - ablated) bounds what ANY
optimization of that stage could recover end-to-end.

Stand-ins (semantics-breaking on purpose — these are bounds, not modes):
  detector   -> constant neutral labels      (skips the Winograd stack)
  attention  -> att[:, 0] slice per beam     (skips the pallas kernel)
  senti_fuse -> att_res := cont_res          (skips senti attention+gate)
  topk       -> first-k slice                (skips all argmax selection,
                                              both vocab and B*B passes)

    python tools/ablate_serving.py [--bs 384] [--iters 20]

Run on the real chip; timing is pipelined (one sync, CLAUDE.md rules).
Chip record: see DESIGN.md round-4 (serving ablation-bounds section).
"""
import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from insenticap_model_tpu import inference, nn  # noqa: E402
from insenticap_model_tpu.config import Settings  # noqa: E402
from insenticap_model_tpu.models import captioner as cap  # noqa: E402
from insenticap_model_tpu.models import \
    sentiment_detector as senti_det  # noqa: E402
from insenticap_model_tpu.models.captioner import (  # noqa: E402
    DecodeState, embed_word)
from insenticap_model_tpu.ops import beam  # noqa: E402
from insenticap_model_tpu.ops import fused_attention as fa  # noqa: E402

IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
VOCAB = 10000
NUM_SENTIS = 10


def _time(params, fc, att, sentis, settings, iters):
    fn = inference.make_serving_fn(settings, IDS, beam_size=3,
                                   max_seq_len=16)
    np.asarray(fn(params, fc, att, sentis)[0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        seqs, _, _ = fn(params, fc, att, sentis)
    np.asarray(seqs)
    return (time.perf_counter() - t0) / iters * 1e3


# --- stand-ins ------------------------------------------------------------
# Opacity rule (CLAUDE.md, tools/ablate_train._opaque): every stand-in
# output ties to a live input through a FLOAT zero — int 0*x legally
# constant-folds, and constant labels/indices let XLA fold the senti
# embedding gathers / beam-select one-hot einsums downstream, polluting
# the bound with neighbor-stage savings.


def _opaque_zero_i32(x):
    """Zero int32 scalar XLA cannot treat as a constant (float-zero tie
    to a live input; the int form folds — HLO-verified)."""
    return (jnp.zeros((), jnp.float32)
            * x.reshape(-1)[0].astype(jnp.float32)).astype(jnp.int32)


def _detector_stub(p, att, thr, neutral):
    z = _opaque_zero_i32(att)
    return (jnp.broadcast_to(z, (att.shape[0],)), None, None)


def _attention_stub(h_att, p_cont, att, p_att, *, B, tile_b):
    return jnp.repeat(att[:, 0, :], B, axis=0).astype(h_att.dtype)


def _cell_no_senti_fuse(params, sctx, att, p_att, state, last_flat, *,
                        mode, B, tile_b):
    """_decode_cell_shared_att with att_res := cont_res — the senti
    attention + gated fusion branch removed (structure copied from
    ops/beam.py; keep in sync if that cell changes)."""
    xt = embed_word(params, last_flat)
    if sctx.senti_label is not None:
        xt = xt + sctx.senti_label
    a_in = jnp.concatenate([state.h_lang, sctx.fc, xt], axis=1)
    h_att, c_att = nn.lstm_cell(params["att_lstm"], a_in,
                                (state.h_att, state.c_att))
    att_res = fa.beam_content_attention(h_att, params["attention"]["cont"],
                                        att, p_att, B=B, tile_b=tile_b)
    l_in = jnp.concatenate([att_res, h_att], axis=1)
    h_lang, c_lang = nn.lstm_cell(params["lang_lstm"], l_in,
                                  (state.h_lang, state.c_lang))
    return h_lang, DecodeState(h_att, c_att, h_lang, c_lang)


def _topk_stub(x, k):
    vals = x[..., :k]
    idxs = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)
                            + _opaque_zero_i32(x), vals.shape)
    return vals, idxs


ABLATIONS = {
    # name -> (module, attr, stand-in)
    "detector": (senti_det, "sample", _detector_stub),
    "attention": (fa, "beam_content_attention", _attention_stub),
    "senti_fuse": (beam, "_decode_cell_shared_att", _cell_no_senti_fuse),
    "topk": (beam, "_topk_argmax", _topk_stub),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=0,
                    help="0 = bench.py default (384 on TPU, 8 elsewhere)")
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    bs = a.bs or (384 if on_tpu else 8)
    iters = a.iters if on_tpu else 2
    settings = Settings()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = inference.ServingParams(
        captioner=cap.init_params(jax.random.PRNGKey(0), VOCAB, 3, settings),
        senti_detector=senti_det.init_params(jax.random.PRNGKey(1), 3,
                                             settings))
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            params)
    g = np.random.default_rng(0)
    fc = jnp.asarray(g.normal(size=(bs, settings.fc_feat_dim)), dtype)
    att = jnp.asarray(g.normal(size=(bs, 14, 14, settings.att_feat_dim)),
                      dtype)
    sentis = jnp.asarray(g.integers(4, VOCAB, size=(bs, NUM_SENTIS)),
                         jnp.int32)
    print(f"backend: {jax.default_backend()}  bs={bs} beam=3 T=16 "
          f"{np.dtype(dtype).name if dtype != jnp.bfloat16 else 'bf16'}",
          flush=True)

    base = _time(params, fc, att, sentis, settings, iters)
    print(f"baseline          {base:7.2f} ms/batch "
          f"({bs / base * 1e3:7.0f} captions/s)", flush=True)

    for name, (mod, attr, stub) in ABLATIONS.items():
        orig = getattr(mod, attr)
        setattr(mod, attr, stub)
        try:
            t = _time(params, fc, att, sentis, settings, iters)
        finally:
            setattr(mod, attr, orig)
        print(f"ablate {name:<11s}{t:7.2f} ms/batch  -> stage bound "
              f"{base - t:5.2f} ms ({(base - t) / base * 100:4.1f}% of "
              f"e2e)", flush=True)


if __name__ == "__main__":
    main()
