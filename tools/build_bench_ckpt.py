"""Train the length-calibrated production-dim serving checkpoint that
backs bench.py's trained-regime line (VERDICT r4 next #2).

bench.py's primary figure initializes RANDOM weights, so beam rows never
all-EOS and every decode runs the full T=16 — an honest worst-case
floor, but ~20-30% under the trained regime (SentiCap captions average
~10 tokens; the decode's batch-wide early-exit while_loop
(ops/beam.py, reference captioner.py:380-411's all-ended break) then
stops the loop early). This tool produces a REAL trained checkpoint at
the exact bench shapes (vocab 10k, 512-d model, 2048-d feats, T=16,
reference opts.py:60,79-96): XE teacher forcing on a synthetic corpus
whose captions run 9-11 words, until generated captions EOS at ~10
tokens on FRESH random features (the bench's own input distribution).
bench.py loads the committed artifact (assets/bench_trained.ckpt, bf16)
and reports ``value_trained_regime`` next to the worst-case metric.

    python tools/build_bench_ckpt.py [--steps 600] [--out assets/...]

Works on the chip (fast; batches are pre-staged on device once and
cycled, so the axon tunnel's per-transfer RSS artifact stays bounded —
CLAUDE.md) or on the CPU backend (slower). The EOS-position signal is
what matters and transfers to unseen random features; the tool verifies
that before writing (mean length within [8, 13], all rows ended by
T-1), and fails loudly otherwise.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from insenticap_model_tpu import inference
from insenticap_model_tpu.config import Settings
from insenticap_model_tpu.models import captioner as cap
from insenticap_model_tpu.models import sentiment_detector as senti_det
from insenticap_model_tpu.training import checkpoint as ckpt
from insenticap_model_tpu.training import optim
from insenticap_model_tpu.utils.dtypes import cast_bf16

# bench.py's production shapes — imported, not copied, so they cannot
# drift (bench hardcodes max_seq_len=16 in its make_serving_fn calls)
from bench import IDS, NUM_SENTIS, VOCAB  # noqa: E402

T = 16
CAP_WORD_LO, CAP_WORD_HI = 4, 104   # 100-word caption vocabulary
LEN_LO, LEN_HI = 9, 11              # words per caption (SentiCap ~10)


# Caption content must be PREDICTABLE, not uniform-random: under the
# reference's sum-logprob beam ranking (no length normalization,
# SURVEY §8.10) a candidate that EOSes early stops accumulating
# negative terms, so with ~log(100) per-word cost the beam stops far
# before the trained length (measured: mean 6.1 for 9-11-word uniform
# captions). A 95%-deterministic Markov chain with the length keyed to
# the start word makes per-step cost ~0.2 nats and the EOS position
# conditionally deterministic — beam decode then reproduces the
# trained ~10-token lengths, like a real trained captioner's peaked
# distributions do.
_PERM = np.random.default_rng(7).permutation(
    np.arange(CAP_WORD_LO, CAP_WORD_HI))


def make_batch(g, bs, settings):
    """One synthetic XE batch: random features, 9-11-word captions."""
    caps = np.full((bs, T + 1), IDS.pad, np.int32)
    caps[:, 0] = IDS.sos
    lengths = np.zeros((bs,), np.int32)
    for i in range(bs):
        w = int(g.integers(CAP_WORD_LO, CAP_WORD_HI))
        L = LEN_LO + (w % (LEN_HI - LEN_LO + 1))
        for t in range(L):
            caps[i, 1 + t] = w
            w = int(_PERM[w - CAP_WORD_LO]) if g.random() < 0.95 \
                else int(g.integers(CAP_WORD_LO, CAP_WORD_HI))
        caps[i, 1 + L] = IDS.eos
        lengths[i] = L + 1   # predicted tokens: L words + EOS (§8.3)
    return {
        "fc": g.normal(size=(bs, settings.fc_feat_dim)).astype(np.float32),
        "att": g.normal(size=(bs, 14, 14, settings.att_feat_dim)).astype(
            np.float32),
        "cpts": g.integers(CAP_WORD_LO, CAP_WORD_HI,
                           (bs, 5)).astype(np.int32),
        "caps": caps,
        "lengths": lengths,
        "labels": g.integers(0, 3, (bs,)).astype(np.int32),
    }


def mean_decoded_length(seqs):
    """(mean, max) first-EOS position over every [*, T] row (T where
    absent) — bench.py's _first_eos_lengths is the single source of the
    EOS-position convention so the two reports cannot drift."""
    from bench import _first_eos_lengths
    first = _first_eos_lengths(np.asarray(seqs))
    return float(first.mean()), int(first.max())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "assets", "bench_trained.ckpt"))
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--pool", type=int, default=32,
                    help="pre-staged device batches cycled during training")
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)

    settings = Settings()
    print(f"====> backend={jax.default_backend()}")
    params = cap.init_params(jax.random.PRNGKey(a.seed), VOCAB, 3, settings)
    sd_params = senti_det.init_params(jax.random.PRNGKey(a.seed + 1), 3,
                                      settings)
    tx = optim.make_optimizer(a.lr, grad_clip=0.1)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            logprobs, _ = cap.forward_xe(
                p, batch["fc"], batch["att"], batch["cpts"], batch["caps"],
                batch["labels"], settings=settings, rng=rng, ss_prob=0.0,
                deterministic=False)
            return cap.xe_criterion(logprobs, batch["caps"][:, 1:],
                                    batch["lengths"])
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = optim.apply_updates(params, grads, opt_state, tx)
        return params, opt_state, loss

    g = np.random.default_rng(a.seed)
    pool = [jax.tree_util.tree_map(jnp.asarray,
                                   make_batch(g, a.bs, settings))
            for _ in range(a.pool)]
    t0 = time.time()
    for step in range(a.steps):
        params, opt_state, loss = train_step(
            params, opt_state, pool[step % a.pool],
            jax.random.fold_in(jax.random.PRNGKey(a.seed + 2), step))
        if step % 50 == 0 or step == a.steps - 1:
            print(f"step {step}: loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # verify the trained regime on FRESH random features through the
    # exact bench serving fn (detect + beam=3)
    sparams = inference.ServingParams(captioner=params,
                                      senti_detector=sd_params)
    fn = inference.make_serving_fn(settings, IDS, beam_size=3,
                                   max_seq_len=T)
    ge = np.random.default_rng(a.seed + 99)
    bs_eval = 64
    fc = jnp.asarray(ge.normal(size=(bs_eval, settings.fc_feat_dim)),
                     jnp.float32)
    att = jnp.asarray(
        ge.normal(size=(bs_eval, 14, 14, settings.att_feat_dim)),
        jnp.float32)
    sentis = jnp.asarray(ge.integers(4, VOCAB, size=(bs_eval, NUM_SENTIS)),
                         jnp.int32)
    seqs, _, _ = fn(sparams, fc, att, sentis)
    mean_len, max_len = mean_decoded_length(np.asarray(seqs))
    print(f"====> decoded mean length {mean_len:.2f}, max {max_len} "
          f"(target ~10, early exit needs max < {T})")
    if not (8.0 <= mean_len <= 13.0 and max_len < T):
        raise SystemExit(
            f"trained regime NOT reached (mean {mean_len:.2f}, max "
            f"{max_len}) — raise --steps or adjust --lr before committing")

    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    # captioner only (~42 MB bf16): the sentiment detector stays random
    # in bench.py's trained-regime leg (labels don't affect decode
    # length) and is re-initialized there from the same PRNGKey(1) the
    # primary metric uses — halves the committed artifact
    ckpt.save(a.out, {"captioner": cast_bf16(params)}, None, {
        "epoch": -1,
        "settings": settings.to_dict(),
        "max_seq_len": T,
        "sentiment_categories": ["positive", "negative", "neutral"],
        "dtype": "bfloat16",
        "vocab_size": VOCAB,
        "provenance": (
            f"tools/build_bench_ckpt.py seed={a.seed} steps={a.steps} "
            f"bs={a.bs} lr={a.lr} backend={jax.default_backend()}; "
            f"decoded mean len {mean_len:.2f} max {max_len} on fresh "
            f"random features"),
    })
    sz = os.path.getsize(a.out) / 1e6
    print(f"====> wrote {a.out} ({sz:.1f} MB)")


if __name__ == "__main__":
    main()
