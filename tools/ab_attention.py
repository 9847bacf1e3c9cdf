"""ABBA chip A/B: beam-shared content-attention kernel v1 vs v2
(VERDICT r4 next #4 — the last nonzero serving headroom).

The serving ablation bounds content attention at 5.34 ms of the
27.8 ms batch with a 0.19 ms/step HBM floor vs 0.33 ms/step fused —
~2.2 ms (+8%) of VPU arithmetic above the floor (DESIGN.md r4 item 9),
and the r3e int8 probe showed the kernel is VPU- not bandwidth-bound.
v2 (ops/fused_attention._kernel_v2) moves the two reduction passes
(alpha reduce, attention-weighted sum) onto the otherwise-idle MXU,
leaving the VPU only the tanh mass.

Measures the FULL serving path (detect + beam decode, bench.py shapes:
bs=384 beam=3 T=16 bf16) in ABBA order with pipelined dispatch and one
sync per timed block (CLAUDE.md measurement rules). Both kernels trace
in one process via the explicit `variant` static arg. Accept bar: >=3%
e2e; verdict goes to DESIGN.md either way.

    python tools/ab_attention.py
"""
from __future__ import annotations

import json
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
# the bench's own production-shape constants — one definition
from bench import IDS, NUM_SENTIS, VOCAB


def main():
    settings = Settings()
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    bs = 384 if on_tpu else 8
    iters = 20 if on_tpu else 2
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

    fns = {}
    outs = {}
    for variant in ("v1", "v2"):
        # each make_serving_fn wrapper traces on its first call; the
        # env is resolved in fused_attention's UN-jitted wrapper during
        # that trace and passed as a concrete static arg to the inner
        # jit (cache keyed on it), so each fn really gets its variant
        # (r5 code review: the first version of this A/B measured v1
        # against v1 — the env read lived inside the inner jit and the
        # trace cache under variant=None reused the first kernel)
        os.environ["ISC_ATT_KERNEL"] = variant
        fn = inference.make_serving_fn(settings, IDS, beam_size=3,
                                       max_seq_len=16)
        t0 = time.time()
        outs[variant] = np.asarray(fn(params, fc, att, sentis)[0])
        print(f"{variant}: compiled+warm in {time.time() - t0:.0f}s",
              flush=True)
        fns[variant] = fn
    os.environ.pop("ISC_ATT_KERNEL", None)
    token_exact = bool((outs["v1"] == outs["v2"]).all())
    print(f"token-exact v1 vs v2: {token_exact}")

    def rate(fn):
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                seqs, _, _ = fn(params, fc, att, sentis)
            np.asarray(seqs)
            best = max(best, bs * iters / (time.perf_counter() - t0))
        return best

    r = {"v1_a": rate(fns["v1"]), "v2_a": rate(fns["v2"]),
         "v2_b": rate(fns["v2"]), "v1_b": rate(fns["v1"])}
    v1 = (r["v1_a"] + r["v1_b"]) / 2
    v2 = (r["v2_a"] + r["v2_b"]) / 2
    print(json.dumps({
        "legs_captions_per_sec": {k: round(v, 1) for k, v in r.items()},
        "v1_mean": round(v1, 1), "v2_mean": round(v2, 1),
        "v2_over_v1": round(v2 / v1, 4),
        "token_exact": token_exact,
        "verdict": ("ACCEPT (>=3%)" if v2 / v1 >= 1.03 else
                    "REJECT (<3%)"),
        "backend": jax.default_backend(), "bs": bs,
    }))


if __name__ == "__main__":
    main()
