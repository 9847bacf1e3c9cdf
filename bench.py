"""Serving-path benchmark: SentiCap-style captions/sec/chip at beam=3.

Measures the full reference Detector.sample path (models/decoder.py:182-192)
— image sentiment detection + sentiment-conditioned beam search — as one
jitted XLA program at production shapes (vocab 10k, 512-d model, 196 visual
regions, max_seq_len=16, beam=3; reference opts.py:60,62,68,79-96).

Baseline: the reference decodes bs=1, one beam candidate per forward call —
16 steps x 3 candidate forward_steps, each ~10 small GEMM launches
(captioner.py:380-411). No published throughput exists (BASELINE.md), so
`vs_baseline` divides by the MEASURED torch-CPU rate of that exact loop on
this host (run `python bench_reference.py` to re-measure; result cached in
REF_BENCH.json). An A100-class GPU would run the reference faster — the
separate `vs_a100_estimate` field uses a ~25 captions/s extrapolation and
is labeled as such.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"value" is the MEDIAN of 3 best-of-3 blocks with the run's percent
spread in "spread_pct" (damps driver-capture link wobble, VERDICT r4
next #3). When the committed length-calibrated checkpoint exists
(assets/bench_trained.ckpt), "value_trained_regime" reports the same
measurement with weights whose captions EOS at ~10 tokens — the
early-exit regime of trained serving (VERDICT r4 next #2) — alongside
the honest random-weight worst case, which stays the primary metric.

Opt-in second mode (ISC_BENCH_CALIBRATED=1): the decode's early exit is
batch-wide (all candidates ended), and with random weights one straggler
always keeps the loop at all 16 steps, so the default figure excludes
the early-exit win trained weights get. EOS-logit biasing cannot emulate
the trained regime either — random-weight caption lengths are heavy-
tailed, so no bias yields mean~10 AND max<=13 simultaneously (measured:
bias for mean 7.4 leaves max at 16; bias for max 13 collapses mean to
~1). The calibrated mode therefore reports the DECODE-LENGTH RESPONSE
instead: throughput with the loop bounded at T=16/12/10/8 steps — what
the batch-wide early exit delivers when every caption has ended by
step T (decode_length_sweep, clearly labeled, next to the honest
random-weight figure).
"""
import json
import os
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from insenticap_model_tpu import inference
from insenticap_model_tpu.config import Settings
from insenticap_model_tpu.models import captioner as cap
from insenticap_model_tpu.models import sentiment_detector as senti_det
from insenticap_model_tpu.utils.dtypes import cast_bf16, cast_f32

# Trained-regime checkpoint (VERDICT r4 next #2): a REAL length-
# calibrated checkpoint at the exact bench shapes (tools/
# build_bench_ckpt.py — XE-trained until captions EOS at ~10 tokens on
# fresh random features), so the batch-wide early-exit while_loop the
# random-weight figure can never trigger is exercised and reported as
# `value_trained_regime` next to the worst-case primary metric.
TRAINED_CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "assets", "bench_trained.ckpt")

# Extrapolated, NOT measured — no A100 exists in this environment.
# Derivation (so a future A100 measurement can replace it cleanly): the
# reference serving loop decodes bs=1, one candidate forward per call —
# 16 steps x ~3 live candidates x ~10 small-GEMM kernel launches
# (captioner.py:380-411) ≈ 500 CUDA launches per image. On an A100 the
# GEMMs themselves are negligible at these shapes ([1,512] x [512,*]),
# so the loop is launch-latency-bound: 500 x ~25 µs typical
# torch-eager launch+sync overhead ≈ 12.5 ms/image plus host-side
# Python candidate bookkeeping (~half the torch-CPU profile) —
# 25 captions/s is the GENEROUS end of that estimate (pure launch
# floor, zero host cost). The honest comparison row is `vs_baseline`,
# which divides by this host's MEASURED torch-CPU rate of the same
# loop (REF_BENCH.json).
A100_CAPTIONS_PER_SEC_ESTIMATE = 25.0
IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
VOCAB = 10000
NUM_SENTIS = 10


def _reference_cps() -> tuple:
    """(measured torch-CPU captions/s of the reference serving loop,
    provenance string). Falls back to the last committed measurement if
    REF_BENCH.json is absent."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "REF_BENCH.json")
    try:
        with open(path) as f:
            d = json.load(f)
        return float(d["value"]), (
            f"torch-cpu measured ({d.get('torch_threads', '?')} threads)")
    except (OSError, KeyError, ValueError):
        return 1.15, "torch-cpu measured (1 thread, cached 2026-08-16)"


def _failure_record(reason: str, waited_s: float) -> dict:
    """A parseable failure line: the driver records SOMETHING labeled
    instead of rc=124 with no output (the round-3 outage mode)."""
    return {
        "metric": "senticap_captions_per_sec_per_chip_beam3",
        "value": None,
        "unit": "captions/s",
        "vs_baseline": None,
        "error": reason,
        "waited_s": round(waited_s, 1),
        "backend": "unavailable",
    }


def _wait_for_backend(budget_s: float) -> bool:
    """The tunneled TPU backend can be transiently UNAVAILABLE for long
    stretches (observed: `jax.devices()` hangs or raises UNAVAILABLE,
    then recovers). Probe in fresh subprocesses — a failed init poisons
    the in-process backend cache — until one answers or the budget runs
    out."""
    import subprocess
    deadline = time.monotonic() + budget_s
    while True:
        try:
            ok = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=120, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL).returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok or time.monotonic() >= deadline:
            return ok
        time.sleep(30)


def _arm_watchdog(budget_s: float, t_start: float) -> threading.Timer:
    """Hard bound on total runtime: even after a successful probe the
    tunnel can die mid-run and hang any device call indefinitely
    (block_until_ready/transfer never return). When the budget expires,
    print the labeled failure line and force-exit — a daemon Timer plus
    os._exit is the only reliable escape from a wedged runtime thread."""
    def _expire():
        rec = _failure_record("bench_total_budget_expired",
                              time.monotonic() - t_start)
        print(json.dumps(rec), flush=True)
        os._exit(3)
    t = threading.Timer(budget_s, _expire)
    t.daemon = True
    t.start()
    return t


def main():
    t_start = time.monotonic()
    ok = _wait_for_backend(
        float(os.environ.get("ISC_BENCH_INIT_WAIT_S", "900")))
    if not ok:
        print(json.dumps(_failure_record("backend_unavailable_after_wait",
                                         time.monotonic() - t_start)),
              flush=True)
        sys.exit(2)
    watchdog = _arm_watchdog(
        float(os.environ.get("ISC_BENCH_TOTAL_BUDGET_S", "2400")), t_start)
    settings = Settings()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = inference.ServingParams(
        captioner=cap.init_params(jax.random.PRNGKey(0), VOCAB, 3, settings),
        senti_detector=senti_det.init_params(jax.random.PRNGKey(1), 3,
                                             settings))
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            params)

    bs = 384 if jax.default_backend() == "tpu" else 8  # measured sweet spot
    g = np.random.default_rng(0)
    fc = jnp.asarray(g.normal(size=(bs, settings.fc_feat_dim)), dtype)
    att = jnp.asarray(g.normal(size=(bs, 14, 14, settings.att_feat_dim)),
                      dtype)
    sentis = jnp.asarray(g.integers(4, VOCAB, size=(bs, NUM_SENTIS)),
                         jnp.int32)

    fn = inference.make_serving_fn(settings, IDS, beam_size=3, max_seq_len=16)
    # warmup / compile; np.asarray forces a device-to-host fetch — the only
    # reliable sync on the tunneled backend (block_until_ready returns early)
    np.asarray(fn(params, fc, att, sentis)[0])

    iters = 20 if jax.default_backend() == "tpu" else 3
    cps, spread_pct = _throughput(fn, params, fc, att, sentis, bs, iters)

    # p50 per-image latency at bs=1 (secondary metric, BASELINE.md).
    # Two numbers: end-to-end includes one host round trip, which through
    # the tunneled test backend is ~28 ms of pure link RTT (a trivial
    # jitted add measures the same); the device number amortizes N
    # back-to-back calls behind one sync and is what a co-located host
    # sees per image.
    fc1, att1, s1 = fc[:1], att[:1], sentis[:1]
    np.asarray(fn(params, fc1, att1, s1)[0])
    lat = []
    for _ in range(max(5, iters)):
        t0 = time.perf_counter()
        np.asarray(fn(params, fc1, att1, s1)[0])
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat) * 1e3)
    n_amort = 50 if jax.default_backend() == "tpu" else 5
    t0 = time.perf_counter()
    for _ in range(n_amort):
        r = fn(params, fc1, att1, s1)[0]
    np.asarray(r)
    device_ms = (time.perf_counter() - t0) / n_amort * 1e3

    ref_cps, ref_src = _reference_cps()
    record = {
        "metric": "senticap_captions_per_sec_per_chip_beam3",
        "value": round(cps, 2),
        "unit": "captions/s",
        "vs_baseline": round(cps / ref_cps, 2),
        "baseline": ref_src,
        "vs_a100_estimate": round(cps / A100_CAPTIONS_PER_SEC_ESTIMATE, 2),
        "p50_latency_ms_bs1": round(p50_ms, 2),
        "device_decode_ms_bs1": round(device_ms, 2),
        "batch_size": bs,
        "spread_pct": round(spread_pct, 3),
        "backend": jax.default_backend(),
    }
    record.update(_trained_regime(settings, fn, fc, att, sentis, bs, iters))

    if os.environ.get("ISC_BENCH_CALIBRATED") == "1":
        record["decode_length_sweep"] = _decode_length_sweep(
            params, fc, att, sentis, bs, iters)
    watchdog.cancel()
    print(json.dumps(record))


def _throughput(fn, params, fc, att, sentis, bs, iters,
                blocks: int = 3) -> tuple:
    """Median of `blocks` best-of-3 measurements + percent spread
    (VERDICT r4 next #3: the single-shot driver capture sat ~1% under
    same-HEAD builder runs — the median over repeated blocks damps the
    link-phase wobble, and spread_pct records how noisy this capture
    was). Sync once per timed block on the seqs fetch (never
    per-iteration — CLAUDE.md measurement rules)."""
    vals = []
    for _ in range(blocks):
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                seqs, scores, labels = fn(params, fc, att, sentis)
            np.asarray(seqs)
            best = max(best, bs * iters / (time.perf_counter() - t0))
        vals.append(best)
    med = float(np.median(vals))
    return med, (max(vals) - min(vals)) / med * 100.0


def _first_eos_lengths(seqs) -> np.ndarray:
    seqs = np.asarray(seqs).reshape(-1, np.asarray(seqs).shape[-1])
    is_eos = seqs == IDS.eos
    return np.where(is_eos.any(axis=1), is_eos.argmax(axis=1),
                    seqs.shape[1])


def _trained_regime(settings, fn, fc, att, sentis, bs, iters) -> dict:
    """Throughput with the committed length-calibrated checkpoint
    (assets/bench_trained.ckpt, tools/build_bench_ckpt.py): generated
    captions EOS at ~10 tokens, so the decode's batch-wide early-exit
    while_loop (reference captioner.py:380-411 semantics) actually
    fires. Returns {} when the artifact is absent (the primary metric
    never depends on it)."""
    if not os.path.exists(TRAINED_CKPT):
        return {}
    from insenticap_model_tpu.training import checkpoint as ckpt
    # the artifact holds the TRAINED captioner only; the detector stays
    # the same PRNGKey(1) init the primary metric uses (random labels
    # don't affect decode length) — halves the committed artifact
    template = {
        "captioner": cast_bf16(
            cap.init_params(jax.random.PRNGKey(0), VOCAB, 3, settings)),
    }
    loaded, _, _ = ckpt.load(TRAINED_CKPT, template)
    senti_params = cast_bf16(
        senti_det.init_params(jax.random.PRNGKey(1), 3, settings))
    if jax.default_backend() != "tpu":
        loaded = cast_f32(loaded)
        senti_params = cast_f32(senti_params)
    # ckpt.load returns HOST arrays — stage them on device ONCE, or
    # every timed call re-ships ~44 MB of params through the link
    # (measured: 13,881 -> 340 captions/s through the tunnel)
    loaded = jax.tree_util.tree_map(jnp.asarray, loaded)
    # reuse the PRIMARY serving fn (same program, already compiled —
    # a fresh make_serving_fn wrapper would recompile for minutes)
    sparams = inference.ServingParams(captioner=loaded["captioner"],
                                      senti_detector=senti_params)
    seqs = fn(sparams, fc, att, sentis)[0]
    lens = _first_eos_lengths(seqs)
    cps, spread = _throughput(fn, sparams, fc, att, sentis, bs, iters)
    return {
        "value_trained_regime": round(cps, 2),
        "trained_spread_pct": round(spread, 3),
        "trained_mean_caption_len": round(float(lens.mean()), 2),
        "trained_max_caption_len": int(lens.max()),
        "trained_ckpt": os.path.basename(TRAINED_CKPT),
    }


def _decode_length_sweep(params, fc, att, sentis, bs, iters) -> dict:
    """Throughput with the decode loop bounded at T steps, for
    T in {16, 12, 10, 8}: exactly what the while_loop early exit
    (the reference's all-ended beam break, captioner.py:382-388)
    delivers when every caption of the batch has ended by step T. With
    random weights no EOS bias reaches the trained length profile (see
    module docstring), so the response curve is measured directly."""
    settings = Settings()
    out = {}
    for T in (16, 12, 10, 8):
        fn = inference.make_serving_fn(settings, IDS, beam_size=3,
                                       max_seq_len=T)
        np.asarray(fn(params, fc, att, sentis)[0])
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                seqs, _, _ = fn(params, fc, att, sentis)
            np.asarray(seqs)
            best = max(best, bs * iters / (time.perf_counter() - t0))
        out[f"T{T}_captions_per_sec"] = round(best, 2)
    out["note"] = ("serving throughput when all captions end by step T "
                   "— the early-exit regime of trained weights (SentiCap "
                   "captions average ~10 tokens)")
    return out


if __name__ == "__main__":
    main()
