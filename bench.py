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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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

A100_CAPTIONS_PER_SEC_ESTIMATE = 25.0  # extrapolated, NOT measured
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
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            seqs, scores, labels = fn(params, fc, att, sentis)
        np.asarray(seqs)
        dt = time.perf_counter() - t0
        best = max(best, bs * iters / dt)
    cps = best

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
        "backend": jax.default_backend(),
    }

    if os.environ.get("ISC_BENCH_CALIBRATED") == "1":
        record["decode_length_sweep"] = _decode_length_sweep(
            params, fc, att, sentis, bs, iters)
    watchdog.cancel()
    print(json.dumps(record))


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
