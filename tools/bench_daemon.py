"""Serving-daemon measurements: what the dynamic batcher costs on top of
the raw batched decode, and an honest end-to-end number on this host.

Three modes:

  overhead  — tiny feature dims: saturating thread pool through the
              DynamicBatcher vs the same batches dispatched directly in
              a loop. Isolates the queue/coalesce/fan-out machinery
              (target: a few ms per batch, invisible next to decode).
              Run this mode on the CPU backend: through the tunnel the
              closed-loop clients serialize on the ~30+ ms link RTT per
              batch, so the factor measures the link, not the machinery
              (the direct baseline pipelines its 8 batches device-side).
  e2e       — production dims (Settings(), V=10k, beam=3): requests/s +
              latency through the daemon, with the host->device share
              measured separately by staging the same bytes. On THIS
              environment the tunnel link (~32 MB per 700 ms, CLAUDE.md)
              dominates: the daemon ships ~0.8 MB of bf16 features per
              request, so the e2e figure measures the link, not the
              decode. On a co-located TPU host (DMA at tens of GB/s)
              that share is sub-ms/request and bench.py's pre-staged
              captions/s is the decode ceiling.
  image     — the IMAGE-mode encode stage (VERDICT r3 weak #2): raw
              uint8 requests through serving_daemon.EncodeBatcher
              (coalesced per resize bucket, concept top-k on the same
              batch) vs the retired per-request bs=1 pattern. On the
              TPU backend this runs the real ResNet-101 at 448²/bf16
              (the production encode path); on CPU it runs the same
              trunk at 64² so the machinery comparison stays feasible.

    python tools/bench_daemon.py [overhead|e2e|image|all]
"""
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from insenticap_model_tpu import inference  # noqa: E402
from insenticap_model_tpu.config import Settings  # noqa: E402
from insenticap_model_tpu.models import captioner as cap  # noqa: E402
from insenticap_model_tpu.models import sentiment_detector as sd  # noqa: E402
from insenticap_model_tpu.serving_daemon import DynamicBatcher  # noqa: E402

IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)


def _run_pool(batcher, reqs, n_threads, per_thread):
    lat = []
    lat_lock = threading.Lock()

    def worker(t):
        for k in range(per_thread):
            fc, att, sentis = reqs[(t * per_thread + k) % len(reqs)]
            t0 = time.perf_counter()
            batcher.submit(fc, att, sentis, forced_label=IDS.neutral,
                           timeout=600)
            dt = time.perf_counter() - t0
            with lat_lock:
                lat.append(dt)

    ts = [threading.Thread(target=worker, args=(t,))
          for t in range(n_threads)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    lat = np.asarray(sorted(lat))
    n = n_threads * per_thread
    return {"requests_per_s": n / wall,
            "p50_ms": float(lat[len(lat) // 2] * 1e3),
            "p95_ms": float(lat[int(len(lat) * 0.95)] * 1e3),
            "stats": batcher.stats()}


def _mk(settings, V, M, hw, beam, T, bucket, wait_s, dtype):
    cp = cap.init_params(jax.random.PRNGKey(0), V, 3, settings)
    sp = sd.init_params(jax.random.PRNGKey(1), 3, settings)
    b = DynamicBatcher(cp, sp, settings=settings, ids=IDS, beam_size=beam,
                       max_seq_len=T, bucket_sizes=(bucket,),
                       max_wait_s=wait_s, num_sentiments=M, att_hw=hw,
                       compute_dtype=dtype)
    b.warm()
    return b, cp


def _reqs(settings, V, M, hw, n, seed=0):
    g = np.random.default_rng(seed)
    return [(g.normal(size=(settings.fc_feat_dim,)).astype(np.float32),
             g.normal(size=hw + (settings.att_feat_dim,)).astype(
                 np.float32),
             g.integers(4, V, size=(M,)).astype(np.int32))
            for _ in range(n)]


def overhead():
    """Tiny dims: batcher rate vs direct full-batch dispatch rate."""
    s = Settings(word_emb_dim=16, fc_feat_dim=24, att_feat_dim=24,
                 feat_emb_dim=16, rnn_hid_dim=16, att_hid_dim=16,
                 concept_mid_dim=24)
    V, M, hw, bucket, T = 50, 6, (7, 7), 32, 8
    b, cp = _mk(s, V, M, hw, 2, T, bucket, 0.05, "float32")
    reqs = _reqs(s, V, M, hw, bucket)
    r = _run_pool(b, reqs, n_threads=bucket, per_thread=8)
    b.close()

    # direct baseline: the same 8 full batches, no daemon machinery
    fn = inference.make_forced_serving_fn(s, IDS, 2, T)
    fc = jnp.asarray(np.stack([q[0] for q in reqs]))
    att = jnp.asarray(np.stack([q[1] for q in reqs]))
    sn = jnp.asarray(np.stack([q[2] for q in reqs]))
    lab = jnp.full((bucket,), IDS.neutral, jnp.int32)
    np.asarray(fn(cp, fc, att, sn, lab)[0])            # compile+sync
    t0 = time.perf_counter()
    for _ in range(8):
        out = fn(cp, fc, att, sn, lab)
    np.asarray(out[0])
    direct = bucket * 8 / (time.perf_counter() - t0)
    print(f"overhead mode (tiny dims, bucket {bucket}): "
          f"daemon {r['requests_per_s']:.0f} req/s vs direct "
          f"{direct:.0f} req/s -> machinery factor "
          f"{direct / r['requests_per_s']:.2f}x; "
          f"batches {r['stats']['batches']}, p50 {r['p50_ms']:.1f} ms",
          flush=True)


def e2e():
    """Production dims; attribute the host->device share explicitly."""
    s = Settings()
    V, M, hw, bucket, T = 10000, 10, (14, 14), 128, 16
    dtype = "bfloat16" if jax.default_backend() != "cpu" else "float32"
    b, _ = _mk(s, V, M, hw, 3, T, bucket, 0.25, dtype)
    reqs = _reqs(s, V, M, hw, bucket)
    r = _run_pool(b, reqs, n_threads=bucket, per_thread=4)
    b.close()

    # the staging share alone: ship the same per-batch bytes, no compute
    feat = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    att_np = np.stack([q[1] for q in reqs]).astype(feat)
    t0 = time.perf_counter()
    for _ in range(4):
        dev = jnp.asarray(att_np)
        np.asarray(dev.sum())          # force materialization (scalar)
    h2d_ms = (time.perf_counter() - t0) / 4 * 1e3
    mb = att_np.nbytes / 1e6
    print(f"e2e mode (full dims, bucket {bucket}, {dtype}): "
          f"{r['requests_per_s']:.0f} req/s, p50 {r['p50_ms']:.0f} ms, "
          f"p95 {r['p95_ms']:.0f} ms; host->device staging alone: "
          f"{h2d_ms:.0f} ms per {mb:.0f} MB batch "
          f"({mb / h2d_ms * 1e3:.0f} MB/s link)", flush=True)


def image():
    """Encode-stage batching win: EncodeBatcher (batched encoder +
    concept top-k per dispatch) vs the retired r3 pattern (one bs=1
    encoder forward + one bs=1 top-k per request, serialized per
    handler thread)."""
    from insenticap_model_tpu.models import concept_detector as cpt_det
    from insenticap_model_tpu.models import encoder as enc
    from insenticap_model_tpu.serving_daemon import EncodeBatcher

    on_tpu = jax.default_backend() != "cpu"
    # production shape on the chip; same trunk at a CPU-feasible shape
    # otherwise (machinery ratio, not an absolute rate)
    hw = (448, 448) if on_tpu else (64, 64)
    bucket = 32 if on_tpu else 8
    per_thread = 4 if on_tpu else 2
    n_cpt, n_reqs = 5, 64

    from insenticap_model_tpu.utils.dtypes import cast_bf16
    params = enc.init_params(jax.random.PRNGKey(0))
    if on_tpu:  # the measured encoder serving policy
        params = cast_bf16(params)
    enc_apply = jax.jit(lambda x: enc.forward_raw_batch(params, x))
    cs = Settings()
    cpt_params = cpt_det.init_params(jax.random.PRNGKey(1), 100, cs)
    cpt_apply = jax.jit(lambda fc: cpt_det.sample(
        cpt_params, fc.astype(jnp.float32), n_cpt)[1])

    g = np.random.default_rng(0)
    imgs = [g.integers(0, 256, size=hw + (3,)).astype(np.uint8)
            for _ in range(n_reqs)]

    b = EncodeBatcher(enc_apply, cpt_apply, fc_dim=cs.fc_feat_dim,
                      shape_buckets=(hw,), batch_buckets=(1, bucket),
                      max_wait_s=0.02)
    b.warm()
    lat = []
    lat_lock = threading.Lock()

    def worker(t):
        for k in range(per_thread):
            t0 = time.perf_counter()
            b.submit_image(imgs[(t * per_thread + k) % n_reqs],
                           timeout=600)
            with lat_lock:
                lat.append(time.perf_counter() - t0)

    ts = [threading.Thread(target=worker, args=(t,))
          for t in range(bucket)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    batched = bucket * per_thread / wall
    st = b.stats()
    b.close()

    # retired pattern: bs=1 encoder + bs=1 top-k per request (what
    # cli/serve.py:166 did before r4), same total request count
    x1 = jnp.asarray(imgs[0][None])
    fc1, _ = enc_apply(x1)
    np.asarray(cpt_apply(fc1)).sum()       # compile+sync bs=1 programs
    t0 = time.perf_counter()
    for k in range(bucket * per_thread):
        fc1, att1 = enc_apply(jnp.asarray(imgs[k % n_reqs][None]))
        top = cpt_apply(fc1)
        # materialize everything the retired path handed the decode
        # stage — on the tunnel att's [1,14,14,F] device->host transfer
        # is a dominant per-request cost; skipping it would flatter the
        # baseline and overstate nothing/understate the batched win
        np.asarray(fc1), np.asarray(att1), np.asarray(top)
    bs1 = bucket * per_thread / (time.perf_counter() - t0)

    lat = np.asarray(sorted(lat))
    print(f"image mode ({hw[0]}x{hw[1]}, bucket {bucket}, "
          f"{'bf16/TPU' if on_tpu else 'f32/CPU'}): "
          f"EncodeBatcher {batched:.1f} img/s (p50 "
          f"{lat[len(lat) // 2] * 1e3:.0f} ms, p95 "
          f"{lat[int(len(lat) * 0.95)] * 1e3:.0f} ms) vs bs=1-per-request "
          f"{bs1:.1f} img/s -> {batched / bs1:.2f}x; "
          f"dispatches {st['batches']}, padded {st['padded_rows']}",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which not in ("overhead", "e2e", "image", "both", "all"):
        raise SystemExit(
            "usage: bench_daemon.py [overhead|e2e|image|all]")
    if which in ("overhead", "both", "all"):
        overhead()
    if which in ("e2e", "both", "all"):
        e2e()
    if which in ("image", "all"):
        image()
