"""Sustained-load soak of the serving daemon's full machinery.

The raw serving loop has a 500-batch zero-RSS-growth soak (DESIGN.md
round-2b); this is the same discipline applied to the DAEMON layer the
r4 hardening added on top of it — dynamic batching, condition-wait
submit, stall watchdog, per-bucket latency percentiles, graceful drain.
Closed-loop producer threads drive production-dim requests through a
DynamicBatcher for a fixed wall duration while the tool samples:

  * RSS (VmRSS) — must not grow beyond the KNOWN environment artifact
    (see below) across the soak: leaked buffers in the batcher rings /
    pallas kernels / staging path would show here;
  * watchdog health (stalled_for) — must stay far below the serve.py
    default unhealthy threshold for the whole run;
  * per-bucket p50/p99 from stats() — must be stable between the first
    and second half (no latency creep under saturation).

Ends with close() mid-load to exercise the drain path under pressure.
On this environment the request rate itself measures the ~19 MB/s
tunnel link (see tools/bench_daemon.py e2e); the soak's subject is the
machinery, not the rate.

KNOWN ENVIRONMENT ARTIFACT (discovered by this soak's first chip run,
+4.5 GB/150 s): the experimental axon tunnel client leaks host RSS
~1:1 with every host->device transfer. Minimal repro independent of
the daemon: `x = jnp.asarray(51MB); x.sum(); del x` leaks 49 MB/iter
on the axon backend and is flat on the CPU backend; x.delete() and
jax.device_put change nothing. The verdict therefore allows growth up
to the bytes this process shipped (tracked from the batch count) plus
slack, and FAILS only on growth beyond that — a daemon-side leak.
Daemon machinery cleanliness below the artifact is covered by the CPU
soak (tests/test_serving_daemon.py::test_soak_tool_sustained_load and
--secs on the CPU backend: flat RSS). On a real co-located TPU host
(standard PJRT) the artifact does not apply.

    python tools/soak_daemon.py [--secs 150] [--bucket 64] [--threads 64]

Run on the real chip (default env). Chip record: DESIGN.md round-4.
"""
import argparse
import sys
import threading
import time

import numpy as np

import jax

sys.path.insert(0, ".")
from insenticap_model_tpu.config import Settings  # noqa: E402
from insenticap_model_tpu.models import captioner as cap  # noqa: E402
from insenticap_model_tpu.models import sentiment_detector as sd  # noqa: E402
from insenticap_model_tpu.serving_daemon import DynamicBatcher  # noqa: E402

IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
V, M, HW, T = 10000, 10, (14, 14), 16


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=0,
                    help="0 = 150 on TPU, 20 elsewhere")
    ap.add_argument("--bucket", type=int, default=0,
                    help="0 = 64 on TPU, 8 elsewhere")
    ap.add_argument("--threads", type=int, default=0, help="0 = bucket")
    a = ap.parse_args()
    on_tpu = jax.default_backend() == "tpu"
    secs = a.secs or (150.0 if on_tpu else 20.0)
    bucket = a.bucket or (64 if on_tpu else 8)
    threads = a.threads or bucket
    s = Settings()
    dtype = "bfloat16" if on_tpu else "float32"

    cp = cap.init_params(jax.random.PRNGKey(0), V, 3, s)
    sp = sd.init_params(jax.random.PRNGKey(1), 3, s)
    b = DynamicBatcher(cp, sp, settings=s, ids=IDS, beam_size=3,
                       max_seq_len=T, bucket_sizes=(bucket,),
                       max_wait_s=0.25, num_sentiments=M, att_hw=HW,
                       compute_dtype=dtype)
    b.warm()
    g = np.random.default_rng(0)
    reqs = [(g.normal(size=(s.fc_feat_dim,)).astype(np.float32),
             g.normal(size=HW + (s.att_feat_dim,)).astype(np.float32),
             g.integers(4, V, size=(M,)).astype(np.int32))
            for _ in range(bucket)]

    stop = threading.Event()
    done = [0] * threads
    errs = []

    def worker(t):
        k = 0
        while not stop.is_set():
            fc, att, sn = reqs[(t + k) % len(reqs)]
            try:
                b.submit(fc, att, sn, forced_label=IDS.neutral, timeout=600)
            except Exception as e:  # noqa: BLE001 — soak records failures
                errs.append(repr(e))
                return
            done[t] += 1
            k += 1

    ts = [threading.Thread(target=worker, args=(t,)) for t in range(threads)]
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    for t in ts:
        t.start()

    samples = []
    half_mark = None
    while time.perf_counter() - t0 < secs:
        time.sleep(min(10.0, secs / 6))
        el = time.perf_counter() - t0
        st = b.stats()
        samples.append((el, _rss_mb(), b.stalled_for(),
                        st["batches"], sum(done)))
        lat = st["latency_by_bucket"].get(bucket, {})
        print(f"t={el:5.0f}s rss={samples[-1][1]:7.1f}MB "
              f"stall={samples[-1][2]:5.2f}s batches={st['batches']:4d} "
              f"reqs={sum(done):5d} p50={lat.get('p50_ms', 0):7.0f}ms "
              f"p99={lat.get('p99_ms', 0):7.0f}ms", flush=True)
        if half_mark is None and el >= secs / 2:
            half_mark = dict(lat)

    # drain UNDER load: close() while producers are still submitting
    t_close0 = time.perf_counter()
    b.close()
    drain_s = time.perf_counter() - t_close0
    stop.set()
    for t in ts:
        t.join(timeout=30)

    wall = time.perf_counter() - t0
    st = b.stats()
    lat = st["latency_by_bucket"].get(bucket, {})
    rss1 = max((r for _, r, _, _, _ in samples), default=rss0)
    max_stall = max((x for _, _, x, _, _ in samples), default=0.0)
    n = sum(done)
    # bytes this process shipped to the device (the axon tunnel's
    # known per-transfer RSS artifact scales with exactly this)
    feat_bytes = 2 if dtype == "bfloat16" else 4
    per_batch_mb = bucket * (
        s.fc_feat_dim * feat_bytes
        + HW[0] * HW[1] * s.att_feat_dim * feat_bytes
        + M * 4 + 4) / 1e6
    shipped_mb = st["batches"] * per_batch_mb
    beyond_mb = (rss1 - rss0) - shipped_mb * 1.25
    # producers racing close() legitimately see Saturated/closed errors;
    # anything else is a machinery failure
    bad = [e for e in errs if "closed" not in e and "Saturated" not in e]
    ok = (not bad and n > 0 and beyond_mb < 256.0 and max_stall < 60.0)
    print(f"SOAK {'OK' if ok else 'FAIL'}: {n} reqs in {wall:.0f}s "
          f"({n / wall:.1f} req/s), {st['batches']} batches, "
          f"rss {rss0:.0f}->{rss1:.0f}MB (peak delta {rss1 - rss0:+.0f}MB; "
          f"shipped {shipped_mb:.0f}MB -> growth beyond the axon "
          f"transfer artifact {max(beyond_mb, 0):.0f}MB), "
          f"max stall {max_stall:.2f}s, "
          f"drain-under-load {drain_s:.2f}s, "
          f"p50 {lat.get('p50_ms', 0):.0f}ms p99 {lat.get('p99_ms', 0):.0f}ms"
          + (f", half-mark p50 {half_mark.get('p50_ms', 0):.0f}ms"
             if half_mark else "")
          + (f", errors: {bad[:3]}" if bad else ""), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
