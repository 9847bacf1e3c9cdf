"""Dynamic-batching serving daemon: concurrent requests ride the batched
beam-search hot path at full utilization.

The reference has no serving layer — its decode path runs one image at a
time inside train_rl's test loop (``Detector.sample``,
/root/reference/models/decoder.py:182-192, driven per image at
/root/reference/train_rl.py:271-279). This module adds the production
composition for the TPU build:

* Requests (features + sentiment-word ids + auto/forced label) queue up
  and a single dispatch thread coalesces them into batches.
* Batches are padded up a fixed BUCKET LADDER of static shapes, so XLA
  compiles O(#buckets) programs once, never per request count (the same
  static-shape discipline as ``preprocessing``'s feature buckets).
  Padding rows repeat a live row; per-row independence of the batched
  beam search (proved by tests/test_inference.py::test_sweep_sentiments)
  makes padding free of cross-row effects.
* Sentiment is resolved ROW-WISE: the image sentiment detector runs on
  the whole batch, then forced rows override the detected label, and one
  forced-label decode program serves the mixed batch. This splits the
  single fused detect+decode program into two dispatches (~1.3 ms/batch
  on the tunnel, CLAUDE.md) in exchange for per-request sentiment
  control in mixed batches.
* ``EncodeBatcher`` gives the image→features stage (ResNet encoder +
  concept top-k) the same treatment: raw-uint8 images coalesce per
  resize-bucket shape into batched ``encoder.forward_raw_batch`` calls,
  and concept top-k rides the same batch — no bs=1 encoder forwards
  under concurrent load (the two batchers form a two-stage pipeline,
  each HTTP handler thread carrying its request encode→decode).

Latency/throughput trade is explicit: ``max_wait_s`` bounds the time the
first request in a batch waits for co-riders; a full largest-bucket
batch dispatches immediately.

Thread model (per batcher): any number of producer threads call
``submit``; a dispatch thread stacks/ships/launches (JAX dispatch is
asynchronous, so launched arrays are futures) and a completion thread
materializes results and fans them out — batch N+1 ships while batch
N's results drain back (double buffering, bounded at 2 batches in
flight). Saturated producers block on a Condition the dispatch thread
signals as it drains the queue (no polling). ``close()`` drains and
joins both threads.

Multi-HOST (``mesh`` spanning ``jax.process_count() > 1`` processes —
multi-controller JAX requires every process to issue the same program):
process 0 owns HTTP + batching and, per dispatch, broadcasts a control
vector + the host batch; every other process mirrors it from
``follower_loop()`` — stage stripe, run the sharded programs, allgather
— so collectives stay ordered. Dispatch is synchronous there (no double
buffering: pipelined batches would interleave collectives). Proved
token-exact vs single-process by tools/multihost_daemon_check.py.
"""
from __future__ import annotations

import collections
import queue
import threading
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import inference
from .models import captioner as cap
from .models import sentiment_detector as senti_det
from .utils.dtypes import cast_bf16

AUTO = -1  # submit(forced_label=AUTO) -> use the image sentiment detector

DEFAULT_BUCKETS = (1, 8, 32, 128, 384)

# Batch ladder for the encode stage. Smaller cap than the decode
# ladder: the encoder is compute-heavy per row (bs=32 is already at its
# measured throughput plateau, tools/bench_encoder.py: 1,590 img/s vs
# bs=16's 1,238) and each (shape-bucket, batch-bucket) pair costs one
# XLA compile.
DEFAULT_ENCODE_BUCKETS = (1, 4, 16, 32)

# per-bucket request-latency ring size for stats() percentiles
_LAT_WINDOW = 1024


def _round_ladder(buckets: Sequence[int], mesh) -> Tuple[int, ...]:
    """Round a bucket ladder UP to data-axis multiples (each device
    needs an equal shard), deduped — e.g. (1,8,32,128,384) on an
    8-device mesh -> (8,32,128,384). No-op without a mesh."""
    if mesh is None:
        return tuple(buckets)
    n = int(mesh.shape["data"])
    return tuple(sorted({-(-b // n) * n for b in buckets}))


def _require_mesh_multiples(buckets: Sequence[int], mesh, hint: str):
    """Explicit bucket ladders must already be data-axis multiples —
    a silently rounded explicit value would compile surprise shapes."""
    n = int(mesh.shape["data"])
    bad = [b for b in buckets if b % n]
    if bad:
        raise ValueError(
            f"bucket sizes {bad} are not multiples of the mesh data "
            f"axis ({n}) — use {hint} or pass multiples")


def default_buckets(mesh=None) -> Tuple[int, ...]:
    """The default decode-stage bucket ladder (mesh-rounded)."""
    return _round_ladder(DEFAULT_BUCKETS, mesh)


def default_encode_buckets(mesh=None) -> Tuple[int, ...]:
    """The default encode-stage batch ladder (mesh-rounded)."""
    return _round_ladder(DEFAULT_ENCODE_BUCKETS, mesh)


class Saturated(RuntimeError):
    """Request queue full past enqueue_timeout — shed load upstream
    (the HTTP layer maps this to 503)."""


class _RequestBase:
    __slots__ = ("done", "result", "error", "t0")

    def __init__(self):
        self.done = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None
        self.t0 = 0.0   # set at enqueue; stats() latency = done - t0


class _BatcherBase:
    """Shared two-stage (dispatch + completion) batching machinery.

    Subclasses implement ``_dispatch(batch)`` (stack/ship/launch, then
    ``self._fq.put(item)``) and ``_finish(item)`` (materialize, record
    stats via ``_record_batch``, fan out). ``bucket_keys`` are the
    stats/latency bucket labels (decode: batch sizes; encode: shape
    tags)."""

    def __init__(self, *, cap_n: int, max_wait_s: float, max_queue: int,
                 bucket_keys: Sequence, name: str):
        self._cap_n = int(cap_n)
        self._max_wait_s = float(max_wait_s)
        # mesh-mode subclasses set a NamedSharding BEFORE super().__init__
        # (see _stage); single-device batchers leave it None
        self._batch_sharding = getattr(self, "_batch_sharding", None)
        # health watchdog state: monotonic start of the in-progress
        # dispatch/finish step, None when idle (see stalled_for)
        self._dispatch_started: Optional[float] = None
        self._finish_started: Optional[float] = None
        self._q: "queue.Queue[Optional[_RequestBase]]" = \
            queue.Queue(max_queue)
        # dispatched-but-unmaterialized batches; bound = 2 batches in
        # flight (double buffering: ship batch N+1 while N's results
        # drain back), blocking the dispatch thread beyond that
        self._fq: "queue.Queue" = queue.Queue(2)
        self._closed = False
        # serializes the closed-check+enqueue against close()'s
        # closed-set+sentinel, so no request can land BEHIND the sentinel
        # (where it would never be served nor errored). The Condition
        # shares this lock: saturated producers wait on it and the
        # dispatch thread notifies as it drains the queue (advisor r3:
        # no 1 kHz poll under saturation).
        self._submit_lock = threading.Lock()
        self._space = threading.Condition(self._submit_lock)
        self._stats = {"requests": 0, "batches": 0,
                       "by_bucket": {k: 0 for k in bucket_keys},
                       "padded_rows": 0,
                       "failed_requests": 0, "failed_batches": 0}
        self._lat: Dict = {k: collections.deque(maxlen=_LAT_WINDOW)
                           for k in bucket_keys}
        self._stats_lock = threading.Lock()
        self._worker = threading.Thread(target=self._loop, daemon=True,
                                        name=f"{name}-batcher")
        self._finisher = threading.Thread(target=self._finish_loop,
                                          daemon=True,
                                          name=f"{name}-finisher")
        self._worker.start()
        self._finisher.start()

    # -- producer side ------------------------------------------------------

    def _enqueue_and_wait(self, r: _RequestBase,
                          timeout: Optional[float],
                          enqueue_timeout: Optional[float]):
        """Shared submit tail: enqueue (Condition-blocked when the queue
        is full), wait for completion, deliver result or raise."""
        # t0 stamps SUBMIT time, before any wait for queue space — the
        # stats() percentiles must include saturation queueing delay,
        # which is exactly when an operator reads them
        r.t0 = time.monotonic()
        deadline = None if enqueue_timeout is None \
            else r.t0 + enqueue_timeout
        with self._space:
            while True:
                if self._closed:
                    raise RuntimeError("batcher is closed")
                try:
                    self._q.put_nowait(r)
                    break
                except queue.Full:
                    pass
                if deadline is None:
                    self._space.wait()
                else:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0 or not self._space.wait(remaining):
                        raise Saturated(
                            f"request queue full ({self._q.maxsize}) past "
                            f"enqueue_timeout={enqueue_timeout}s")
        if not r.done.wait(timeout):
            raise TimeoutError("serving request timed out")
        if r.error is not None:
            raise r.error
        return r.result

    def stats(self) -> Dict:
        with self._stats_lock:
            out = dict(self._stats)
            out["by_bucket"] = dict(self._stats["by_bucket"])
            lat = {}
            for k, ring in self._lat.items():
                if not ring:
                    continue
                xs = np.sort(np.asarray(ring))
                lat[k] = {
                    "n": int(xs.size),
                    "p50_ms": round(float(np.percentile(xs, 50)) * 1e3, 3),
                    "p99_ms": round(float(np.percentile(xs, 99)) * 1e3, 3),
                }
            out["latency_by_bucket"] = lat
        return out

    def close(self) -> None:
        """Drain queued requests, stop both stage threads."""
        with self._space:
            if self._closed:
                return
            self._closed = True
            self._space.notify_all()   # wake saturated producers -> closed
        # sentinel OUTSIDE the lock: a full queue would otherwise block
        # close() while producers can no longer free space (they see
        # closed); the dispatch thread drains regardless of the lock
        self._q.put(None)              # after any queued work
        self._worker.join()            # dispatch forwards sentinel on exit
        self._finisher.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # -- dispatch thread ----------------------------------------------------

    def _collect(self) -> Optional[List[_RequestBase]]:
        """Block for the first request, then coalesce co-riders until the
        batch cap fills or the oldest request has waited max_wait_s."""
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.monotonic() + self._max_wait_s
        while len(batch) < self._cap_n:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                r = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if r is None:          # close(): serve what we have, then stop
                self._q.put(None)
                break
            batch.append(r)
        # queue space was freed — wake producers blocked in _enqueue
        with self._space:
            self._space.notify_all()
        return batch

    def _stage(self, x):
        """Host array -> device. Host-side dtype casts happen BEFORE
        shipping (bf16 halves link bytes); in mesh mode device_put shards
        the host array straight across the data axis (no single-device
        bounce). Shared by _dispatch and warm() so both produce the same
        input-sharding signature (one jit executable per bucket)."""
        if self._batch_sharding is not None:
            return jax.device_put(x, self._batch_sharding)
        return jnp.asarray(x)

    def _loop(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                self._fq.put(None)            # forward shutdown downstream
                return
            self._dispatch_started = time.monotonic()
            try:
                self._dispatch(batch)
            except BaseException as e:  # deliver, don't kill the thread
                self._fail_batch(batch, e)
            finally:
                self._dispatch_started = None

    def _finish_loop(self) -> None:
        while True:
            item = self._fq.get()
            if item is None:
                return
            self._finish_started = time.monotonic()
            try:
                self._finish(item)
            finally:
                self._finish_started = None

    def stalled_for(self) -> float:
        """Age in seconds of the OLDEST in-progress dispatch/finish
        step, 0.0 when both threads are idle or draining queues. A
        wedged device runtime (e.g. the backend link dying mid-run —
        block_until_ready/transfers never return) pins one of these
        forever; /healthz surfaces it so load balancers stop routing to
        a daemon whose worker threads can no longer make progress."""
        now = time.monotonic()
        ages = [now - t for t in (self._dispatch_started,
                                  self._finish_started) if t is not None]
        return max(ages, default=0.0)

    def healthy(self, max_stall_s: float) -> bool:
        return self.stalled_for() < max_stall_s

    # -- bookkeeping shared by subclasses ------------------------------------

    def _fail_batch(self, batch: List[_RequestBase],
                    e: BaseException) -> None:
        """Failed traffic must still show in /stats — an operator
        watching a daemon that receives-and-fails load should not see
        flat counters."""
        with self._stats_lock:
            self._stats["failed_requests"] += len(batch)
            self._stats["failed_batches"] += 1
        for r in batch:
            r.error = e
            r.done.set()

    def _record_batch(self, batch: List[_RequestBase], bucket_key,
                      pad: int) -> None:
        """Stats BEFORE done-events: a caller returning from submit()
        must already see its request counted."""
        now = time.monotonic()
        with self._stats_lock:
            self._stats["requests"] += len(batch)
            self._stats["batches"] += 1
            self._stats["by_bucket"][bucket_key] += 1
            self._stats["padded_rows"] += pad
            self._lat[bucket_key].extend(now - r.t0 for r in batch)

    # -- subclass hooks -------------------------------------------------------

    def _dispatch(self, batch: List[_RequestBase]) -> None:
        raise NotImplementedError

    def _finish(self, item) -> None:
        raise NotImplementedError


# Multi-HOST daemon control plane (see DynamicBatcher mesh= docs):
# process 0 owns HTTP + batching; every other process sits in
# follower_loop(), executing the identical sharded programs in lockstep.
# Before each device dispatch, p0 broadcasts a fixed-shape control
# vector [opcode, bucket, run_detect] and then the host batch arrays
# (shapes derivable from the control vector on every process), so all
# Gloo/ICI collectives are issued in the same order everywhere. In this
# mode dispatch is SYNCHRONOUS (compute + allgather complete on the
# dispatch thread) — the double-buffer pipeline would interleave
# collectives from two batches across processes.
_MP_EXEC, _MP_STOP = 0, 1


class _Request(_RequestBase):
    __slots__ = ("fc", "att", "sentis", "forced_label")

    def __init__(self, fc, att, sentis, forced_label):
        super().__init__()
        self.fc = fc
        self.att = att
        self.sentis = sentis
        self.forced_label = forced_label


class DynamicBatcher(_BatcherBase):
    """Coalesce feature-level caption requests into static-shape batches.

    Parameters
    ----------
    cap_params / senti_params : captioner + sentiment-detector params
        (the composite RL checkpoint's serving halves).
    settings, ids : architecture settings + TokenIds.
    bucket_sizes : ascending static batch shapes; the largest is the
        dispatch cap. One XLA compile per bucket per program.
    max_wait_s : how long the OLDEST queued request may wait for
        co-riders before a partial batch dispatches.
    senti_threshold : detector confidence below which auto rows fall
        back to neutral (reference decoder.py:41's 0.7).
    mesh : optional jax.sharding.Mesh — multi-chip serving: params
        replicate, every batch shards over the mesh's `data` axis, and
        both programs run per-device via shard_map (token-identical to
        single-device; every bucket must be a MULTIPLE of the data-axis
        size so each device gets an equal shard).
    """

    def __init__(self, cap_params, senti_params, *, settings, ids,
                 beam_size: int = 3, max_seq_len: int = 16,
                 bucket_sizes: Optional[Sequence[int]] = None,
                 max_wait_s: float = 0.005,
                 senti_threshold: float = inference.SENTI_THRESHOLD,
                 num_sentiments: int = 10, att_hw: Tuple[int, int] = (14, 14),
                 num_cats: int = 3, compute_dtype: str = "float32",
                 mesh=None, max_queue: int = 4096):
        if bucket_sizes is None:
            bucket_sizes = default_buckets(mesh)
        if list(bucket_sizes) != sorted(set(bucket_sizes)):
            raise ValueError(f"bucket_sizes must be ascending/unique: "
                             f"{bucket_sizes}")
        if mesh is not None:
            _require_mesh_multiples(bucket_sizes, mesh,
                                    "default_buckets(mesh)")
        self._ids = ids
        # bf16 is the measured TPU serving policy (CLAUDE.md / bench.py):
        # params cast once here, features cast HOST-side per batch — that
        # also halves host->device bytes, the dominant cost on slow links
        if compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"compute_dtype {compute_dtype!r}")
        self._feat_dtype = jnp.bfloat16 if compute_dtype == "bfloat16" \
            else jnp.float32
        if compute_dtype == "bfloat16":
            cap_params = cast_bf16(cap_params)
            senti_params = cast_bf16(senti_params)
        # every program shape is static: per-row feature shapes are fixed
        # at construction and enforced in submit() — a drifting shape
        # would otherwise trigger a silent multi-minute recompile
        self._fc_shape = (settings.fc_feat_dim,)
        self._att_shape = tuple(att_hw) + (settings.att_feat_dim,)
        self._m = int(num_sentiments)
        self._num_cats = int(num_cats)
        self._buckets = tuple(int(b) for b in bucket_sizes)
        self._batch_sharding = None
        if mesh is None:
            self._cap_params = cap_params
            self._senti_params = senti_params
            self._detect = inference.make_detect_fn(senti_threshold,
                                                    ids.neutral)
            self._serve = inference.make_forced_serving_fn(
                settings, ids, beam_size, max_seq_len)
        else:
            # multi-chip serving: params replicate, batches shard over
            # the mesh's data axis, and both programs run per-device via
            # shard_map (the path that keeps the pallas decode kernels
            # legal — see inference.make_sharded_serving_fn)
            from jax.sharding import NamedSharding, PartitionSpec as P
            from .parallel import mesh as pmesh
            self._cap_params = pmesh.replicate(mesh, cap_params)
            self._senti_params = pmesh.replicate(mesh, senti_params)
            self._detect = inference.make_sharded_detect_fn(
                mesh, senti_threshold, ids.neutral)
            self._serve = inference.make_sharded_forced_serving_fn(
                mesh, settings, ids, beam_size, max_seq_len)
            self._batch_sharding = NamedSharding(mesh, P("data"))
        # multi-HOST mode: the mesh spans processes -> lockstep control
        # plane (p0 broadcasts, followers mirror; see _MP_EXEC above)
        self._mp = mesh is not None and jax.process_count() > 1
        super().__init__(cap_n=self._buckets[-1], max_wait_s=max_wait_s,
                         max_queue=max_queue, bucket_keys=self._buckets,
                         name="isc-serve")

    # -- public API -------------------------------------------------------

    def submit(self, fc, att, sentis, forced_label: int = AUTO,
               timeout: Optional[float] = None,
               enqueue_timeout: Optional[float] = None):
        """Caption one image. Blocks until its batch completes.

        fc [Ff] float, att [14, 14, Fa] float, sentis [M] int32 ranked
        sentiment-word ids (PAD-padded), forced_label AUTO or a
        sentiment index. Returns (seqs [beam, T] int32 desc-sorted,
        scores [beam] f32, label int).

        enqueue_timeout: how long to wait for queue space when the
        daemon is saturated — None blocks indefinitely (library
        backpressure); a number raises Saturated past the deadline so
        the caller can shed load (HTTP 503).
        """
        if self._closed:
            raise RuntimeError("batcher is closed")
        fc = np.asarray(fc)
        att = np.asarray(att)
        sentis = np.asarray(sentis, np.int32)
        if (fc.shape != self._fc_shape or att.shape != self._att_shape
                or sentis.shape != (self._m,)):
            raise ValueError(
                f"request shapes {fc.shape}/{att.shape}/{sentis.shape} != "
                f"expected {self._fc_shape}/{self._att_shape}/"
                f"({self._m},) — the ladder's programs are static-shaped")
        if forced_label != AUTO and not 0 <= forced_label < self._num_cats:
            raise ValueError(f"forced_label {forced_label} not in "
                             f"[0, {self._num_cats}) or AUTO")
        if self._mp and jax.process_index() != 0:
            raise RuntimeError("multi-host daemon: submit() only on "
                               "process 0 (followers run follower_loop)")
        r = _Request(fc, att, sentis, int(forced_label))
        return self._enqueue_and_wait(r, timeout, enqueue_timeout)

    # -- dispatch/finish --------------------------------------------------

    def _dispatch(self, batch: List[_Request]) -> None:
        """Stage 1: stack, ship, launch the device programs. JAX dispatch
        is asynchronous, so the returned arrays are futures — they go to
        the completion thread, which materializes and fans out while THIS
        thread collects and ships the next batch (host/device pipelining;
        _fq's bound gives backpressure at 2 batches in flight). Labels
        stay ON DEVICE: forced rows merge with detected rows via a
        device-side where, avoiding a detect->host->serve round-trip."""
        n = len(batch)
        # _collect caps batches at buckets[-1], so this always matches
        bucket = next(b for b in self._buckets if b >= n)
        pad = bucket - n
        rows = batch + [batch[-1]] * pad      # repeat a live row

        fc_h = np.stack([r.fc for r in rows]).astype(self._feat_dtype)
        att_h = np.stack([r.att for r in rows]).astype(self._feat_dtype)
        sentis_h = np.stack([r.sentis for r in rows])
        forced_h = np.asarray([r.forced_label for r in rows], np.int32)
        run_detect = bool((forced_h == AUTO).any())

        if self._mp:
            # lockstep multi-host path: broadcast, execute, allgather —
            # results come back as host arrays (finish just fans out)
            out = self._mp_dispatch(bucket, fc_h, att_h, sentis_h,
                                    forced_h, run_detect)
            self._fq.put((batch, bucket, pad) + out)
            return

        stage = self._stage
        fc = stage(fc_h)
        att = stage(att_h)
        sentis = stage(sentis_h)
        forced_dev = stage(forced_h)
        if run_detect:
            detected = self._detect(self._senti_params, att)
            labels = jnp.where(forced_dev == AUTO, detected, forced_dev)
        else:
            labels = forced_dev

        seqs, scores = self._serve(self._cap_params, fc, att, sentis,
                                   labels)
        self._fq.put((batch, bucket, pad, seqs, scores, labels))

    # -- multi-host control plane (mesh spans processes) -------------------

    def _mp_dispatch(self, bucket, fc_h, att_h, sentis_h, forced_h,
                     run_detect):
        """Process 0 side: announce the step, ship the host batch to
        every process, run the lockstep execution."""
        from jax.experimental import multihost_utils as mhu
        ctrl = np.asarray([_MP_EXEC, bucket, int(run_detect)], np.int32)
        mhu.broadcast_one_to_all(ctrl)
        fc_h = np.asarray(mhu.broadcast_one_to_all(fc_h))
        att_h = np.asarray(mhu.broadcast_one_to_all(att_h))
        sentis_h = np.asarray(mhu.broadcast_one_to_all(sentis_h))
        forced_h = np.asarray(mhu.broadcast_one_to_all(forced_h))
        return self._mp_exec(fc_h, att_h, sentis_h, forced_h, run_detect)

    def _mp_exec(self, fc_h, att_h, sentis_h, forced_h, run_detect):
        """Every process: stage its stripe of the (identical) host
        batch as global data-sharded arrays, run the sharded programs,
        allgather full results to the host. Collective order is fixed:
        [detect?] -> serve -> 3x allgather."""
        from jax.experimental import multihost_utils as mhu
        sh = self._batch_sharding

        def mk(v):
            # every process holds the full host batch; each provides the
            # blocks for ITS addressable devices (handles any device ->
            # process layout)
            return jax.make_array_from_callback(
                v.shape, sh, lambda idx: v[idx])

        fc, att = mk(fc_h), mk(att_h)
        sentis, forced = mk(sentis_h), mk(forced_h)
        if run_detect:
            detected = self._detect(self._senti_params, att)
            labels = jnp.where(forced == AUTO, detected, forced)
        else:
            labels = forced
        seqs, scores = self._serve(self._cap_params, fc, att, sentis,
                                   labels)
        seqs = np.asarray(mhu.process_allgather(seqs, tiled=True))
        scores = np.asarray(mhu.process_allgather(scores, tiled=True),
                            np.float32)
        labels = np.asarray(mhu.process_allgather(labels, tiled=True))
        return seqs, scores, labels

    def follower_loop(self) -> None:
        """Run on every process with jax.process_index() != 0: mirror
        process 0's dispatches until it closes. The daemon's HTTP side
        never runs here — this thread only keeps the collectives
        lockstep."""
        from jax.experimental import multihost_utils as mhu
        assert self._mp and jax.process_index() != 0, \
            "follower_loop is for non-zero processes of a multi-host mesh"
        fdt = np.dtype(self._feat_dtype)
        while True:
            ctrl = np.asarray(mhu.broadcast_one_to_all(
                np.zeros((3,), np.int32)))
            if int(ctrl[0]) == _MP_STOP:
                break
            b = int(ctrl[1])
            run_detect = bool(ctrl[2])
            fc_h = np.asarray(mhu.broadcast_one_to_all(
                np.zeros((b,) + self._fc_shape, fdt)))
            att_h = np.asarray(mhu.broadcast_one_to_all(
                np.zeros((b,) + self._att_shape, fdt)))
            sentis_h = np.asarray(mhu.broadcast_one_to_all(
                np.zeros((b, self._m), np.int32)))
            forced_h = np.asarray(mhu.broadcast_one_to_all(
                np.zeros((b,), np.int32)))
            self._mp_exec(fc_h, att_h, sentis_h, forced_h, run_detect)
        self.close()

    def close(self) -> None:
        """Base close, plus (multi-host, process 0, once) a STOP
        broadcast so followers leave follower_loop."""
        super().close()
        if self._mp and jax.process_index() == 0:
            with self._stats_lock:
                sent = getattr(self, "_mp_stop_sent", False)
                self._mp_stop_sent = True
            if not sent:
                from jax.experimental import multihost_utils as mhu
                mhu.broadcast_one_to_all(
                    np.asarray([_MP_STOP, 0, 0], np.int32))

    def _finish(self, item) -> None:
        """Stage 2: materialize device outputs, fan results out."""
        batch, bucket, pad, seqs, scores, labels = item
        try:
            seqs = np.asarray(seqs)
            scores = np.asarray(scores, np.float32)
            labels = np.asarray(labels)
        except BaseException as e:   # runtime device errors land here
            self._fail_batch(batch, e)
            return
        self._record_batch(batch, bucket, pad)
        for i, r in enumerate(batch):
            r.result = (seqs[i], scores[i], int(labels[i]))
            r.done.set()

    # -- warmup -----------------------------------------------------------

    def warm(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Pre-compile the detector + decode programs for the given
        buckets (default: all) with zero inputs, so first real requests
        don't pay the multi-minute XLA compile (CLAUDE.md). Call from
        the serving thread's startup, before accepting traffic.

        Dummy inputs go through the same _stage() placement as
        _dispatch's: jit caches one executable PER input-sharding
        signature, so in mesh mode an unsharded warmup would compile a
        program real traffic never reuses."""
        for b in (buckets or self._buckets):
            if self._mp:
                # multi-host: warm through the SAME lockstep path real
                # traffic uses (followers compile in step with p0).
                # Call before accepting traffic — a concurrent real
                # dispatch would interleave broadcasts.
                self._mp_dispatch(
                    b,
                    np.zeros((b,) + self._fc_shape,
                             np.dtype(self._feat_dtype)),
                    np.zeros((b,) + self._att_shape,
                             np.dtype(self._feat_dtype)),
                    np.full((b, self._m), self._ids.pad, np.int32),
                    np.zeros((b,), np.int32), True)
                continue
            fcz = self._stage(np.zeros((b,) + self._fc_shape,
                              np.dtype(self._feat_dtype)))
            attz = self._stage(np.zeros((b,) + self._att_shape,
                               np.dtype(self._feat_dtype)))
            sz = self._stage(np.full((b, self._m), self._ids.pad, np.int32))
            self._detect(self._senti_params, attz)
            out = self._serve(self._cap_params, fcz, attz, sz,
                              self._stage(np.zeros((b,), np.int32)))
            np.asarray(out[0])    # force-complete (tunnel sync rule)


# ---------------------------------------------------------------------------
# Encode stage: batched image->features + concept top-k
# ---------------------------------------------------------------------------

_FC_KEY = "fc"   # stats bucket label for feature-mode concept-only rows


class _EncodeRequest(_RequestBase):
    __slots__ = ("img", "fc", "key")

    def __init__(self, img, fc, key):
        super().__init__()
        self.img = img       # uint8 [H, W, 3] (image mode) or None
        self.fc = fc         # float32 [Ff] (feature mode) or None
        self.key = key       # "{H}x{W}" or _FC_KEY — the grouping key


class EncodeBatcher(_BatcherBase):
    """Coalesce image-encode (+ concept top-k) requests into batched
    device calls (VERDICT r3 weak #2: the encoder must never run bs=1
    under concurrent load — bs=1 is ~4x off the batched rate,
    tools/bench_encoder.py).

    Requests group by RESIZE BUCKET (only same-shape images can stack;
    serve.py resizes to ``preprocessing.DEFAULT_BUCKET_SHAPES`` first),
    pad up the ``batch_buckets`` ladder, and run one
    ``encoder.forward_raw_batch`` per shape group. Concept top-k rides
    the SAME padded batch — zero extra queuing stages. Feature-mode
    requests (fc already known, only top-k needed) form their own group
    on the same ladder, so feature-mode concept detection batches too.

    Parameters
    ----------
    enc_apply : jitted ``imgs_u8 [B,H,W,3] -> (fc [B,Ff], att [B,a,a,Fa])``
        with encoder params bound, or None (feature-only daemon: image
        submissions raise upstream).
    cpt_apply : jitted ``fc [B,Ff] -> top [B,K]`` concept top-k with
        detector params bound.
    shape_buckets : the resize ladder; images MUST arrive already
        resized to one of these (static-shape discipline — an unknown
        shape would silently compile a new multi-minute program).
    batch_buckets : ascending batch ladder shared by all shape groups
        (and the feature-mode group). One compile per (shape, batch)
        pair.
    mesh : optional jax.sharding.Mesh — multi-chip encode: batches shard
        over the mesh's `data` axis (the encoder is pure-XLA conv, so
        plain GSPMD partitions it — no shard_map needed, unlike the
        decode program's pallas kernels). enc_apply/cpt_apply must close
        over params REPLICATED on the same mesh (parallel.mesh.replicate)
        and every batch bucket must be a multiple of the data-axis size
        (default_encode_buckets(mesh) rounds the default ladder).
    """

    def __init__(self, enc_apply: Optional[Callable],
                 cpt_apply: Callable, *,
                 fc_dim: int,
                 shape_buckets: Sequence[Tuple[int, int]],
                 batch_buckets: Sequence[int] = DEFAULT_ENCODE_BUCKETS,
                 max_wait_s: float = 0.005, max_queue: int = 1024,
                 mesh=None):
        if list(batch_buckets) != sorted(set(batch_buckets)):
            raise ValueError(f"batch_buckets must be ascending/unique: "
                             f"{batch_buckets}")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            _require_mesh_multiples(batch_buckets, mesh,
                                    "default_encode_buckets(mesh)")
            self._batch_sharding = NamedSharding(mesh, P("data"))
        self._enc_apply = enc_apply
        self._cpt_apply = cpt_apply
        self._fc_dim = int(fc_dim)
        self._shapes = tuple((int(h), int(w)) for h, w in shape_buckets)
        self._batch_buckets = tuple(int(b) for b in batch_buckets)
        keys = [f"{h}x{w}" for h, w in self._shapes] + [_FC_KEY]
        super().__init__(cap_n=self._batch_buckets[-1],
                         max_wait_s=max_wait_s, max_queue=max_queue,
                         bucket_keys=keys, name="isc-encode")

    # -- public API -------------------------------------------------------

    def submit_image(self, img_u8, timeout: Optional[float] = None,
                     enqueue_timeout: Optional[float] = None):
        """Encode one bucket-shaped uint8 RGB image. Blocks until its
        batch completes. Returns (fc [Ff] f32, att [a,a,Fa] f32,
        top [K] int concept indices)."""
        if self._closed:
            raise RuntimeError("batcher is closed")
        if self._enc_apply is None:
            raise ValueError("image mode needs an encoder "
                             "(--resnet101_ckpt)")
        img_u8 = np.asarray(img_u8)
        if (img_u8.dtype != np.uint8 or img_u8.ndim != 3
                or tuple(img_u8.shape[:2]) not in self._shapes
                or img_u8.shape[2] != 3):
            raise ValueError(
                f"image shape {img_u8.shape}/{img_u8.dtype} is not a "
                f"uint8 RGB resize bucket {self._shapes} — resize host-"
                f"side first (the ladder's programs are static-shaped)")
        h, w = img_u8.shape[:2]
        r = _EncodeRequest(img_u8, None, f"{h}x{w}")
        return self._enqueue_and_wait(r, timeout, enqueue_timeout)

    def submit_fc(self, fc, timeout: Optional[float] = None,
                  enqueue_timeout: Optional[float] = None):
        """Concept top-k for an already-extracted fc row (feature-mode
        requests batch their top-k here instead of running bs=1).
        Returns top [K] int concept indices."""
        if self._closed:
            raise RuntimeError("batcher is closed")
        fc = np.asarray(fc, np.float32)
        if fc.shape != (self._fc_dim,):
            raise ValueError(f"fc shape {fc.shape} != ({self._fc_dim},)")
        r = _EncodeRequest(None, fc, _FC_KEY)
        return self._enqueue_and_wait(r, timeout, enqueue_timeout)

    # -- dispatch/finish --------------------------------------------------

    def _dispatch(self, batch: List[_EncodeRequest]) -> None:
        """Group rows by shape key, pad each group up the batch ladder,
        launch one encoder (+top-k) program per group. All groups of one
        collect() launch together as one _fq item (they shipped
        back-to-back; double buffering stays batch-level)."""
        groups: Dict[str, List[_EncodeRequest]] = {}
        for r in batch:
            groups.setdefault(r.key, []).append(r)
        launched = []
        for key, rs in groups.items():
            n = len(rs)
            bucket = next(b for b in self._batch_buckets if b >= n)
            pad = bucket - n
            if key == _FC_KEY:
                fcs = np.stack([r.fc for r in rs]
                               + [rs[-1].fc] * pad)
                top = self._cpt_apply(self._stage(fcs))
                launched.append((rs, key, pad, None, None, top))
            else:
                imgs = np.stack([r.img for r in rs]
                                + [rs[-1].img] * pad)
                fc, att = self._enc_apply(self._stage(imgs))
                top = self._cpt_apply(fc)
                launched.append((rs, key, pad, fc, att, top))
        self._fq.put(launched)

    def _finish(self, launched) -> None:
        for rs, key, pad, fc, att, top in launched:
            try:
                top = np.asarray(top)
                if fc is not None:
                    fc = np.asarray(fc, np.float32)
                    att = np.asarray(att, np.float32)
            except BaseException as e:
                self._fail_batch(rs, e)
                continue
            self._record_batch(rs, key, pad)
            for i, r in enumerate(rs):
                r.result = top[i] if fc is None \
                    else (fc[i], att[i], top[i])
                r.done.set()

    # -- warmup -----------------------------------------------------------

    def warm(self, batch_buckets: Optional[Sequence[int]] = None) -> None:
        """Pre-compile every (shape, batch) encoder program plus the
        feature-mode top-k ladder. The encode programs are the expensive
        compiles (full ResNet trunk) — pass a sub-ladder to trim startup
        time at the cost of one live compile per untouched bucket."""
        for b in (batch_buckets or self._batch_buckets):
            # _stage, not jnp.asarray: jit caches per input SHARDING, so
            # in mesh mode an unsharded warmup would compile programs
            # real traffic never reuses
            if self._enc_apply is not None:
                for h, w in self._shapes:
                    fc, _ = self._enc_apply(
                        self._stage(np.zeros((b, h, w, 3), np.uint8)))
                    np.asarray(self._cpt_apply(fc)).sum()  # sync (scalar)
            top = self._cpt_apply(
                self._stage(np.zeros((b, self._fc_dim), np.float32)))
            np.asarray(top).sum()


def prometheus_metrics(stages: Dict[str, Dict],
                       stalled: Optional[Dict[str, float]] = None) -> str:
    """Render batcher ``stats()`` dicts as Prometheus text exposition
    (version 0.0.4) for a /metrics endpoint. ``stages`` maps a stage
    label (e.g. "decode", "encode") to that batcher's stats();
    ``stalled`` optionally maps the same labels to ``stalled_for()``
    seconds. Pure function — unit-tested on synthetic dicts
    (tests/test_serving_daemon.py)."""
    def esc(v) -> str:
        return str(v).replace("\\", "\\\\").replace('"', '\\"')

    counters = ("requests", "batches", "padded_rows",
                "failed_requests", "failed_batches")
    lines = []
    for name in counters:
        lines.append(f"# TYPE isc_{name}_total counter")
        for stage, s in stages.items():
            if name in s:
                lines.append(
                    f'isc_{name}_total{{stage="{esc(stage)}"}} {s[name]}')
    lines.append("# TYPE isc_batches_by_bucket_total counter")
    for stage, s in stages.items():
        for bucket, n in sorted(s.get("by_bucket", {}).items(),
                                key=lambda kv: str(kv[0])):
            lines.append(f'isc_batches_by_bucket_total{{stage='
                         f'"{esc(stage)}",bucket="{esc(bucket)}"}} {n}')
    lines.append("# TYPE isc_request_latency_ms summary")
    for stage, s in stages.items():
        for bucket, d in sorted(s.get("latency_by_bucket", {}).items(),
                                key=lambda kv: str(kv[0])):
            tags = f'stage="{esc(stage)}",bucket="{esc(bucket)}"'
            for q, key in (("0.5", "p50_ms"), ("0.99", "p99_ms")):
                lines.append(f'isc_request_latency_ms{{{tags},'
                             f'quantile="{q}"}} {d[key]}')
            lines.append(
                f'isc_request_latency_ms_count{{{tags}}} {d["n"]}')
    if stalled:
        lines.append("# TYPE isc_stalled_seconds gauge")
        for stage, v in stalled.items():
            lines.append(
                f'isc_stalled_seconds{{stage="{esc(stage)}"}} {v:.3f}')
    return "\n".join(lines) + "\n"


def make_batcher_from_checkpoint(rl_model: str, *, beam_size: int = 3,
                                 max_seq_len: int = 16,
                                 bucket_sizes=None,
                                 max_wait_s: float = 0.005,
                                 compute_dtype: str = "float32",
                                 num_sentiments: int = 10, mesh=None):
    """Build a DynamicBatcher (plus vocab/cats) from a composite RL
    checkpoint — the serving bootstrap path (mirrors cli/caption.py's
    load of the reference's train_rl.py:311-325 composite)."""
    from .config import Settings
    from .training import checkpoint as ckpt
    from .vocab import Vocab
    from .cli import common

    meta = ckpt.load_metadata(rl_model)
    settings = Settings.from_dict(meta["settings"])
    vocab = Vocab(meta["idx2word"])
    cats = meta["sentiment_categories"]
    template = {
        "captioner": cap.init_params(jax.random.PRNGKey(0), len(vocab),
                                     len(cats), settings),
        "senti_detector": senti_det.init_params(jax.random.PRNGKey(1),
                                                len(cats), settings),
    }
    loaded, _, _ = ckpt.load(rl_model, template)
    ids = common.token_ids(vocab, cats)
    b = DynamicBatcher(loaded["captioner"], loaded["senti_detector"],
                       settings=settings, ids=ids, beam_size=beam_size,
                       max_seq_len=max_seq_len, bucket_sizes=bucket_sizes,
                       max_wait_s=max_wait_s, num_cats=len(cats),
                       compute_dtype=compute_dtype,
                       num_sentiments=num_sentiments, mesh=mesh)
    return b, vocab, cats, settings
