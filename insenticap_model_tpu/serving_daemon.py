"""Dynamic-batching serving daemon: concurrent requests ride the batched
beam-search hot path at full utilization.

The reference has no serving layer — its decode path runs one image at a
time inside train_rl's test loop (``Detector.sample``,
/root/reference/models/decoder.py:182-192, driven per image at
/root/reference/train_rl.py:271-279). This layer adds the production
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
* ``EncodeBatcher`` (serving/encode.py) gives the image→features stage
  (ResNet encoder + concept top-k) the same treatment: raw-uint8 images
  coalesce per resize-bucket shape into batched
  ``encoder.forward_raw_batch`` calls, and concept top-k rides the same
  batch — no bs=1 encoder forwards under concurrent load (the two
  batchers form a two-stage pipeline, each HTTP handler thread carrying
  its request encode→decode).

Latency/throughput trade is explicit: ``max_wait_s`` bounds the time the
first request in a batch waits for co-riders; a full largest-bucket
batch dispatches immediately.

Split by concern (VERDICT r4 next #7) — this module holds the decode
``DynamicBatcher`` and re-exports the rest of the serving layer's public
names, so importers are unaffected:

* ``serving/batching.py``  — the stage-agnostic two-stage batching core
  (threads, backpressure, stats, stall watchdog, bucket ladders,
  Prometheus rendering);
* ``serving/encode.py``    — the image→features ``EncodeBatcher``;
* ``serving/multihost.py`` — the lockstep control plane for meshes
  spanning ``jax.distributed`` processes (process 0 broadcasts each
  dispatch; followers mirror from ``follower_loop()``; dispatch is
  synchronous there — pipelined batches would interleave collectives).
  Proved token-exact vs single-process by
  tools/multihost_daemon_check.py.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import inference
from .models import captioner as cap
from .models import sentiment_detector as senti_det
from .serving import multihost as _mh
from .serving.batching import (AUTO, DEFAULT_BUCKETS,   # noqa: F401
                               DEFAULT_ENCODE_BUCKETS, Saturated,
                               _BatcherBase, _RequestBase,
                               _require_mesh_multiples, default_buckets,
                               default_encode_buckets, prometheus_metrics)
from .serving.encode import EncodeBatcher  # noqa: F401
from .utils.dtypes import cast_bf16


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
            # device-stage ONCE: checkpoint.load returns HOST arrays, and
            # jitted calls re-transfer host params on EVERY dispatch
            # (~44 MB of captioner params per batch — the bench.py
            # trained-regime leg measured 13,881 -> 340 captions/s from
            # exactly this before its fix; CLAUDE.md measurement rules)
            self._cap_params = jax.tree_util.tree_map(jnp.asarray,
                                                      cap_params)
            self._senti_params = jax.tree_util.tree_map(jnp.asarray,
                                                        senti_params)
            self._detect = inference.make_detect_fn(senti_threshold,
                                                    ids.neutral, settings)
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
                mesh, senti_threshold, ids.neutral, settings)
            self._serve = inference.make_sharded_forced_serving_fn(
                mesh, settings, ids, beam_size, max_seq_len)
            self._batch_sharding = NamedSharding(mesh, P("data"))
        # multi-HOST mode: the mesh spans processes -> lockstep control
        # plane (p0 broadcasts, followers mirror; serving/multihost.py)
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

    # -- multi-host control plane (serving/multihost.py) -------------------

    def _mp_dispatch(self, bucket, fc_h, att_h, sentis_h, forced_h,
                     run_detect):
        return _mh.mp_dispatch(self, bucket, fc_h, att_h, sentis_h,
                               forced_h, run_detect)

    def _mp_exec(self, fc_h, att_h, sentis_h, forced_h, run_detect):
        return _mh.mp_exec(self, fc_h, att_h, sentis_h, forced_h,
                           run_detect)

    def follower_loop(self) -> None:
        """Run on every process with jax.process_index() != 0: mirror
        process 0's dispatches until it closes (serving/multihost.py)."""
        _mh.follower_loop(self)

    def close(self) -> None:
        """Base close, plus (multi-host, process 0, once) a STOP
        broadcast so followers leave follower_loop."""
        super().close()
        if self._mp and jax.process_index() == 0:
            with self._stats_lock:
                sent = getattr(self, "_mp_stop_sent", False)
                self._mp_stop_sent = True
            if not sent:
                _mh.mp_stop()

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
        "senti_detector": senti_det.module_for(settings).init_params(
            jax.random.PRNGKey(1), len(cats), settings),
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
