"""Captioning daemon: dynamic-batching HTTP serving of the full
inference DAG (SURVEY.md §3.4-3.5).

The reference has no serving process at all — decode happens inside
train_rl's test loop one image at a time
(/root/reference/train_rl.py:271-279, models/decoder.py:182-192). This
CLI turns the TPU build's batched serving path into a long-running
daemon: concurrent HTTP requests coalesce in
``serving_daemon.DynamicBatcher`` onto a static bucket ladder (one XLA
compile per bucket, full-batch beam search per dispatch).

    python serve.py --rl_model checkpoint/rl/coco/part/model-best.ckpt \\
        --concept_model checkpoint/concept/coco/model-best.ckpt \\
        [--resnet101_ckpt resnet101.ckpt --image_root /data/imgs] \\
        [--port 8500] [--warm]

Endpoints (JSON over HTTP):
  POST /caption   {"fc": [...], "att": [[[...]]],          feature mode
                   "sentiment": "auto"|"positive"|...}
                  {"image_b64": "<base64 jpeg/png>", ...}  image mode
                  {"image_path": "/root/img.jpg", ...}     image mode,
                                   needs --resnet101_ckpt; image_path
                                   additionally needs --image_root
               -> {"caption", "sentiment", "score", "concepts"}
  GET  /stats  -> decode-batcher stats (+"encode": encode-batcher stats)
  GET  /metrics-> the same counters + per-bucket latency quantiles +
                  stall gauges in Prometheus text format
  GET  /healthz-> {"ok": true}; 503 {"ok": false, "stalled_s": N} when
                  a worker thread has been wedged on the device longer
                  than --unhealthy_after_s (dead backend link)

Feature mode serves fc/att rows straight from a feature store (the
reference's h5 contract); image mode decodes + resizes host-side onto
the static shape ladder, then rides ``serving_daemon.EncodeBatcher``:
concurrent images coalesce per resize bucket into batched encoder
forwards with the concept top-k on the same batch (never bs=1 — the two
batchers form an encode→decode pipeline, each HTTP thread carrying its
request through both stages). Feature-mode concept top-k batches
through the same encode batcher.

Security posture (advisor r3): request bodies are size-capped (413 past
--max_body_mb); image_path is DISABLED unless --image_root is set, and
then confined to that directory by realpath prefix — remote clients of
a non-loopback daemon can otherwise probe arbitrary readable files.
image_b64 needs no filesystem trust at all.
"""
from __future__ import annotations

import argparse
import base64
import json
import os
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from .. import preprocessing, serving_daemon
from ..models import concept_detector as cpt_det
from ..models import encoder as enc
from ..training import checkpoint as ckpt
from ..utils.dtypes import cast_bf16
from . import common


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--rl_model", type=str, required=True,
                   help="composite RL checkpoint (captioner + detectors)")
    p.add_argument("--concept_model", type=str, required=True)
    p.add_argument("--resnet101_ckpt", type=str, default="",
                   help="converted encoder checkpoint; enables image mode")
    p.add_argument("--image_root", type=str, default="",
                   help="directory that image_path requests are confined "
                        "to (realpath prefix). UNSET = image_path mode "
                        "disabled (clients send image_b64 instead); never "
                        "expose a path-mode daemon on a non-loopback host "
                        "without this")
    p.add_argument("--sentiment_detector_json", type=str,
                   default="./data/corpus/part/sentiment_detector.json")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--beam_size", type=int, default=3)
    p.add_argument("--max_seq_len", type=int, default=16)
    p.add_argument("--num_concepts", type=int, default=5)
    p.add_argument("--num_sentiments", type=int, default=10)
    p.add_argument("--bucket_sizes", type=str, default="",
                   help="ascending batch-bucket ladder, default "
                        "[1,8,32,128,384] (under --mesh_shape the default "
                        "ladder rounds each bucket up to a multiple of the "
                        "data-axis size; explicit values must already be "
                        "multiples)")
    p.add_argument("--enc_bucket_sizes", type=str, default="",
                   help="encode-stage batch ladder, default [1,4,16,32] "
                        "(under --mesh_shape the default rounds up to "
                        "data-axis multiples; explicit values must "
                        "already be multiples); one XLA compile per "
                        "(resize-shape, batch) pair")
    p.add_argument("--image_buckets", type=str, default="",
                   help="resize-shape ladder for image mode as JSON "
                        "[[h,w],...], default the production "
                        "DEFAULT_BUCKET_SHAPES (must match the ladder the "
                        "feature store was extracted with for "
                        "store-consistent captions)")
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--queue_timeout_ms", type=float, default=100.0,
                   help="how long a request waits for queue space when "
                        "the daemon is saturated before it is shed with "
                        "HTTP 503")
    p.add_argument("--unhealthy_after_s", type=float, default=120.0,
                   help="/healthz flips to 503 when a dispatch or "
                        "completion step has been stuck on the device "
                        "longer than this (a dead backend link wedges "
                        "worker threads forever)")
    p.add_argument("--max_body_mb", type=float, default=64.0,
                   help="reject request bodies above this with 413 before "
                        "reading (a full fc+att JSON payload is ~5 MB)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 = the measured TPU serving policy; "
                        "also halves request host->device bytes")
    p.add_argument("--mesh_shape", type=str, default="",
                   help="e.g. '[8]': data-parallel serving over a 1-D "
                        "device mesh (shard_map per-device programs; every "
                        "bucket size must be a multiple of the data-axis "
                        "size). When the mesh spans jax.distributed "
                        "processes, run this SAME command on every host "
                        "(same checkpoints): process 0 serves HTTP, the "
                        "rest mirror its dispatches in lockstep")
    p.add_argument("--warm", action="store_true",
                   help="pre-compile every bucket before accepting "
                        "traffic (first full-size TPU compile is "
                        "minutes-slow)")
    return p


def _load_encoder(resnet101_ckpt: str, compute_dtype: str, mesh=None):
    """Converted-ResNet checkpoint -> jitted raw-uint8 batch apply
    (uint8 [B,H,W,3] -> (fc [B,2048], att [B,14,14,2048])). Separate
    function so tests can substitute a settings-matched tiny encoder.
    Under a mesh the params replicate and GSPMD partitions the pure-XLA
    conv stack over the data-sharded batch EncodeBatcher stages."""
    enc_params, _, _ = ckpt.load(
        resnet101_ckpt, enc.init_params(jax.random.PRNGKey(3)))
    if compute_dtype == "bfloat16":
        # forward_raw_batch computes in the params' dtype; bf16 here =
        # the measured encoder serving policy (tools/bench_encoder.py).
        # EncodeBatcher hands results back as f32.
        enc_params = cast_bf16(enc_params)
    if mesh is not None:
        from ..parallel import mesh as pmesh
        enc_params = pmesh.replicate(mesh, enc_params)
    else:
        # device-stage once — host params from ckpt.load would re-ship
        # the whole ResNet (~45 MB bf16) on every encode batch
        enc_params = jax.tree_util.tree_map(jnp.asarray, enc_params)
    # raw-uint8 path: normalize folded into conv1, 4x fewer
    # host->device bytes than shipping float pixels
    return jax.jit(lambda x, p=enc_params: enc.forward_raw_batch(p, x))


class ServeApp:
    """Model state + request handling, independent of the HTTP layer
    (tests drive handle_caption directly or over a real socket)."""

    def __init__(self, a):
        mesh = None
        if a.mesh_shape:
            from ..parallel import mesh as pmesh
            shape = tuple(json.loads(a.mesh_shape))
            if len(shape) != 1:
                # the daemon only shards over `data`; a silent extra axis
                # would replicate all serving work across it
                raise SystemExit(
                    f"--mesh_shape must be 1-D for serving (got {shape}); "
                    f"use '[{int(np.prod(shape))}]'")
            mesh = pmesh.make_mesh(shape)
        batcher, vocab, cats, settings = \
            serving_daemon.make_batcher_from_checkpoint(
                a.rl_model, beam_size=a.beam_size,
                max_seq_len=a.max_seq_len,
                bucket_sizes=(tuple(json.loads(a.bucket_sizes))
                              if a.bucket_sizes else None),
                max_wait_s=a.max_wait_ms / 1e3,
                compute_dtype=a.compute_dtype,
                num_sentiments=a.num_sentiments, mesh=mesh)
        self.batcher = batcher
        self.vocab = vocab
        self.cats = list(cats)
        self.settings = settings
        self.num_concepts = a.num_concepts
        self.num_sentiments = a.num_sentiments
        self.queue_timeout_s = a.queue_timeout_ms / 1e3
        self.unhealthy_after_s = a.unhealthy_after_s
        self.image_root = os.path.realpath(a.image_root) \
            if a.image_root else None
        self.image_shapes = (tuple(
            (int(h), int(w)) for h, w in json.loads(a.image_buckets))
            if a.image_buckets else preprocessing.DEFAULT_BUCKET_SHAPES)

        self.cpt_params, self.idx2concept = common.load_concept_model(
            a.concept_model)
        if mesh is not None:
            from ..parallel import mesh as pmesh
            self.cpt_params = pmesh.replicate(mesh, self.cpt_params)
        else:
            self.cpt_params = jax.tree_util.tree_map(jnp.asarray,
                                                     self.cpt_params)
        # f32 scoring regardless of the serving dtype (top-k order is
        # the product; bf16 fc rows from the encoder cast up here)
        cpt_apply = jax.jit(
            lambda fc: cpt_det.sample(self.cpt_params,
                                      fc.astype(jnp.float32),
                                      self.num_concepts)[1])

        # multi-HOST (--mesh_shape spanning processes): the ENCODE stage
        # stays process-local on p0 — HTTP + image decode live there, and
        # shipping raw pixels cross-host for a conv forward buys nothing;
        # encoded features feed the decode batcher's lockstep path
        # host-side. Single-host meshes still shard the encode batch.
        enc_mesh = None if (mesh is not None
                            and jax.process_count() > 1) else mesh
        enc_apply = _load_encoder(a.resnet101_ckpt, a.compute_dtype,
                                  enc_mesh) if a.resnet101_ckpt else None
        # the encode batcher exists even without an encoder: feature-mode
        # concept top-k batches through it instead of running bs=1
        self.enc_batcher = serving_daemon.EncodeBatcher(
            enc_apply, cpt_apply, fc_dim=settings.fc_feat_dim,
            shape_buckets=self.image_shapes,
            batch_buckets=(tuple(json.loads(a.enc_bucket_sizes))
                           if a.enc_bucket_sizes
                           else serving_daemon.default_encode_buckets(
                               enc_mesh)),
            max_wait_s=a.max_wait_ms / 1e3, mesh=enc_mesh)
        with open(a.sentiment_detector_json) as f:
            self.senti_table = json.load(f)
        self.is_follower = (mesh is not None and jax.process_count() > 1
                            and jax.process_index() != 0)
        if a.warm and not self.is_follower:
            self.batcher.warm()    # multi-host: lockstep with followers
            self.enc_batcher.warm()

    # -- request path -----------------------------------------------------

    def _load_image_u8(self, payload) -> np.ndarray:
        """Decode the request's image to uint8 RGB. image_b64 carries the
        pixels in-band; image_path is confined to --image_root (realpath
        prefix — no daemon should open arbitrary client-named files,
        advisor r3)."""
        b64 = payload.get("image_b64")
        if b64 is not None:
            try:
                data = base64.b64decode(b64, validate=True)
                arr = preprocessing.load_image_bytes(data)
            except Exception:
                raise ValueError("image_b64 did not decode to an image")
            return preprocessing.to_rgb_uint8(arr)
        path = payload.get("image_path")
        if not path:
            raise ValueError("need 'fc'+'att', 'image_b64', or "
                             "'image_path'")
        if self.image_root is None:
            raise ValueError("image_path mode is disabled: start the "
                             "daemon with --image_root, or send "
                             "image_b64")
        # lexical containment first — rejects plainly-out-of-root paths
        # with ZERO filesystem contact (realpath walks/stats every
        # component, an existence/timing oracle for arbitrary client
        # paths) — then realpath to stop symlinks inside the root from
        # escaping it. Both rejections share one uniform message. The
        # pre-filter also drops lexically-outside aliases that would
        # have realpath'd into the root; that narrowing only ever
        # denies, never widens.
        lexical = os.path.abspath(path)
        if lexical != self.image_root and \
                not lexical.startswith(self.image_root + os.sep):
            raise ValueError("image_path outside --image_root")
        real = os.path.realpath(lexical)
        if real != self.image_root and \
                not real.startswith(self.image_root + os.sep):
            raise ValueError("image_path outside --image_root")
        return preprocessing.to_rgb_uint8(preprocessing.load_image(real))

    def handle_caption(self, payload: dict) -> dict:
        timeout = payload.get("timeout", 300.0)
        try:                       # client-supplied: validate and clamp
            timeout = min(max(float(timeout), 0.001), 3600.0)
        except (TypeError, ValueError):
            raise ValueError(f"bad timeout {timeout!r}")
        # one budget across BOTH pipeline stages: the decode submit gets
        # whatever the encode stage left, so a request 504s within
        # ~timeout of arrival instead of up to 2x
        deadline = time.monotonic() + timeout

        if "fc" in payload:
            fc = np.asarray(payload["fc"], np.float32)
            att = np.asarray(payload["att"], np.float32)
            top = self.enc_batcher.submit_fc(
                fc, timeout=timeout, enqueue_timeout=self.queue_timeout_s)
        else:
            # static shape ladder: arbitrary client image sizes resize to
            # one of DEFAULT_BUCKET_SHAPES, so the encoder compiles
            # O(#buckets) programs, never per distinct image shape (a
            # full-size compile is minutes-slow — an unbounded daemon
            # cannot afford per-shape)
            u8 = self._load_image_u8(payload)
            bucket = preprocessing.bucket_for_shape(
                *u8.shape[:2], self.image_shapes)
            x = preprocessing.resize_to_bucket(u8, bucket)
            fc, att, top = self.enc_batcher.submit_image(
                x, timeout=timeout, enqueue_timeout=self.queue_timeout_s)
        concepts = [self.idx2concept[k] for k in top]
        sentis = common.senti_word_ids(concepts, self.senti_table,
                                       self.vocab, self.num_sentiments)

        want = payload.get("sentiment", "auto")
        forced = serving_daemon.AUTO if want == "auto" \
            else self.cats.index(want)
        seqs, scores, label = self.batcher.submit(
            fc, att, sentis, forced_label=forced,
            timeout=max(0.001, deadline - time.monotonic()),
            enqueue_timeout=self.queue_timeout_s)
        return {"caption": self.vocab.decode_to_text(seqs[0]),
                "sentiment": self.cats[label],
                "score": float(scores[0]),
                "concepts": concepts}

    def stats(self) -> dict:
        out = self.batcher.stats()        # decode stats stay top-level
        out["encode"] = self.enc_batcher.stats()
        return out

    def metrics_text(self) -> str:
        """Prometheus exposition of both batchers (GET /metrics)."""
        return serving_daemon.prometheus_metrics(
            {"decode": self.batcher.stats(),
             "encode": self.enc_batcher.stats()},
            {"decode": self.batcher.stalled_for(),
             "encode": self.enc_batcher.stalled_for()})

    def close(self):
        self.enc_batcher.close()
        self.batcher.close()


def make_server(a) -> ThreadingHTTPServer:
    app = ServeApp(a)
    max_body = int(a.max_body_mb * 1e6)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                stalled = max(app.batcher.stalled_for(),
                              app.enc_batcher.stalled_for())
                if stalled >= app.unhealthy_after_s:
                    # a wedged device runtime (backend link death mid-
                    # run) pins a worker thread forever; tell the load
                    # balancer to stop routing here
                    self._send(503, {"ok": False,
                                     "stalled_s": round(stalled, 1)})
                else:
                    self._send(200, {"ok": True})
            elif self.path == "/stats":
                self._send(200, app.stats())
            elif self.path == "/metrics":
                body = app.metrics_text().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/caption":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_body:
                    # reject BEFORE reading: one oversized body must not
                    # be able to exhaust daemon memory (advisor r3)
                    self._send(413, {"error":
                                     f"body {n} B > --max_body_mb "
                                     f"{a.max_body_mb}"})
                    return
                payload = json.loads(self.rfile.read(n) or b"{}")
                self._send(200, app.handle_caption(payload))
            except serving_daemon.Saturated as e:
                self._send(503, {"error": str(e)})     # shed load
            except TimeoutError as e:
                self._send(504, {"error": str(e)})
            except (ValueError, KeyError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:       # keep the daemon alive
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet; /stats has the data
            pass

    srv = ThreadingHTTPServer((a.host, a.port), Handler)
    srv.app = app  # type: ignore[attr-defined]
    return srv


def main(argv=None):
    import signal
    import threading

    a = build_parser().parse_args(argv)
    if a.mesh_shape and jax.process_count() > 1 \
            and jax.process_index() != 0:
        # multi-HOST daemon follower: build the identical batcher (same
        # checkpoints on every host), then mirror process 0's dispatches
        # until it shuts down. No HTTP here.
        app = ServeApp(a)
        print(f"follower {jax.process_index()}/{jax.process_count()}: "
              f"mirroring process 0", flush=True)
        try:
            app.batcher.follower_loop()
        finally:
            app.enc_batcher.close()
        print("follower done", flush=True)
        return
    srv = make_server(a)
    host, port = srv.server_address[:2]
    print(f"serving on http://{host}:{port} "
          f"(buckets {a.bucket_sizes}, wait {a.max_wait_ms} ms)",
          flush=True)

    # graceful drain on SIGTERM/SIGINT: stop accepting, let in-flight
    # handler threads finish against still-live batchers (server_close
    # joins them — block_on_close), THEN close the batchers. shutdown()
    # must run off the serve_forever thread or it deadlocks.
    def _drain(signum, frame):
        print(f"signal {signum}: draining", flush=True)
        threading.Thread(target=srv.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)
    signal.signal(signal.SIGINT, _drain)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()     # joins in-flight handler threads
        srv.app.close()        # then drains + stops the batchers
    print("drained, exiting", flush=True)


if __name__ == "__main__":
    main()
