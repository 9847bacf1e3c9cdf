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
        [--resnet101_ckpt resnet101.ckpt] [--port 8500] [--warm]

Endpoints (JSON over HTTP):
  POST /caption   {"fc": [...], "att": [[[...]]],          feature mode
                   "sentiment": "auto"|"positive"|...}
                  {"image_path": "/path/img.jpg", ...}     image mode
                                        (needs --resnet101_ckpt)
               -> {"caption", "sentiment", "score", "concepts"}
  GET  /stats  -> batcher dispatch statistics
  GET  /healthz-> {"ok": true}

Feature mode serves fc/att rows straight from a feature store (the
reference's h5 contract); image mode runs decode->resize->encoder per
request on the shared bucket ladder. The decode stage is the batched hot
path either way; concept top-k and the encoder run per request.
"""
from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np

from .. import preprocessing, serving_daemon
from ..models import concept_detector as cpt_det
from ..models import encoder as enc
from ..training import checkpoint as ckpt
from . import common


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--rl_model", type=str, required=True,
                   help="composite RL checkpoint (captioner + detectors)")
    p.add_argument("--concept_model", type=str, required=True)
    p.add_argument("--resnet101_ckpt", type=str, default="",
                   help="converted encoder checkpoint; enables image mode")
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
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--queue_timeout_ms", type=float, default=100.0,
                   help="how long a request waits for queue space when "
                        "the daemon is saturated before it is shed with "
                        "HTTP 503")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 = the measured TPU serving policy; "
                        "also halves request host->device bytes")
    p.add_argument("--mesh_shape", type=str, default="",
                   help="e.g. '[8]': data-parallel serving over a 1-D "
                        "device mesh (shard_map per-device programs; every "
                        "bucket size must be a multiple of the data-axis "
                        "size)")
    p.add_argument("--warm", action="store_true",
                   help="pre-compile every bucket before accepting "
                        "traffic (first full-size TPU compile is "
                        "minutes-slow)")
    return p


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

        self.cpt_params, self.idx2concept = common.load_concept_model(
            a.concept_model)
        self._cpt_sample = jax.jit(
            lambda p, fc: cpt_det.sample(p, fc, self.num_concepts)[1])
        with open(a.sentiment_detector_json) as f:
            self.senti_table = json.load(f)

        self.enc_params = None
        if a.resnet101_ckpt:
            self.enc_params, _, _ = ckpt.load(
                a.resnet101_ckpt, enc.init_params(jax.random.PRNGKey(3)))
            # raw-uint8 path: normalize folded into conv1, 4x fewer
            # host->device bytes than shipping float pixels
            self._enc_raw = jax.jit(
                lambda p, x: enc.forward_raw_batch(p, x))
        if a.warm:
            self.batcher.warm()
            if self.enc_params is not None:
                # encoder shapes are bounded by the resize ladder, so
                # they CAN be pre-compiled (one program per bucket)
                for hb, wb in preprocessing.DEFAULT_BUCKET_SHAPES:
                    fc, _ = self._enc_raw(
                        self.enc_params,
                        np.zeros((1, hb, wb, 3), np.uint8))
                    np.asarray(fc.sum())       # force-complete (scalar)

    # -- request path -----------------------------------------------------

    def _features(self, payload):
        if "fc" in payload:
            return (np.asarray(payload["fc"], np.float32),
                    np.asarray(payload["att"], np.float32))
        path = payload.get("image_path")
        if not path:
            raise ValueError("need 'fc'+'att' or 'image_path'")
        if self.enc_params is None:
            raise ValueError("image mode needs --resnet101_ckpt")
        # static shape ladder: arbitrary client image sizes resize to one
        # of DEFAULT_BUCKET_SHAPES, so the encoder compiles O(#buckets)
        # programs, never per distinct image shape (a full-size compile
        # is minutes-slow — an unbounded daemon cannot afford per-shape)
        u8 = preprocessing.to_rgb_uint8(preprocessing.load_image(path))
        bucket = preprocessing.bucket_for_shape(
            *u8.shape[:2], preprocessing.DEFAULT_BUCKET_SHAPES)
        x = preprocessing.resize_to_bucket(u8, bucket)
        fc, att = self._enc_raw(self.enc_params, x[None])
        return np.asarray(fc)[0], np.asarray(att)[0]

    def handle_caption(self, payload: dict) -> dict:
        timeout = payload.get("timeout", 300.0)
        try:                       # client-supplied: validate and clamp
            timeout = min(max(float(timeout), 0.001), 3600.0)
        except (TypeError, ValueError):
            raise ValueError(f"bad timeout {timeout!r}")

        fc, att = self._features(payload)
        top = np.asarray(self._cpt_sample(self.cpt_params, fc[None]))[0]
        concepts = [self.idx2concept[k] for k in top]
        sentis = common.senti_word_ids(concepts, self.senti_table,
                                       self.vocab, self.num_sentiments)

        want = payload.get("sentiment", "auto")
        forced = serving_daemon.AUTO if want == "auto" \
            else self.cats.index(want)
        seqs, scores, label = self.batcher.submit(
            fc, att, sentis, forced_label=forced, timeout=timeout,
            enqueue_timeout=self.queue_timeout_s)
        return {"caption": self.vocab.decode_to_text(seqs[0]),
                "sentiment": self.cats[label],
                "score": float(scores[0]),
                "concepts": concepts}

    def close(self):
        self.batcher.close()


def make_server(a) -> ThreadingHTTPServer:
    app = ServeApp(a)

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
                self._send(200, {"ok": True})
            elif self.path == "/stats":
                self._send(200, app.batcher.stats())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/caption":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
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
    a = build_parser().parse_args(argv)
    srv = make_server(a)
    host, port = srv.server_address[:2]
    print(f"serving on http://{host}:{port} "
          f"(buckets {a.bucket_sizes}, wait {a.max_wait_ms} ms)",
          flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.app.close()
        srv.server_close()


if __name__ == "__main__":
    main()
