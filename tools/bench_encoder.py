"""Feature-extraction bench: the raw-image -> (fc, att) encoder stage at
production bucket shapes (VERDICT r2 weak #1 asked for a reproducible
script behind the README's img/s row).

Measures, on the default (TPU) env:
  * the raw-uint8 device path (encoder.forward_raw_batch — normalize
    folded into conv1, the bucket_mode="resize" production path) and the
    host-normalized float path (forward_batch) at 448x448 over a batch
    sweep, steady-state device time only (inputs pre-staged; sync on an
    in-graph scalar checksum per CLAUDE.md — never fetch a big array);
  * the host->device transfer cost of one uint8 vs float32 batch, to
    show the 4x tunnel-traffic saving of shipping raw bytes.

Usage: python tools/bench_encoder.py [--shape 448x448] [--iters 8]
Prints one JSON line per configuration.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from insenticap_model_tpu.models import encoder as enc  # noqa: E402


def sync(x):
    return float(np.asarray(x))


def bench_fn(fn, params, dev_batch, iters):
    s = sync(fn(params, dev_batch))  # compile + warm
    assert np.isfinite(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, dev_batch)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="448x448")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch_sizes", default="8,16,32")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="bfloat16 = the serving policy (bf16 params + "
                         "activations)")
    a = ap.parse_args()
    h, w = (int(d) for d in a.shape.split("x"))
    dt = jnp.bfloat16 if a.dtype == "bfloat16" else jnp.float32

    params = enc.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(jax.tree_util.tree_map(
        lambda v: v.astype(dt), params))

    @jax.jit
    def fwd_raw(p, x):
        fc, att = enc.forward_raw_batch(p, x)
        return (fc.sum() + att.sum()).astype(jnp.float32)

    @jax.jit
    def fwd_f32(p, x):
        fc, att = enc.forward_batch(p, x.astype(dt))
        return (fc.sum() + att.sum()).astype(jnp.float32)

    g = np.random.default_rng(0)
    for bs in (int(b) for b in a.batch_sizes.split(",")):
        raw = g.integers(0, 256, size=(bs, h, w, 3)).astype(np.uint8)
        f32 = np.stack([enc.preprocess(r) for r in raw])

        t0 = time.perf_counter()
        raw_dev = jax.device_put(raw)
        sync(raw_dev.sum())
        t_put_u8 = time.perf_counter() - t0
        t0 = time.perf_counter()
        f32_dev = jax.device_put(f32)
        sync(f32_dev.sum())
        t_put_f32 = time.perf_counter() - t0

        dt_raw = bench_fn(fwd_raw, params, raw_dev, a.iters)
        dt_f32 = bench_fn(fwd_f32, params, f32_dev, a.iters)
        print(json.dumps({
            "metric": "encoder_imgs_per_sec", "shape": f"{h}x{w}",
            "batch_size": bs, "unit": "imgs/s",
            "raw_uint8_path": round(bs / dt_raw, 1),
            "f32_path": round(bs / dt_f32, 1),
            "raw_step_ms": round(dt_raw * 1e3, 2),
            "f32_step_ms": round(dt_f32 * 1e3, 2),
            "h2d_uint8_ms": round(t_put_u8 * 1e3, 1),
            "h2d_f32_ms": round(t_put_f32 * 1e3, 1),
            "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
