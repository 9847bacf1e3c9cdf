"""Ablation-bound the TRUE fused e2e cost of encoder head stages.

The r4 per-stage encoder profile (tools/profile_encoder.py) times each
stage in its own jitted scan, which materializes stage boundaries XLA
otherwise fuses away — it attributed 3.83 ms to the stem maxpool, but
replacing the pool with a bare stride-2 subsample (same shapes, zero
windowed-max work) moves full forward_raw_batch by only ~0.6 ms. This
tool makes that ablation discipline repeatable: for each head stage it
times the full forward with the stage swapped for the cheapest
shape-preserving stand-in; (baseline - ablated) bounds what ANY
optimization of that stage could recover end-to-end.

Stand-ins (all keep downstream shapes/dtypes, not values):
  maxpool -> stride-2 subsample           (removes the 3x3 window max)
  stem    -> 1x1/s2 conv (+bn+relu)       (removes the 7x7 window walk)
  layer1  -> single 1x1 conv 64->256      (removes 3 bottleneck blocks)
  conv2@layerN -> center-tap 1x1 conv     (removes 8/9 of that layer's
                                           3x3 multiplies + window walk;
                                           bounds the Winograd prize)

    python tools/ablate_encoder.py [--bs 32] [--hw 448] [--iters 30]

Run on the real chip; timing is pipelined (one sync, CLAUDE.md rules).
Chip record: see DESIGN.md round-4 (ablation-bounds section).
"""
import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from insenticap_model_tpu.models import encoder as enc  # noqa: E402
from insenticap_model_tpu.utils.dtypes import cast_bf16  # noqa: E402


def subsample_stride2(x):
    """Shape-preserving maxpool stand-in: pick the window's top-left
    element (= ceil-mode output extents, no max)."""
    H, W = x.shape[1], x.shape[2]
    oh = -(-(H - 3) // 2) + 1
    ow = -(-(W - 3) // 2) + 1
    return x[:, : 2 * oh : 2, : 2 * ow : 2]


def _time(fwd, params, imgs, iters):
    fn = jax.jit(lambda p, x: fwd(p, x)[0].sum())
    dev = jax.device_put(imgs)
    np.asarray(fn(params, dev))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, dev)
    np.asarray(out)
    return float((time.perf_counter() - t0) / iters * 1e3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=0,
                    help="0 = 32 on TPU, 2 elsewhere")
    ap.add_argument("--hw", type=int, default=0,
                    help="0 = 448 on TPU, 64 elsewhere")
    ap.add_argument("--iters", type=int, default=0,
                    help="0 = 30 on TPU, 2 elsewhere")
    a = ap.parse_args()
    on_tpu = jax.default_backend() == "tpu"
    a.bs = a.bs or (32 if on_tpu else 2)
    a.hw = a.hw or (448 if on_tpu else 64)
    a.iters = a.iters or (30 if on_tpu else 2)

    rng = np.random.RandomState(0)
    params = cast_bf16(enc.init_params(jax.random.PRNGKey(0)))
    imgs = rng.randint(0, 256, (a.bs, a.hw, a.hw, 3), np.uint8)
    print("backend:", jax.default_backend(), flush=True)

    base = _time(enc.forward_raw_batch, params, imgs, a.iters)
    print(f"baseline            {base:7.2f} ms/batch", flush=True)

    def report(name, t):
        print(f"{name:<19s} {t:7.2f} ms/batch  -> stage bound "
              f"{base - t:5.2f} ms ({(base - t) / base * 100:4.1f}% of e2e)",
              flush=True)

    # --- maxpool -> subsample ---------------------------------------
    orig_pool = enc._ceil_maxpool_3x3s2
    enc._ceil_maxpool_3x3s2 = subsample_stride2
    try:
        report("ablate maxpool", _time(enc.forward_raw_batch, params,
                                       imgs, a.iters))
    finally:
        enc._ceil_maxpool_3x3s2 = orig_pool

    # --- stem 7x7/s2 -> 1x1/s2 (keeps the folded-normalize epilogue) -
    dt = params["conv1"]["w"].dtype
    p1 = {k: v for k, v in params.items()}
    p1["conv1"] = {"w": jnp.mean(params["conv1"]["w"], axis=(0, 1),
                                 keepdims=True).astype(dt)}

    def fwd_stem1x1(p, x):
        xx = x.astype(dt)
        aa = jnp.asarray(1.0 / (255.0 * enc.IMAGENET_STD), dt)
        xc = jax.lax.conv_general_dilated(
            xx * aa, p["conv1"]["w"], (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        xh = jax.nn.relu(enc._bn(p["bn1"], xc))
        return enc._trunk(p, xh, 14)

    report("ablate stem 7x7", _time(fwd_stem1x1, p1, imgs, a.iters))

    # --- layer1 -> one 1x1 conv 64->256 -------------------------------
    w1 = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 64, 256)) * 0.05
    w1 = w1.astype(dt)

    def fwd_nolayer1(p, x):
        def trunk(pp, xx, att_size):
            xx = enc._ceil_maxpool_3x3s2(xx)
            xx = jax.lax.conv_general_dilated(
                xx, w1, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            for li in (1, 2, 3):
                for b, blk in enumerate(pp["layers"][li]):
                    xx = enc._bottleneck(blk, xx, 2 if b == 0 else 1)
            fc = xx.mean(axis=(1, 2))
            from insenticap_model_tpu.ops.adaptive_pool import \
                adaptive_avg_pool2d
            att = adaptive_avg_pool2d(xx, (att_size, att_size))
            return fc, att
        orig = enc._trunk
        enc._trunk = trunk
        try:
            return enc.forward_raw_batch(p, x)
        finally:
            enc._trunk = orig

    report("ablate layer1", _time(fwd_nolayer1, params, imgs, a.iters))

    # --- per-layer 3x3 conv2 -> center-tap 1x1 -------------------------
    # Bounds what ANY fewer-multiply 3x3 algorithm (Winograd) could win
    # for that layer: the stand-in keeps the real center tap (opaque,
    # live weights + input) but drops the other 8 taps and the window
    # walk entirely. stride is always 1 on conv2 (the reference moves
    # stride-2 to conv1 — encoder.py:14-15), so the 1x1 keeps shapes.
    def make_trunk_conv2_1x1(target_li):
        def bottleneck(p, x, stride):
            out = jax.nn.relu(enc._bn(p["bn1"],
                                      enc._conv(p["conv1"], x, stride, 0)))
            w = {"w": p["conv2"]["w"][1:2, 1:2]}
            out = jax.nn.relu(enc._bn(p["bn2"], enc._conv(w, out, 1, 0)))
            out = enc._bn(p["bn3"], enc._conv(p["conv3"], out, 1, 0))
            if "downsample" in p:
                x = enc._bn(p["downsample"]["bn"],
                            enc._conv(p["downsample"]["conv"], x, stride, 0))
            return jax.nn.relu(out + x)

        def trunk(pp, xx, att_size):
            xx = enc._ceil_maxpool_3x3s2(xx)
            for li, layer in enumerate(pp["layers"]):
                for b, blk in enumerate(layer):
                    stride = 2 if (li > 0 and b == 0) else 1
                    bn_fn = bottleneck if li == target_li else enc._bottleneck
                    xx = bn_fn(blk, xx, stride)
            fc = xx.mean(axis=(1, 2))
            from insenticap_model_tpu.ops.adaptive_pool import \
                adaptive_avg_pool2d
            att = adaptive_avg_pool2d(xx, (att_size, att_size))
            return fc, att
        return trunk

    orig_trunk = enc._trunk
    for li in range(4):
        enc._trunk = make_trunk_conv2_1x1(li)
        try:
            report(f"ablate 3x3@layer{li + 1}",
                   _time(enc.forward_raw_batch, params, imgs, a.iters))
        finally:
            enc._trunk = orig_trunk


if __name__ == "__main__":
    main()
