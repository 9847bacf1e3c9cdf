"""Encoder stage profile + space-to-depth stem A/B (VERDICT r3 weak #3).

The feature-extraction encoder (models/encoder.py, the TPU rebuild of
/root/reference/models/encoder.py:39-55) was the one hot stage without a
per-stage profile: r3 recorded only end-to-end img/s (1,590 bf16 bs=32
@448², tools/bench_encoder.py) with "HBM-bound" extrapolated from one
layer3/4 conv probe. This tool measures the real breakdown and the one
classic TPU stem optimization:

  profile — per-stage table (stem conv1 / maxpool / layer1..4 / heads)
            at production shape, timed INSIDE a single jitted lax.scan
            (the tunnel's ~1.3 ms dispatch floor swamps per-call timing,
            CLAUDE.md), with analytic FLOPs + HBM-traffic accounting →
            MFU and HBM utilization per stage, so the bound (MXU vs HBM)
            is measured per stage rather than extrapolated.
  s2d     — A/B of the space-to-depth stem: conv1 7×7/s2 on [448,448,3]
            has K=147 contraction depth and stride-2 windows (poor MXU
            tiling); reshaping pixels to [227,227,12] turns it into a
            4×4/s1 conv with identical arithmetic (weights re-indexed,
            zero taps where 2k+a>6) that tiles like a normal conv.
            Numerics asserted equal to the direct stem before timing.

    python tools/profile_encoder.py [profile|s2d|both] [--bs 32]

Run on the real chip (default env). CPU runs exercise the machinery and
the s2d parity check only — absolute numbers are meaningless there.

ATTRIBUTION CAVEAT (r4, measured): staging each stage in its own scan
materializes boundaries XLA fuses away in the full program, so this
table OVERSTATES stages that fuse with their neighbors — it said the
stem maxpool costs 3.83 ms, but ablating the pool from the full fused
forward moves e2e by only ~0.6 ms. Use the stage table to find
candidates, then bound the real prize with tools/ablate_encoder.py
(shape-preserving stand-in ablations) BEFORE building an optimization.
"""
import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from insenticap_model_tpu.models import encoder as enc  # noqa: E402

# v5e peaks (scaling-book numbers; same constants as DESIGN.md tables)
PEAK_BF16 = 197e12      # FLOP/s
PEAK_HBM = 819e9        # B/s


from insenticap_model_tpu.utils.dtypes import cast_bf16 as _cast_bf16  # noqa: E402


def _scan_time(fn, x, iters, reps=5):
    """Median seconds per application of fn(x), timed inside ONE jitted
    lax.scan. The carry perturbs the input each step (x * (1 + eps) with
    eps folded from the carry) so XLA cannot hoist the loop-invariant
    body out of the scan; the relative error of the perturbation is
    ~1e-30 (bf16 flushes it to the same value, f32 likewise)."""

    @jax.jit
    def run(x0):
        def body(acc, _):
            xi = x0 * (1 + acc * 1e-30).astype(x0.dtype) \
                if jnp.issubdtype(x0.dtype, jnp.floating) \
                else x0 + (acc * 1e-30).astype(x0.dtype)
            y = fn(xi)
            return acc + jnp.sum(y.astype(jnp.float32)) * 1e-30, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    np.asarray(run(x))                      # compile + sync (scalar)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(x))
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def _conv_flops(b, oh, ow, kh, kw, cin, cout):
    return 2 * b * oh * ow * kh * kw * cin * cout


def _stage_specs(params, bs, hw):
    """(name, fn(x)->y, input-maker, flops, hbm_bytes) per stage. HBM
    bytes = activations in+out + params once (bf16=2B) — the roofline
    floor, not measured traffic."""
    H, W = hw
    h2, w2 = H // 2, W // 2                 # conv1 output
    h4 = -(-(h2 - 3) // 2) + 1              # ceil maxpool output
    w4 = -(-(w2 - 3) // 2) + 1

    def act(shape, dt=jnp.bfloat16):
        return jnp.zeros((bs,) + shape, dt)

    def psize(t):
        return sum(np.asarray(x).nbytes
                   for x in jax.tree_util.tree_leaves(t))

    stages = []

    # stem: raw-uint8 conv1 with folded normalize + bn + relu (the
    # production forward_raw_batch entry, encoder.py:139-168)
    def stem(x):
        dt = params["conv1"]["w"].dtype
        xx = x.astype(dt)
        a = jnp.asarray(1.0 / (255.0 * enc.IMAGENET_STD), dt)
        b_ = jnp.asarray(-enc.IMAGENET_MEAN / enc.IMAGENET_STD, dt)
        w_folded = {"w": params["conv1"]["w"] * a[None, None, :, None]}
        xc = enc._conv(w_folded, xx, 2, 3)
        off_src = jnp.broadcast_to(b_, (1,) + tuple(x.shape[1:3]) + (3,))
        off = enc._conv(params["conv1"], off_src, 2, 3)
        return jax.nn.relu(enc._bn(params["bn1"], xc + off))

    stem_fl = _conv_flops(bs, h2, w2, 7, 7, 3, 64)
    stem_io = bs * H * W * 3 * 1 + bs * h2 * w2 * 64 * 2 \
        + psize(params["conv1"])
    stages.append(("stem(conv1)", stem,
                   lambda: jnp.zeros((bs, H, W, 3), jnp.uint8),
                   stem_fl, stem_io))

    stages.append(("maxpool", enc._ceil_maxpool_3x3s2,
                   lambda: act((h2, w2, 64)), 0,
                   bs * (h2 * w2 + h4 * w4) * 64 * 2))

    sh, sw, cin = h4, w4, 64
    for li, (nblocks, mid) in enumerate(zip(enc.LAYERS, enc.MIDS)):
        cout = mid * enc.EXPANSION
        stride = 1 if li == 0 else 2
        oh, ow = sh // stride, sw // stride
        fl = 0
        for b_i in range(nblocks):
            st = stride if b_i == 0 else 1
            ci = cin if b_i == 0 else cout
            fl += _conv_flops(bs, oh, ow, 1, 1, ci, mid)
            fl += _conv_flops(bs, oh, ow, 3, 3, mid, mid)
            fl += _conv_flops(bs, oh, ow, 1, 1, mid, cout)
            if b_i == 0:
                fl += _conv_flops(bs, oh, ow, 1, 1, ci, cout)
        io = bs * (sh * sw * cin + oh * ow * cout) * 2 \
            + psize(params["layers"][li]) \
            + bs * oh * ow * cout * 2 * 2 * (nblocks - 1)  # inter-block
        layer_p = params["layers"][li]

        def layer_fn(x, lp=layer_p, li=li):
            for b_i, blk in enumerate(lp):
                x = enc._bottleneck(blk, x, 2 if (li > 0 and b_i == 0)
                                    else 1)
            return x

        stages.append((f"layer{li + 1}", layer_fn,
                       lambda sh=sh, sw=sw, cin=cin: act((sh, sw, cin)),
                       fl, io))
        sh, sw, cin = oh, ow, cout

    def heads(x):
        fc = x.mean(axis=(1, 2))
        from insenticap_model_tpu.ops.adaptive_pool import adaptive_avg_pool2d
        att = adaptive_avg_pool2d(x, (14, 14))
        return fc + att.sum((1, 2))         # single output to reduce

    stages.append(("heads(fc+att)", heads,
                   lambda sh=sh, sw=sw, cin=cin: act((sh, sw, cin)),
                   0, bs * sh * sw * cin * 2))
    return stages


def profile(bs, hw, iters):
    params = _cast_bf16(enc.init_params(jax.random.PRNGKey(0)))
    total_t = total_fl = 0.0
    print(f"encoder stage profile bs={bs} {hw[0]}x{hw[1]} bf16 "
          f"({jax.default_backend()}):")
    print(f"{'stage':<14}{'ms':>9}{'GFLOP':>9}{'MFU%':>7}"
          f"{'GB':>8}{'HBM%':>7}  bound")
    for name, fn, mk, fl, io in _stage_specs(params, bs, hw):
        t = _scan_time(fn, mk(), iters)
        mfu = fl / t / PEAK_BF16 * 100
        hbm = io / t / PEAK_HBM * 100
        bound = "MXU" if mfu > hbm else "HBM"
        total_t += t
        total_fl += fl
        print(f"{name:<14}{t * 1e3:>9.3f}{fl / 1e9:>9.2f}{mfu:>7.1f}"
              f"{io / 1e9:>8.3f}{hbm:>7.1f}  {bound}", flush=True)
    print(f"{'SUM':<14}{total_t * 1e3:>9.3f}{total_fl / 1e9:>9.2f}"
          f"{total_fl / total_t / PEAK_BF16 * 100:>7.1f}"
          f"  ({bs / total_t:.0f} img/s staged-sum)")


# ---------------------------------------------------------------------------
# space-to-depth stem A/B (the PRODUCTION implementations: direct =
# forward_raw_batch's default stem, s2d = the ISC_S2D_STEM path —
# encoder._stem_conv_s2d; this tool is the measured verdict behind that
# knob's default)
# ---------------------------------------------------------------------------

def _make_stems(params):
    """(direct_stem, s2d_stem): raw-uint8 -> post-relu stem activations,
    both with the normalize fold + offset map exactly as
    forward_raw_batch composes them."""
    dt = params["conv1"]["w"].dtype
    a = jnp.asarray(1.0 / (255.0 * enc.IMAGENET_STD), dt)
    b_ = jnp.asarray(-enc.IMAGENET_MEAN / enc.IMAGENET_STD, dt)
    wf = {"w": params["conv1"]["w"] * a[None, None, :, None]}

    def tail(xc, hw):
        off_src = jnp.broadcast_to(b_, (1,) + tuple(hw) + (3,))
        off = enc._conv(params["conv1"], off_src, 2, 3)
        return jax.nn.relu(enc._bn(params["bn1"], xc + off))

    def direct_stem(xx):
        return tail(enc._conv(wf, xx.astype(dt), 2, 3), xx.shape[1:3])

    def s2d_stem(xx):
        return tail(enc._stem_conv_s2d(wf["w"], xx.astype(dt)),
                    xx.shape[1:3])

    return direct_stem, s2d_stem


def s2d_ab(bs, hw, iters):
    params = _cast_bf16(enc.init_params(jax.random.PRNGKey(0)))
    g = np.random.default_rng(0)
    x = g.integers(0, 256, size=(bs,) + hw + (3,)).astype(np.uint8)

    direct_stem, s2d = _make_stems(params)
    y_direct = np.asarray(jax.jit(direct_stem)(x), np.float32)
    y_s2d = np.asarray(jax.jit(s2d)(x), np.float32)
    err = np.abs(y_s2d - y_direct).max() / max(np.abs(y_direct).max(),
                                               1e-9)
    print(f"s2d stem parity: max rel err {err:.2e} "
          f"({'OK' if err < 2e-2 else 'FAIL'} for bf16)")
    assert err < 2e-2, "space-to-depth stem is not numerically equivalent"

    xj = jnp.asarray(x)
    # ABBA to cancel drift
    t_d1 = _scan_time(direct_stem, xj, iters)
    t_s1 = _scan_time(s2d, xj, iters)
    t_s2 = _scan_time(s2d, xj, iters)
    t_d2 = _scan_time(direct_stem, xj, iters)
    td, ts_ = (t_d1 + t_d2) / 2, (t_s1 + t_s2) / 2
    print(f"stem A/B bs={bs} {hw[0]}x{hw[1]} bf16: direct {td * 1e3:.3f} ms "
          f"vs s2d {ts_ * 1e3:.3f} ms -> {td / ts_:.2f}x", flush=True)

    # end-to-end: the production entry with the knob explicit both ways
    def full_direct(v):
        return enc.forward_raw_batch(params, v, s2d_stem=False)[0].sum()

    def full_s2d(v):
        return enc.forward_raw_batch(params, v, s2d_stem=True)[0].sum()

    t_fd = _scan_time(full_direct, xj, max(2, iters // 4))
    t_fs = _scan_time(full_s2d, xj, max(2, iters // 4))
    print(f"full encoder: direct {t_fd * 1e3:.2f} ms ({bs / t_fd:.0f} "
          f"img/s) vs s2d-stem {t_fs * 1e3:.2f} ms ({bs / t_fs:.0f} "
          f"img/s) -> {t_fd / t_fs:.2f}x e2e", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="both",
                    choices=["profile", "s2d", "both"])
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--hw", type=str, default="448x448")
    ap.add_argument("--iters", type=int, default=0,
                    help="scan length per timing (default: 20 on TPU, "
                         "2 on CPU)")
    a = ap.parse_args(argv)
    hw = tuple(int(v) for v in a.hw.split("x"))
    iters = a.iters or (20 if jax.default_backend() != "cpu" else 2)
    if a.mode in ("profile", "both"):
        profile(a.bs, hw, iters)
    if a.mode in ("s2d", "both"):
        s2d_ab(a.bs, hw, iters)


if __name__ == "__main__":
    main()
