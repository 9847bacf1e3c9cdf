"""A/B the stem maxpool lowering inside the full encoder forward.

The r4 encoder stage profile (tools/profile_encoder.py, DESIGN.md) put
the ceil-mode 3x3/s2 maxpool at 3.8 ms for 0.26 GB of traffic — 8% of
v5e HBM bandwidth, the worst utilization of any stage. reduce_window is
the straightforward lowering (models/encoder.py:_ceil_maxpool_3x3s2);
this tool measures two algebraic rewrites end-to-end through
forward_raw_batch (standalone numbers lie through the tunnel and across
fusion boundaries — CLAUDE.md):

  separable — max is associative, so 3x3/s2 = a width pass of three
              stride-2 slices then a height pass of three stride-2
              slices (6 elementwise max ops, W pass shrinks the tensor
              2x before the H pass);
  slices9   — all nine shifted stride-2 slices reduced in one pass
              (8 max ops, every operand reads the full input);
  pallas    — the ops/pool_pallas.py kernel (W-parity packed into
              lanes, one HBM pass), including its NHWC<->spatial-major
              transposes at the boundary.

Both pad bottom/right with -inf exactly like the reference's
ceil_mode=True (reference encoder.py:12). Parity is asserted (exact —
max is reassociation-free) before timing.

    python tools/ab_maxpool.py [--bs 32] [--hw 448] [--iters 30]

Run on the real chip (default env); CPU runs check parity only.

CHIP VERDICT (r4, bs=32 448² bf16): REJECTED — both rewrites LOSE
end-to-end under pipelined timing (reduce_window 16.96 ms/batch,
separable 22.62 = 0.75x, slices9 21.83 = 0.78x). reduce_window's
lowering is better than its 8%-of-HBM stage attribution suggested:
the slice-based rewrites materialize strided views XLA cannot fuse
as cheaply. Cautionary note: the FIRST run of this tool timed with a
per-call sync (np.asarray every iteration) and measured a fake 1.36x
WIN for slices9 — the per-call tunnel RTT (~45 ms) is not uniform
across program shapes, so per-call-sync A/Bs can fabricate verdicts
in EITHER direction. Always pipeline dispatches and sync once
(CLAUDE.md measurement rules).

CHIP VERDICT, pallas variant (r4 late): REJECTED too — 0.86x e2e
(reduce_window 17.08 ms/batch, pallas 19.80; parity exact on-chip).
Predicted by the ablation bound (tools/ablate_encoder.py): replacing
the pool with a bare stride-2 subsample moves the FUSED e2e by only
~0.6 ms, i.e. the 3.83 ms scan-profile attribution was a staging
artifact and XLA already runs the fused pool near its floor; the
kernel's two layout transposes + the broken conv1-epilogue fusion
cost more than the 0.6 ms ceiling. The kernel stays (exact-parity,
tests/test_pool_pallas.py) as the measured-rejected record.
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


def _pool_pad(x):
    """Shared ceil-mode -inf pad (same arithmetic as the production
    _ceil_maxpool_3x3s2)."""
    H, W = x.shape[1], x.shape[2]
    oh = -(-(H - 3) // 2) + 1
    ow = -(-(W - 3) // 2) + 1
    ph = max(0, (oh - 1) * 2 + 3 - H)
    pw = max(0, (ow - 1) * 2 + 3 - W)
    xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                 constant_values=-jnp.inf)
    return xp, oh, ow


def maxpool_separable(x):
    xp, oh, ow = _pool_pad(x)
    H2, W2 = xp.shape[1], xp.shape[2]
    c = jnp.maximum(jnp.maximum(xp[:, :, 0:W2 - 2:2], xp[:, :, 1:W2 - 1:2]),
                    xp[:, :, 2:W2:2])
    return jnp.maximum(jnp.maximum(c[:, 0:H2 - 2:2], c[:, 1:H2 - 1:2]),
                       c[:, 2:H2:2])


def maxpool_slices9(x):
    xp, oh, ow = _pool_pad(x)
    H2, W2 = xp.shape[1], xp.shape[2]
    out = None
    for di in range(3):
        for dj in range(3):
            s = xp[:, di:H2 - 2 + di:2, dj:W2 - 2 + dj:2]
            out = s if out is None else jnp.maximum(out, s)
    return out


def maxpool_pallas(x):
    from insenticap_model_tpu.ops.pool_pallas import ceil_maxpool_3x3s2_nhwc
    return ceil_maxpool_3x3s2_nhwc(x, interpret=jax.default_backend() != "tpu")


VARIANTS = {
    "reduce_window": enc._ceil_maxpool_3x3s2,
    "separable": maxpool_separable,
    "slices9": maxpool_slices9,
    "pallas": maxpool_pallas,
}


def _time_e2e(pool_fn, params, imgs, iters):
    """Mean ms/batch of forward_raw_batch with the given maxpool:
    iters back-to-back async dispatches, ONE sync on an in-graph scalar
    at the end (per-call syncs pay the full tunnel RTT per iteration —
    CLAUDE.md dispatch-floor rule; same discipline as bench_encoder)."""
    orig = enc._ceil_maxpool_3x3s2
    enc._ceil_maxpool_3x3s2 = pool_fn
    try:
        fwd = jax.jit(lambda p, x: enc.forward_raw_batch(p, x)[0].sum())
        dev = jax.device_put(imgs)
        np.asarray(fwd(params, dev))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, dev)
        np.asarray(out)
        return float((time.perf_counter() - t0) / iters * 1e3)
    finally:
        enc._ceil_maxpool_3x3s2 = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--hw", type=int, default=448)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--variants", default="separable,slices9,pallas",
                    help="comma list of non-baseline variants to time")
    a = ap.parse_args()
    chosen = [v.strip() for v in a.variants.split(",") if v.strip()]
    assert all(v in VARIANTS for v in chosen), chosen

    rng = np.random.RandomState(0)
    # parity at an odd extent too (exercises the ceil-mode pad branch);
    # C=64 keeps B*C a 128-multiple so the REAL pallas kernel runs on
    # TPU (smaller C falls back to reduce_window there)
    for hw in (14, 13):
        x = jnp.asarray(rng.randn(2, hw, hw, 64), jnp.float32)
        ref = np.asarray(VARIANTS["reduce_window"](x))
        for name in ("separable", "slices9", "pallas"):
            got = np.asarray(VARIANTS[name](x))
            assert got.shape == ref.shape, (name, got.shape, ref.shape)
            np.testing.assert_array_equal(got, ref), name
    print("parity: separable/slices9/pallas == reduce_window (exact)")

    backend = jax.default_backend()
    params = cast_bf16(enc.init_params(jax.random.PRNGKey(0)))
    imgs = rng.randint(0, 256, (a.bs, a.hw, a.hw, 3), np.uint8)

    res = {}
    for name in ["reduce_window"] + chosen:
        res[name] = _time_e2e(VARIANTS[name], params, imgs, a.iters)
        print(f"{name:14s} e2e {res[name]:7.2f} ms/batch "
              f"({a.bs / res[name] * 1e3:6.0f} img/s)")
    base = res["reduce_window"]
    for name in chosen:
        r = base / res[name]
        verdict = "WIN" if r >= 1.03 else ("neutral" if r >= 0.99 else "LOSS")
        print(f"{name} vs reduce_window: {r:.2f}x -> {verdict}")
    if backend != "tpu":
        print("(non-TPU backend: numbers are not meaningful)")


if __name__ == "__main__":
    main()
