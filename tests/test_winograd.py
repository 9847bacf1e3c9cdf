"""Winograd F(4x4,3x3) conv == direct conv (ops/winograd.py + the pallas
transform kernels in ops/winograd_pallas.py).

The bf16 TPU serving path routes the sentiment-detector 3x3 convs
(reference models/sentiment_detector.py:11-18) through the pallas
Winograd; these tests pin both implementations to
lax.conv_general_dilated numerics (pallas in interpret mode on CPU) and
check the dispatch gate leaves the f32 path bit-identical.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from insenticap_model_tpu import nn
from insenticap_model_tpu.ops.winograd import conv2d_fast, conv3x3_winograd
from insenticap_model_tpu.ops.winograd_pallas import (
    conv3x3_stack_sm, conv3x3_winograd_nhwc)

ON_TPU = jax.default_backend() == "tpu"


def _direct(x, w, b):
    out = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


@pytest.mark.parametrize("shape", [
    (2, 14, 14, 32, 16),   # detector grid shape (channel-scaled)
    (3, 14, 14, 8, 8),
    (1, 7, 9, 5, 4),       # non-multiple-of-4 extents, H != W
    (2, 16, 16, 4, 4),     # exact tiling, no trim
    (1, 4, 4, 3, 2),       # single tile
    (1, 3, 3, 2, 2),       # smaller than one tile
])
def test_winograd_xla_matches_direct_f32(shape):
    bsz, h, w, cin, cout = shape
    g = np.random.default_rng(0)
    x = jnp.asarray(g.normal(size=(bsz, h, w, cin)), jnp.float32)
    wt = jnp.asarray(g.normal(size=(3, 3, cin, cout)), jnp.float32) * 0.1
    b = jnp.asarray(g.normal(size=(cout,)), jnp.float32)
    ref = _direct(x, wt, b)
    got = conv3x3_winograd(x, wt, b)
    assert got.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [
    # interpret mode costs ~1s per unrolled tile-op, so shapes are small
    # spatially; the 14x14 detector tiling runs for real on TPU via
    # test_detector_fast_path_agrees_with_direct
    (8, 10, 10, 32, 16),   # trimmed tiling (10 % 4 != 0)
    (8, 7, 9, 5, 4),       # odd extents, H != W
])
@pytest.mark.slow
def test_winograd_pallas_matches_direct_f32(shape):
    bsz, h, w, cin, cout = shape
    g = np.random.default_rng(0)
    x = jnp.asarray(g.normal(size=(bsz, h, w, cin)), jnp.float32)
    wt = jnp.asarray(g.normal(size=(3, 3, cin, cout)), jnp.float32) * 0.1
    b = jnp.asarray(g.normal(size=(cout,)), jnp.float32)
    ref = _direct(x, wt, b)
    got = conv3x3_winograd_nhwc(x, wt, b, interpret=not ON_TPU)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_winograd_pallas_f5_odd_extents():
    """The f5 tile variant on odd, non-square extents (7x9: th=tw=2 with
    trim on both dims) — the detector's 14x14 never exercises f5's
    trim path."""
    from insenticap_model_tpu.ops.winograd_pallas import conv3x3_winograd_sm
    g = np.random.default_rng(7)
    x = jnp.asarray(g.normal(size=(8, 7, 9, 5)), jnp.float32)
    wt = jnp.asarray(g.normal(size=(3, 3, 5, 4)), jnp.float32) * 0.1
    b = jnp.asarray(g.normal(size=(4,)), jnp.float32)
    ref = _direct(x, wt, b)
    got = conv3x3_winograd_sm(x.transpose(1, 2, 0, 3), wt, b,
                              interpret=not ON_TPU,
                              variant="f5").transpose(2, 0, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_winograd_pallas_chained_spatial_major():
    """Two chained convs in the spatial-major layout (as the detector
    runs them) == two direct convs."""
    g = np.random.default_rng(4)
    x = jnp.asarray(g.normal(size=(8, 8, 8, 16)), jnp.float32)
    w1 = jnp.asarray(g.normal(size=(3, 3, 16, 8)), jnp.float32) * 0.1
    b1 = jnp.asarray(g.normal(size=(8,)), jnp.float32)
    w2 = jnp.asarray(g.normal(size=(3, 3, 8, 4)), jnp.float32) * 0.1
    b2 = jnp.asarray(g.normal(size=(4,)), jnp.float32)
    ref = _direct(_direct(x, w1, b1), w2, b2)
    xs = x.transpose(1, 2, 0, 3)
    # the fully-fused chain (one kernel per junction, activations stay
    # in VMEM) — this is what the detector runs; per-conv _sm parity is
    # covered by test_winograd_pallas_matches_direct_f32. Both tile
    # variants (f5 is the detector default; matrices from the exact
    # Cook-Toom generator) must match the direct chain.
    for variant in ("f4", "f5"):
        got = conv3x3_stack_sm(xs, [(w1, b1), (w2, b2)],
                               interpret=not ON_TPU,
                               variant=variant).transpose(2, 0, 1, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=variant)


def test_winograd_bf16_within_bf16_noise():
    """bf16 Winograd vs f32 direct: error is the same order as bf16
    direct vs f32 direct (the transform does not amplify bf16 noise
    beyond a small constant)."""
    g = np.random.default_rng(1)
    x32 = jnp.asarray(g.normal(size=(4, 14, 14, 64)), jnp.float32)
    w32 = jnp.asarray(g.normal(size=(3, 3, 64, 32)), jnp.float32) * 0.1
    b32 = jnp.asarray(g.normal(size=(32,)), jnp.float32)
    ref = np.asarray(_direct(x32, w32, b32))
    scale = np.abs(ref).max()

    wino = np.asarray(conv3x3_winograd(
        x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16),
        b32.astype(jnp.bfloat16)), dtype=np.float32)
    direct_bf16 = np.asarray(_direct(
        x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16),
        b32.astype(jnp.bfloat16)).astype(jnp.float32))

    err_wino = np.abs(wino - ref).max() / scale
    err_direct = np.abs(direct_bf16 - ref).max() / scale
    assert err_wino < max(4 * err_direct, 0.05), (err_wino, err_direct)


def test_conv2d_fast_gate():
    """The dispatch helper: f32 input -> bit-identical to nn.conv2d on
    every backend; off-TPU the bf16 path also stays direct (Mosaic
    kernels need a real TPU)."""
    key = jax.random.PRNGKey(0)
    p3 = nn.conv2d_init(key, 256, 256, 3, 3)
    g = np.random.default_rng(2)
    x = jnp.asarray(g.normal(size=(8, 8, 8, 256)), jnp.float32)

    np.testing.assert_array_equal(
        np.asarray(conv2d_fast(p3, x)), np.asarray(nn.conv2d(p3, x)))

    xb = x.astype(jnp.bfloat16)
    pb3 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p3)
    got = np.asarray(conv2d_fast(pb3, xb).astype(jnp.float32))
    if ON_TPU:
        want = np.asarray(conv3x3_winograd_nhwc(
            xb, pb3["w"], pb3["b"]).astype(jnp.float32))
    else:
        want = np.asarray(nn.conv2d(pb3, xb).astype(jnp.float32))
    np.testing.assert_array_equal(got, want)

    # ineligible: stride 2 falls through to direct conv everywhere
    np.testing.assert_array_equal(
        np.asarray(conv2d_fast(pb3, xb, stride=2).astype(jnp.float32)),
        np.asarray(nn.conv2d(pb3, xb, stride=2).astype(jnp.float32)))


def test_detector_fast_path_agrees_with_direct():
    """sentiment_detector.forward's spatial-major pallas stack == the
    batch-major direct stack (forced via the ISC_WINOGRAD env gate on
    TPU; on CPU the fast path is off and both calls take the direct
    route, making this a layout no-op check)."""
    from insenticap_model_tpu.config import Settings
    from insenticap_model_tpu.models import sentiment_detector as sd
    # 1024 -> 512 -> 256: every conv's channels are %256, so the pallas
    # gate actually OPENS for the bf16 call on TPU (512 -> 256 -> 128
    # would silently fall back to the direct conv on conv2)
    settings = Settings(fc_feat_dim=1024, sentiment_convs_num=2,
                        sentiment_fcs_num=2)
    params = sd.init_params(jax.random.PRNGKey(3), 3, settings)
    g = np.random.default_rng(3)
    feats = jnp.asarray(g.normal(size=(8, 14, 14, 1024)), jnp.float32)
    lab32, sp32, sc32 = sd.sample(params, feats, 0.0, 2)
    pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    lab16, sp16, sc16 = sd.sample(pb, feats.astype(jnp.bfloat16), 0.0, 2)
    assert sp16.shape == sp32.shape == (8, 14, 14)
    np.testing.assert_allclose(np.asarray(sc16, np.float32),
                               np.asarray(sc32), atol=0.05)
    assert (np.asarray(lab16) == np.asarray(lab32)).mean() >= 0.8


def test_cook_toom_generator():
    """The transposed-Toom-Cook generator (ops/winograd.cook_toom)
    produces exact F(m,r) matrices: y = A^T[(G g) * (B^T d)] equals the
    valid 1-D correlation, for the shipped F(4,3)/F(5,3) point sets and
    an unrelated one."""
    from fractions import Fraction
    from insenticap_model_tpu.ops.winograd import cook_toom
    rng = np.random.default_rng(6)
    cases = [
        (4, 3, [0, 1, -1, 2, -2]),
        (5, 3, [0, 1, -1, 2, -2, Fraction(1, 2)]),
        (2, 3, [0, 1, -1]),
        (3, 2, [0, 1, -1]),
    ]
    for m, r, pts in cases:
        at, g_m, bt = cook_toom(m, r, pts)
        t = m + r - 1
        for _ in range(10):
            d = rng.normal(size=t)
            g = rng.normal(size=r)
            ref = np.array([sum(d[i + j] * g[j] for j in range(r))
                            for i in range(m)])
            got = at @ ((g_m @ g) * (bt @ d))
            np.testing.assert_allclose(got, ref, atol=1e-5,
                                       err_msg=str((m, r)))


@pytest.mark.slow
def test_grad_path_never_takes_pallas(monkeypatch):
    """ADVICE r2 #1 regression: a bf16 TRAINING step on the sentiment
    detector (non-deterministic forward, eligible shapes) must route its
    convs through the differentiable direct conv — pallas_call has no
    reverse-mode AD rule, so routing the differentiated forward through
    the Winograd kernel crashes under value_and_grad. Forcing the
    eligibility gate open, the non-deterministic path must still avoid
    pallas entirely (the grad succeeds and matches the direct conv)."""
    from insenticap_model_tpu.models import sentiment_detector as sd
    from insenticap_model_tpu.ops import winograd

    # gate forced open: any pallas routing in the grad path would now
    # import/launch the Mosaic kernel (crashes off-TPU and under AD)
    monkeypatch.setattr(winograd, "pallas_eligible", lambda *a: True)

    class S:
        fc_feat_dim = 32
        sentiment_convs_num = 2
        sentiment_fcs_num = 1

    key = jax.random.PRNGKey(0)
    params = sd.init_params(key, 3, S)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params)
    feats = jax.random.normal(key, (8, 14, 14, 32), jnp.bfloat16)
    labels = jnp.zeros((8,), jnp.int32)

    def loss(p):
        return sd.xent_loss(p, feats, labels, dropout_p=0.5,
                            rng=jax.random.PRNGKey(1), deterministic=False)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.sum(jnp.abs(g.astype(jnp.float32))))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0.0
