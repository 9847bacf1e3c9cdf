"""Winograd F(4x4, 3x3) convolution for the sentiment-detector FCN head.

The reference spends its detector FLOPs on two dense 3x3 convs
(reference models/sentiment_detector.py:11-18: Conv2d(2048,1024,3) then
Conv2d(1024,512,3) on the 14x14 grid, with NO nonlinearity between —
the Sequential appends dropout+relu once after the stack). Measured on
TPU these convs run at bf16 MXU peak (~18.4 ms of the 35 ms serving
batch at bs=384; DESIGN.md round-2 profile), i.e. direct convolution has
no headroom left — the only way to go faster is to do fewer multiplies.

Winograd F(4x4, 3x3) (Lavin & Gray, arXiv:1509.09308) computes each 4x4
output tile with 36 multiplies instead of 144: inputs are transformed
into 36 "tile-element" planes, the conv becomes 36 independent
[rows, Cin] @ [Cin, Cout] GEMMs (batched on the MXU), and a small inverse
transform recovers the spatial tiles. On a 14x14 grid that is a 2.9x
multiply reduction after tile-padding waste (16x16 tiled vs 14x14 valid).

Precision: the transforms run in f32 (the transform matrices contain
1/6-type constants that are exactly the wrong shape for bf16); the big
batched GEMM runs in bf16 with f32 accumulation — the same policy as the
rest of the serving path. The result matches lax direct conv to ~1e-5
relative in f32 and to normal bf16 noise in bf16
(tests/test_winograd.py).

Used only on the bf16 serving path (models/sentiment_detector.py gates on
dtype); f32 training and parity tests keep `lax.conv_general_dilated`.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# F(4x4, 3x3) transform matrices (Lavin & Gray; the standard
# interpolation points {0, +-1, +-2, inf}).
_BT = np.array([
    [4.,  0., -5.,  0., 1., 0.],
    [0., -4., -4.,  1., 1., 0.],
    [0.,  4., -4., -1., 1., 0.],
    [0., -2., -1.,  2., 1., 0.],
    [0.,  2., -1., -2., 1., 0.],
    [0.,  4.,  0., -5., 0., 1.],
], dtype=np.float32)

_G = np.array([
    [1. / 4.,   0.,      0.],
    [-1. / 6., -1. / 6., -1. / 6.],
    [-1. / 6.,  1. / 6., -1. / 6.],
    [1. / 24.,  1. / 12., 1. / 6.],
    [1. / 24., -1. / 12., 1. / 6.],
    [0.,        0.,       1.],
], dtype=np.float32)

_AT = np.array([
    [1., 1.,  1., 1.,  1., 0.],
    [0., 1., -1., 2., -2., 0.],
    [0., 1.,  1., 4.,  4., 0.],
    [0., 1., -1., 8., -8., 1.],
], dtype=np.float32)

_M = 4   # output tile
_R = 3   # kernel
_T = _M + _R - 1  # 6: input tile / transform size


def transform_filter(w, accum_dtype=jnp.float32, g_mat=None):
    """w [3, 3, Cin, Cout] -> U [t, t, Cin, Cout] = G w G^T (per channel
    pair). Cheap relative to the main GEMM (~0.1% of its FLOPs); runs per
    call so converted checkpoints keep their spatial-domain layout.
    g_mat: the [t, 3] filter-transform matrix (default: F(4x4,3x3))."""
    g = jnp.asarray(_G if g_mat is None else g_mat, accum_dtype)
    w = w.astype(accum_dtype)
    u = jnp.einsum("ur,rsio->usio", g, w)
    return jnp.einsum("vs,usio->uvio", g, u)


def cook_toom(m: int, r: int, points):
    """Generate F(m, r) Winograd matrices (A^T [m,t], G [t,r], B^T [t,t])
    by transposed Toom-Cook over t-1 finite points + infinity, in exact
    rational arithmetic: y = A^T [(G g) * (B^T d)] equals the m-output
    valid correlation of d (len t) with g (len r).

    Derivation: convolution is C_g = V^-1 diag(V_r g) V_m over the
    extended Vandermonde V (finite evaluations + leading coefficient at
    infinity); correlation is its transpose, giving A^T = V_m^T,
    B^T = V^-T, G = V_r. Validated against direct correlation in
    tests/test_winograd.py."""
    from fractions import Fraction
    t = m + r - 1
    assert len(points) == t - 1, (m, r, points)
    a = [Fraction(x) for x in points]

    def vand(width):
        rows = [[p ** k for k in range(width)] for p in a]
        rows.append([Fraction(0)] * (width - 1) + [Fraction(1)])
        return rows

    full = vand(t)
    aug = [row[:] + [Fraction(int(i == j)) for j in range(t)]
           for i, row in enumerate(full)]
    for col in range(t):
        piv = next(i for i in range(col, t) if aug[i][col] != 0)
        aug[col], aug[piv] = aug[piv], aug[col]
        pv = aug[col][col]
        aug[col] = [x / pv for x in aug[col]]
        for i in range(t):
            if i != col and aug[i][col] != 0:
                f = aug[i][col]
                aug[i] = [x - f * y for x, y in zip(aug[i], aug[col])]
    vinv = [row[t:] for row in aug]
    tofl = lambda rows: np.array([[float(x) for x in rr] for rr in rows],
                                 dtype=np.float32)
    return tofl(vand(m)).T, tofl(vand(r)), tofl(vinv).T


# F(5x5, 3x3): 4.0x effective multiply reduction on the 14x14 detector
# grid (vs 2.95x for F(4x4,3x3)): 49/25 multiplies per output and only
# 15x15-vs-14x14 tile waste. Points chosen for small constants
# (|B^T| <= 5); transform arithmetic stays f32 either way.
from fractions import Fraction as _Fr
_AT5, _G5, _BT5 = cook_toom(5, 3, [0, 1, -1, 2, -2, _Fr(1, 2)])

# (F(7x7,3x3) was also generated and measured — rejected: no speed win
# and bf16-destroying transform amplification; see winograd_pallas.py.)


def apply_rows(mat, vecs):
    """Apply a small transform matrix to a list of equal-shape arrays,
    unrolled as sparse multiply-adds (what Mosaic wants; a K=6 einsum
    lowers to MXU matmuls + layout copies and measured 3.4x slower than
    direct conv end-to-end)."""
    out = []
    for row in mat:
        acc = None
        for c, v in zip(row, vecs):
            c = float(c)
            if c == 0.0:
                continue
            term = v if c == 1.0 else c * v
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def _bt_combos(d):
    """Apply B^T along a 6-list (hand-unrolled sparse rows of _BT, so XLA
    sees fusible elementwise adds instead of a K=6 matmul)."""
    d0, d1, d2, d3, d4, d5 = d
    return [
        4. * d0 - 5. * d2 + d4,
        -4. * d1 - 4. * d2 + d3 + d4,
        4. * d1 - 4. * d2 - d3 + d4,
        -2. * d1 - d2 + 2. * d3 + d4,
        2. * d1 - d2 - 2. * d3 + d4,
        4. * d1 - 5. * d3 + d5,
    ]


def _at_combos(m):
    """Apply A^T along a 6-list (hand-unrolled rows of _AT)."""
    m0, m1, m2, m3, m4, m5 = m
    p, q = m1 + m2, m1 - m2
    r, s = m3 + m4, m3 - m4
    return [
        m0 + p + r,
        q + 2. * s,
        p + 4. * r,
        q + 8. * s + m5,
    ]


def conv3x3_winograd(x, w, b=None, *, out_dtype=None):
    """SAME-padding stride-1 3x3 conv via Winograd F(4x4, 3x3).

    x [B, H, W, Cin] (NHWC), w [3, 3, Cin, Cout] (HWIO), b [Cout] or None.
    Matches lax.conv_general_dilated(..., padding='SAME') up to float
    rounding.

    Implementation is HBM-traffic-shaped, not textbook-shaped: tiles are
    strided slices (no materialized patch tensor), the input/output
    transforms are hand-unrolled sparse adds that XLA fuses into single
    elementwise passes (an einsum against the 6x6 transform matrix lowers
    to a K=6 MXU matmul plus layout copies — measured 37% SLOWER
    end-to-end than direct conv; this version is the one that wins), and
    the transformed tensor is laid out [36, rows, Cin] so the 36-batch
    GEMM needs no transposes. GEMMs run in x.dtype (bf16 on the serving
    path) with f32 accumulation; transform arithmetic in f32.
    """
    out_dtype = out_dtype or x.dtype
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    th, tw = -(-h // _M), -(-wd // _M)        # output tiles per dim
    # SAME pad (1 left/top) + pad out to the tiled extent (+1 halo right).
    x = jnp.pad(x, ((0, 0), (1, th * _M + 1 - h), (1, tw * _M + 1 - wd),
                    (0, 0)))
    # d[i][j][B, th, tw, Cin] = input element (i, j) of every 6x6 tile,
    # as a stride-4 slice of the padded input (reads fuse into the
    # transform; nothing is materialized per-tile).
    d = [[x[:, i:i + 4 * (th - 1) + 1:4, j:j + 4 * (tw - 1) + 1:4, :]
          .astype(jnp.float32)
          for j in range(_T)] for i in range(_T)]

    # V = B^T d B, unrolled: rows over i for each j, then over j.
    t1 = [_bt_combos([d[i][j] for i in range(_T)]) for j in range(_T)]
    v = [_bt_combos([t1[j][a] for j in range(_T)]) for a in range(_T)]
    # [36, B*th*tw, Cin] in the GEMM's natural batch-major layout.
    # The CPU backend (used by the test suite) cannot emit mixed
    # bf16 x bf16 -> f32 dots; keep the GEMM in f32 there. On TPU the
    # GEMM runs in x.dtype (bf16 serving) with f32 MXU accumulation.
    gemm_dtype = x.dtype if jax.default_backend() == "tpu" else jnp.float32
    n = bsz * th * tw
    vf = jnp.stack([v[a][bb].astype(gemm_dtype).reshape(n, cin)
                    for a in range(_T) for bb in range(_T)])
    u = transform_filter(w).astype(gemm_dtype).reshape(_T * _T, cin, cout)
    # 36 batched GEMMs on the MXU: [n, Cin] @ [Cin, Cout] per (a, b).
    m = lax.dot_general(vf, u, ((((2,), (1,))), (((0,), (0,)))),
                        preferred_element_type=jnp.float32)
    m = m.reshape(_T, _T, bsz, th, tw, cout)

    # Y = A^T M A, unrolled the same way (f32).
    t2 = [_at_combos([m[a, bb] for a in range(_T)]) for bb in range(_T)]
    yy = [_at_combos([t2[bb][xx] for bb in range(_T)]) for xx in range(_M)]
    s = jnp.stack([yy[xx][y2].astype(out_dtype)
                   for xx in range(_M) for y2 in range(_M)])
    s = s.reshape(_M, _M, bsz, th, tw, cout)
    y = s.transpose(2, 3, 0, 4, 1, 5).reshape(bsz, th * _M, tw * _M, cout)
    y = y[:, :h, :wd, :]
    if b is not None:
        y = y + b.astype(out_dtype)
    return y.astype(out_dtype)


def pallas_eligible(x_shape, w_shape, dtype) -> bool:
    """True when the pallas Winograd path applies: 3x3 kernel, bf16 (the
    serving policy — f32 training keeps the exact direct conv), a real
    TPU backend for Mosaic, and block-divisible batch/channel dims
    (winograd_pallas block sizes). Opt-out: ISC_WINOGRAD=0."""
    import os
    bsz, h, wd = x_shape[0], x_shape[1], x_shape[2]
    # channel dims come from the weight: callers checking a chained
    # stack pass the stack's input shape for every layer
    kh, kw, cin, cout = w_shape
    # spatial cap: the kernels hold the whole (padded) plane per block and
    # unroll per tile — validated at the detector's 14x14 (16 tiles);
    # larger extents would blow the 16 MB scoped VMEM / compile time
    tiles = (-(-h // 4)) * (-(-wd // 4))
    return ((kh, kw) == (3, 3) and dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and bsz % 8 == 0 and cin % 256 == 0 and cout % 256 == 0
            and tiles <= 16
            and os.environ.get("ISC_WINOGRAD", "1") == "1")


def conv2d_fast(p, x, stride: int = 1, padding="SAME", *,
                allow_pallas: bool = True):
    """Drop-in for nn.conv2d that routes eligible convs through the
    pallas Winograd path (winograd_pallas.py). Everything else falls
    through to the direct conv — f32 training and the parity tests are
    bit-identical to nn.conv2d. (The pure-XLA conv3x3_winograd above is
    NOT used on any hot path: measured 3.4x slower than direct at
    detector shapes; it documents the algorithm and pins numerics.)

    allow_pallas: callers in a differentiated context MUST pass False —
    pallas_call has no reverse-mode AD rule, so a bf16 TPU training step
    routed through the Winograd kernel would crash under value_and_grad
    (ADVICE r2 #1). The shape/dtype gate alone cannot see autodiff."""
    if allow_pallas and stride == 1 and padding == "SAME" \
            and pallas_eligible(x.shape, p["w"].shape, x.dtype):
        from .winograd_pallas import conv3x3_winograd_nhwc
        return conv3x3_winograd_nhwc(x, p["w"], p.get("b"))
    out = lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=padding if isinstance(padding, str) else list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        out = out + p["b"]
    return out
