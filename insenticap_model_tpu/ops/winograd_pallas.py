"""Pallas transform kernels for Winograd F(4x4,3x3) (see winograd.py).

The pure-XLA Winograd in winograd.py loses to direct convolution despite
a 2.9x multiply reduction: XLA materializes the transform DAG as many
full-size f32 intermediates plus layout copies (~48 ms of overhead around
a ~5 ms GEMM at detector shapes). These kernels do each transform in ONE
pass over HBM:

  kernel A: padded input  [Hp, Wp, B, C]  ->  V [36, 16, B, C]  (bf16)
  (XLA)   : batched GEMM  [36, 16B, C] @ [36, C, K] -> [36, 16B, K]
  kernel B: M [36, 16, B, K] (+bias)      ->  y [16, 16, B, K]

Layout is spatial-major (H, W, B, C) end to end: tile extraction becomes
static strided slicing over the two LEADING (untiled) dims, so Mosaic
never slices inside an (8,128) tile, and chaining two convs (the
sentiment detector) needs no transposes in between — only one
[B,H,W,C] -> [H,W,B,C] transpose at entry and one back at exit.

Transform arithmetic in f32, GEMM in the serving dtype (bf16) with f32
accumulation. Serving/eval only (no custom VJP; the f32 training path
uses the direct conv).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .winograd import (_AT, _AT5, _BT, _BT5, _G, _G5, apply_rows,
                       transform_filter)

# variant registry: name -> (m = output tile, A^T [m,t], G [t,3],
# B^T [t,t]); t = m + 2 for r = 3.
# F(7x7,3x3) (zero tile waste on 14x14, 5.45x multiplies) was generated
# and measured too: NOT shipped — no speed win (12.17 vs 12.10 ms, the
# stack is no longer GEMM-bound at f5) and its transform amplification
# (~4451 vs f5's 526 max-abs-row-sum product) makes bf16 outputs wrong
# by 3.5x the signal scale.
VARIANTS = {
    "f4": (4, _AT, _G, _BT),      # F(4x4,3x3): 36 GEMMs, 2.95x eff.
    "f5": (5, _AT5, _G5, _BT5),   # F(5x5,3x3): 49 GEMMs, 4.0x eff.
}


def _fwd_tile(d, bt):
    """2-D forward transform of one t x t tile given as d[i][j] vectors:
    returns the t*t transformed planes stacked."""
    t = len(bt)
    t1 = [apply_rows(bt, [d[i][j] for i in range(t)]) for j in range(t)]
    v = [apply_rows(bt, [t1[j][a] for j in range(t)]) for a in range(t)]
    return jnp.stack([v[a][b] for a in range(t) for b in range(t)])


def _inv_tile(m_planes, at):
    """2-D inverse transform: m_planes[ab] -> yy[x][y] (m x m grids)."""
    t, m = len(at[0]), len(at)
    t2 = [apply_rows(at, [m_planes[a * t + b] for a in range(t)])
          for b in range(t)]
    return [apply_rows(at, [t2[b][x] for b in range(t)])
            for x in range(m)]


def _input_kernel(x_ref, v_ref, *, th: int, tw: int, m: int, bt):
    """x_ref [m*th+2, m*tw+2, bb, cb] -> v_ref [t*t, th*tw, bb, cb].

    Per-tile unrolled loop: Mosaic supports neither strided slices
    (vector.extract_strided_slice wants stride 1) nor general
    transposes, so every access is a single leading-dim index producing
    a [bb, cb] vector — tile-shaped for the VPU."""
    t = len(bt)
    x = x_ref[:].astype(jnp.float32)
    for ti in range(th):
        for tj in range(tw):
            d = [[x[m * ti + i, m * tj + j] for j in range(t)]
                 for i in range(t)]
            v_ref[:, ti * tw + tj] = _fwd_tile(d, bt).astype(v_ref.dtype)


def _output_kernel(m_ref, b_ref, y_ref, *, th: int, tw: int, m: int, at):
    """m_ref [t*t, th*tw, bb, kb] (+ bias [1, kb]) -> y_ref
    [m*th, m*tw, bb, kb]."""
    t = len(at[0])
    mm = m_ref[:].astype(jnp.float32)
    bias = b_ref[0, :].astype(jnp.float32)
    for ti in range(th):
        for tj in range(tw):
            tt = ti * tw + tj
            yy = _inv_tile([mm[ab, tt] for ab in range(t * t)], at)
            for x in range(m):
                for y in range(m):
                    y_ref[m * ti + x, m * tj + y] = \
                        (yy[x][y] + bias).astype(y_ref.dtype)


def _middle_kernel(m_ref, b_ref, v_ref, *, th: int, tw: int,
                   h: int, wd: int, m: int, at, bt):
    """Fused inverse-transform -> pad -> forward-transform between two
    chained Winograd convs: conv1's GEMM output tiles become conv2's
    transformed input without the spatial activation ever touching HBM
    (the detector's conv stack has no nonlinearity in between —
    reference sentiment_detector.py:11-18 appends dropout+relu once
    after the stack, so the chain point is linear).

    m_ref [t*t, th*tw, bb, kb] (+ conv1 bias [1, kb]) ->
    v_ref [t*t, th*tw, bb, kb]."""
    t = len(bt)
    mm = m_ref[:]      # cast per-access: a full f32 copy would blow VMEM
    bias = b_ref[0, :].astype(jnp.float32)
    zero = jnp.zeros(mm.shape[2:], jnp.float32)        # [bb, kb]

    # inverse transform of every tile: y[h][w] grids, f32, in VMEM
    hp, wp = m * th + 2, m * tw + 2
    y = [[zero for _ in range(wp)] for _ in range(hp)]
    for ti in range(th):
        for tj in range(tw):
            tt = ti * tw + tj
            yy = _inv_tile([mm[ab, tt].astype(jnp.float32)
                            for ab in range(t * t)], at)
            for x in range(m):
                for yj in range(m):
                    oh, ow = m * ti + x, m * tj + yj
                    if oh < h and ow < wd:             # trim the tile pad
                        # +1: SAME-pad offset of the next conv's input
                        y[oh + 1][ow + 1] = yy[x][yj] + bias

    # forward transform of the padded activation for the next conv
    for ti in range(th):
        for tj in range(tw):
            d = [[y[m * ti + i][m * tj + j] for j in range(t)]
                 for i in range(t)]
            v_ref[:, ti * tw + tj] = _fwd_tile(d, bt).astype(v_ref.dtype)


def conv3x3_winograd_sm(x, w, b=None, *, block_b: int = 8,
                        block_c: int = 256, interpret: bool = False,
                        variant: str = "f4"):
    """Winograd 3x3 SAME conv on SPATIAL-MAJOR input.

    x [H, W, B, C], w [3, 3, C, K], b [K] or None -> y [H, W, B, K].
    B must divide by block_b and C, K by block_c (callers fall back to
    the direct conv otherwise). Matches the direct conv up to float
    rounding (tests/test_winograd.py). The single-layer case of
    conv3x3_stack_sm (one kernel sequence, shared implementation)."""
    return conv3x3_stack_sm(x, ((w, b),), block_b=block_b,
                            block_c=block_c, interpret=interpret,
                            variant=variant)


@functools.partial(jax.jit, static_argnames=("block_b", "block_c",
                                             "interpret", "variant"))
def conv3x3_stack_sm(x, layers, *, block_b: int = 8, block_c: int = 256,
                     interpret: bool = False, variant: str = "f4"):
    """A CHAIN of 3x3 SAME convs with no nonlinearity in between, fully
    in the Winograd domain: one input-transform kernel, one GEMM per
    layer, one fused middle kernel per junction (_middle_kernel), one
    output-transform kernel. The inter-conv activations never hit HBM in
    spatial form. x [H, W, B, C] spatial-major; layers = [(w, b), ...];
    variant: F(m x m, 3x3) tile size, see VARIANTS.
    """
    assert layers, "conv3x3_stack_sm needs at least one conv layer"
    _m, at, g_mat, bt = VARIANTS[variant]
    t = _m + 2
    h, wd, bsz, _ = x.shape
    th, tw = -(-h // _m), -(-wd // _m)
    hp, wp = th * _m + 2, tw * _m + 2
    bb = min(block_b, bsz)
    assert bsz % bb == 0, (x.shape, block_b)
    gemm_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    xp = jnp.pad(x, ((1, hp - h - 1), (1, wp - wd - 1), (0, 0), (0, 0)))
    cin0 = x.shape[-1]
    cb0 = min(block_c, cin0)
    assert cin0 % cb0 == 0
    v = pl.pallas_call(
        functools.partial(_input_kernel, th=th, tw=tw, m=_m, bt=bt),
        grid=(bsz // bb, cin0 // cb0),
        in_specs=[pl.BlockSpec((hp, wp, bb, cb0), lambda i, j: (0, 0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t * t, th * tw, bb, cb0),
                               lambda i, j: (0, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t * t, th * tw, bsz, cin0),
                                       gemm_dtype),
        interpret=interpret,
    )(xp)

    for li, (w, b) in enumerate(layers):
        cin, cout = w.shape[2], w.shape[3]
        kb = min(block_c, cout)
        assert cout % kb == 0, (w.shape, block_c)
        u = transform_filter(w, g_mat=g_mat).astype(gemm_dtype) \
            .reshape(t * t, cin, cout)
        vf = v.reshape(t * t, th * tw * bsz, cin)
        m = lax.dot_general(vf, u, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        m = m.astype(gemm_dtype).reshape(t * t, th * tw, bsz, cout)
        bias = (b if b is not None
                else jnp.zeros((cout,), x.dtype)).reshape(1, cout)
        last = li == len(layers) - 1
        kern = functools.partial(
            _output_kernel if last else _middle_kernel, th=th, tw=tw,
            m=_m, **({"at": at} if last
                     else {"h": h, "wd": wd, "at": at, "bt": bt}))
        out_shape = ((_m * th, _m * tw, bsz, cout) if last
                     else (t * t, th * tw, bsz, cout))
        out_block = ((_m * th, _m * tw, bb, kb) if last
                     else (t * t, th * tw, bb, kb))
        res = pl.pallas_call(
            kern,
            grid=(bsz // bb, cout // kb),
            in_specs=[
                pl.BlockSpec((t * t, th * tw, bb, kb),
                             lambda i, j: (0, 0, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kb), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(out_block, lambda i, j: (0, 0, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                out_shape, x.dtype if last else gemm_dtype),
            interpret=interpret,
        )(m, bias)
        v = res
    return v[:h, :wd]


def conv3x3_winograd_nhwc(x, w, b=None, *, interpret: bool = False):
    """[B,H,W,C] wrapper: one transpose in, one out. For a single conv;
    chained convs (the detector) should stay spatial-major in between."""
    y = conv3x3_winograd_sm(x.transpose(1, 2, 0, 3), w, b,
                            interpret=interpret)
    return y.transpose(2, 0, 1, 3)
