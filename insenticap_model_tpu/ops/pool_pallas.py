"""Pallas kernel for the encoder stem's ceil-mode 3x3/stride-2 maxpool.

The reference patches torchvision's maxpool to kernel 3, stride 2,
padding 0, ceil_mode=True (reference models/encoder.py:12). XLA lowers
``lax.reduce_window`` for that shape at ~8% of v5e HBM bandwidth (the
worst-utilization stage in the round-4 encoder profile, DESIGN.md), and
the algebraic stride-2-slice rewrites measured WORSE end-to-end
(tools/ab_maxpool.py) because strided views defeat XLA fusion. This
kernel streams the tensor once with only Mosaic-friendly ops:

  * spatial-major input [H, W, B, C] viewed as [H, Wq, 2*B*C] — the
    W-parity packs into the LANE dimension for free (W pairs are
    adjacent B*C chunks in row-major), so the stride-2 window walk
    along W becomes full-lane even/odd block reads plus ONE stride-1
    sublane shift;
  * the stride-2 walk along H is unrolled leading-dim indexing
    (the ops/winograd_pallas.py idiom — no strided vector slices);
  * the window's +1 row overlap between H tiles comes from a 2-row
    "tail" view of the same array (a second BlockSpec), not from
    overlapping block index maps (Pallas offsets are block-aligned).

Out-of-range window taps read -inf from a bottom/right pre-pad, which
XLA fuses into the producer's output write. Max is reassociation-free,
so the kernel is bit-exact vs reduce_window in every dtype.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float("-inf")


def _pool_kernel(e_ref, o_ref, et_ref, ot_ref, out_ref, *, hb: int,
                 ow: int):
    """e/o = even/odd-column lane halves of the packed input.

    e_ref/o_ref [2*hb, ow+1, L]; et/ot [2, ow+1, L] (the next two rows);
    out_ref [hb, ow, L]. Output row i reads input rows 2i..2i+2; row
    2*hb comes from the tail block."""
    def erow(r):
        return e_ref[r] if r < 2 * hb else et_ref[r - 2 * hb]

    def orow(r):
        return o_ref[r] if r < 2 * hb else ot_ref[r - 2 * hb]

    for i in range(hb):
        re = jnp.maximum(jnp.maximum(erow(2 * i), erow(2 * i + 1)),
                         erow(2 * i + 2))                  # [ow+1, L]
        ro = jnp.maximum(jnp.maximum(orow(2 * i), orow(2 * i + 1)),
                         orow(2 * i + 2))
        m = jnp.maximum(re[:ow], ro[:ow])        # window cols 2j, 2j+1
        out_ref[i] = jnp.maximum(m, re[1:])      # window col 2j + 2


def _pick_tiles(oh: int, ow: int, bc: int, itemsize: int):
    """(hb, lb): H rows per grid step (a divisor of oh) and the lane
    block (a 128-multiple divisor of B*C when possible). Pallas DOUBLE-
    BUFFERS every block, so the fit test is 2x the per-step block bytes
    against a 12 MB slice of v5e's 16 MB scoped VMEM (measured: the
    first cut budgeted single-buffered and OOM'd at exactly 2x)."""
    divisors = [d for d in range(1, min(oh, 16) + 1) if oh % d == 0]
    # fallback MUST divide bc (a non-divisor block would mis-place the
    # odd-column half at lane offset lb*nl != bc): whole-lane block
    lbs = [lb for lb in (512, 256, 128) if bc % lb == 0] or [bc]
    budget = 12 * 2 ** 20
    for lb in lbs:
        for hb in reversed(divisors):
            step = (2 * (2 * hb) * (ow + 1) * lb      # E + O main blocks
                    + 2 * 2 * (ow + 1) * lb           # E + O tails
                    + hb * ow * lb) * itemsize * 2    # out; x2 dbl-buffer
            if step <= budget:
                return hb, lb
    return divisors[0], lbs[-1]


def _reduce_window_sm(x):
    """reduce_window fallback for lane-incompatible shapes (Mosaic needs
    128-multiple lane blocks; see ceil_maxpool_3x3s2_sm)."""
    H, W = x.shape[0], x.shape[1]
    oh = -(-(H - 3) // 2) + 1
    ow = -(-(W - 3) // 2) + 1
    ph = max(0, (oh - 1) * 2 + 3 - H)
    pw = max(0, (ow - 1) * 2 + 3 - W)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (3, 3, 1, 1), (2, 2, 1, 1),
        ((0, ph), (0, pw), (0, 0), (0, 0)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def ceil_maxpool_3x3s2_sm(x, *, interpret: bool = False):
    """MaxPool2d(3, stride 2, pad 0, ceil_mode=True) on SPATIAL-MAJOR
    input x [H, W, B, C] -> [oh, ow, B, C]. Bit-exact vs the
    reduce_window lowering (tests/test_pool_pallas.py). Shapes whose
    B*C is not a 128-multiple fall back to reduce_window on TPU (Mosaic
    lane blocks must divide by 128; interpret mode takes any shape)."""
    H, W, B, C = x.shape
    if not interpret and (B * C) % 128 != 0:
        return _reduce_window_sm(x)
    oh = -(-(H - 3) // 2) + 1
    ow = -(-(W - 3) // 2) + 1
    bc = B * C
    hb, lb = _pick_tiles(oh, ow, bc, x.dtype.itemsize)

    # -inf pad to the exact extents the window taps can touch:
    # rows 0..2*oh+1 (tail block over-reads one row), cols 0..2*ow+1.
    xp = jnp.pad(x, ((0, 2 * oh + 2 - H), (0, 2 * ow + 2 - W),
                     (0, 0), (0, 0)), constant_values=_NEG)
    xq = xp.reshape(2 * oh + 2, ow + 1, 2 * bc)   # free view: W-parity
    nl = bc // lb                                  # lane blocks per half

    out = pl.pallas_call(
        functools.partial(_pool_kernel, hb=hb, ow=ow),
        grid=(oh // hb, nl),
        in_specs=[
            pl.BlockSpec((2 * hb, ow + 1, lb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hb, ow + 1, lb),
                         lambda i, j: (i, 0, j + nl),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ow + 1, lb),
                         lambda i, j: (hb * i + hb, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ow + 1, lb),
                         lambda i, j: (hb * i + hb, 0, j + nl),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, ow, lb), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((oh, ow, bc), x.dtype),
        interpret=interpret,
    )(xq, xq, xq, xq)
    return out.reshape(oh, ow, B, C)


def ceil_maxpool_3x3s2_nhwc(x, *, interpret: bool = False):
    """[B, H, W, C] wrapper: one transpose in, one out (callers that can
    produce/consume spatial-major should use the _sm form directly)."""
    y = ceil_maxpool_3x3s2_sm(x.transpose(1, 2, 0, 3), interpret=interpret)
    return y.transpose(2, 0, 1, 3)
