"""Pallas kernel: beam-shared additive content attention.

In beam decode, the visual context is identical for all `beam` candidates
of an image, but the tiled-rows formulation reads att and p_att
([bs, N, 512] each) `beam` times per step from HBM — measured ~40% of the
beam step at serving shapes (N=196). This kernel loads each image's
att/p_att tile into VMEM once and evaluates all `beam` queries against it:

    q[b,k]   = h @ W_h2att + b_h2att                       (rows = bs*beam)
    e[b,k,n] = alpha^T tanh(p_att[b,n] + q[b,k])
    out[b,k] = softmax_n(e[b,k]) @ att[b]

Exact same math as models/captioner.content_attention (reference
captioner.py:12-35); the additive tanh prevents any algebraic factoring,
so sharing the HBM reads requires a kernel. Serving/eval only (no VJP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(h_ref, patt_ref, att_ref, w_ref, b_ref, aw_ref,
            out_ref, *, B: int, TB: int):
    # queries for this image tile: [TB*B, Ah]
    q = jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32) \
        + b_ref[:].astype(jnp.float32)                   # [TB*B, Ah]
    patt = patt_ref[:].astype(jnp.float32)               # [TB, N, Ah]
    att = att_ref[:]                                     # [TB, N, Fe]
    aw = aw_ref[:].astype(jnp.float32)                   # [Ah, 1]
    # att_alpha's bias is omitted: it adds the same constant to every
    # position's logit and cancels in the softmax
    TBB, Ah = q.shape
    N = patt.shape[1]
    q3 = q.reshape(TB, B, Ah)
    aw_row = aw.reshape(1, 1, Ah)                          # [1,1,Ah]
    for k in range(B):
        qk = q3[:, k:k + 1, :]                             # [TB,1,Ah] static
        t = jnp.tanh(patt + qk)                            # [TB,N,Ah]
        # Mosaic has no batched dot_general lowering — VPU mul+reduce
        e = jnp.sum(t * aw_row, axis=-1)                   # [TB,N]
        w = jax.nn.softmax(e, axis=-1)
        res = jnp.sum(w[:, :, None] * att.astype(jnp.float32), axis=1)
        out_ref[:, k, :] = res.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("B", "tile_b", "interpret"))
def beam_content_attention(h, p_cont, att, p_att, *, B: int,
                           tile_b: int = 8, interpret: bool = False):
    """h [bs*B, H] in IMAGE-major row order (row = image*B + beam, as
    produced by jnp.repeat tiling), p_cont = params['attention']['cont'],
    att/p_att [bs, N, Fe/Ah] UNtiled. Returns att_res [bs*B, Fe].
    bs must be a multiple of tile_b."""
    bs = att.shape[0]
    assert h.shape[0] == bs * B and bs % tile_b == 0, (h.shape, bs, B)
    N, Fe = att.shape[1], att.shape[2]
    Ah = p_att.shape[2]
    w = p_cont["h2att"]["w"]
    b = p_cont["h2att"]["b"].reshape(1, -1)
    aw = p_cont["att_alpha"]["w"]

    kern = functools.partial(_kernel, B=B, TB=tile_b)
    out = pl.pallas_call(
        kern,
        grid=(bs // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b * B, h.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, N, Ah), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, N, Fe), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w.shape[0], w.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((aw.shape[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, B, Fe), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, B, Fe), att.dtype),
        interpret=interpret,
    )(h, p_att, att, w, b, aw)
    return out.reshape(bs * B, Fe)
