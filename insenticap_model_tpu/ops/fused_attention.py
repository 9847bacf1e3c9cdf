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


def _kernel_v2(h_ref, patt_ref, att_ref, w_ref, b_ref, aw_ref,
               out_ref, *, B: int, TB: int):
    """v1 with the two reduction passes moved from the VPU to the MXU
    (VERDICT r4 next #4 attempt: the kernel runs ~2.5x above its HBM
    floor and is VPU-bound — DESIGN.md r4 item 9 / r3e). The alpha
    reduce becomes one [TB*N, Ah] x [Ah, 1] dot and the weighted sum
    becomes per-tile-row [B, N] x [N, Fe] dots (Mosaic has no batched
    dot_general; the static TB loop keeps every dot 2-D). The tanh —
    the irreducible transcendental mass — stays on the VPU. Softmax
    weights enter the MXU dot in att's dtype: f32 stays exact; in bf16
    serving the result feeds a bf16 output anyway."""
    q = jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32) \
        + b_ref[:].astype(jnp.float32)                   # [TB*B, Ah]
    patt = patt_ref[:].astype(jnp.float32)               # [TB, N, Ah]
    att = att_ref[:]                                     # [TB, N, Fe]
    aw = aw_ref[:].astype(jnp.float32)                   # [Ah, 1]
    _, Ah = q.shape
    N = patt.shape[1]
    q3 = q.reshape(TB, B, Ah)
    ws = []
    for k in range(B):
        qk = q3[:, k:k + 1, :]                           # [TB,1,Ah] static
        t = jnp.tanh(patt + qk)                          # [TB,N,Ah] (VPU)
        e = jnp.dot(t.reshape(TB * N, Ah), aw,           # (MXU)
                    preferred_element_type=jnp.float32).reshape(TB, N)
        ws.append(jax.nn.softmax(e, axis=-1))
    wstack = jnp.stack(ws, axis=1)                       # [TB, B, N]
    for tb in range(TB):
        res = jnp.dot(wstack[tb].astype(att.dtype), att[tb],
                      preferred_element_type=jnp.float32)  # [B,Fe] (MXU)
        out_ref[tb, :, :] = res.astype(out_ref.dtype)


_KERNELS = {"v1": _kernel, "v2": _kernel_v2}


def beam_content_attention(h, p_cont, att, p_att, *, B: int,
                           tile_b: int = 8, interpret: bool = False,
                           variant: str = None):
    """h [bs*B, H] in IMAGE-major row order (row = image*B + beam, as
    produced by jnp.repeat tiling), p_cont = params['attention']['cont'],
    att/p_att [bs, N, Fe/Ah] UNtiled. Returns att_res [bs*B, Fe].
    bs must be a multiple of tile_b.

    variant: "v1" (VPU reduces) or "v2" (MXU reduces, _kernel_v2);
    default = ISC_ATT_KERNEL env or "v1". The env is resolved HERE, in
    the un-jitted wrapper, never inside the jitted body: a trace-time
    env read inside jit is frozen by the trace cache under
    variant=None, so whichever trace ran first would silently pin the
    kernel for every later same-shape caller (r5 code review — the
    first A/B of v2 measured v1 against v1 this way)."""
    import os
    if variant is None:
        variant = os.environ.get("ISC_ATT_KERNEL", "v1")
    return _beam_content_attention(h, p_cont, att, p_att, B=B,
                                   tile_b=tile_b, interpret=interpret,
                                   variant=variant)


@functools.partial(jax.jit,
                   static_argnames=("B", "tile_b", "interpret", "variant"))
def _beam_content_attention(h, p_cont, att, p_att, *, B: int,
                            tile_b: int, interpret: bool, variant: str):
    bs = att.shape[0]
    assert h.shape[0] == bs * B and bs % tile_b == 0, (h.shape, bs, B)
    N, Fe = att.shape[1], att.shape[2]
    Ah = p_att.shape[2]
    w = p_cont["h2att"]["w"]
    b = p_cont["h2att"]["b"].reshape(1, -1)
    aw = p_cont["att_alpha"]["w"]

    kern = functools.partial(_KERNELS[variant], B=B, TB=tile_b)
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
