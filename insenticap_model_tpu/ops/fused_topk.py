"""Pallas kernel: fused vocabulary projection + log-softmax + token bans +
exact top-k, streamed over vocab tiles.

The beam decode step's vocab-wide tail (classifier matmul -> log_softmax ->
PAD/SOS/UNK + last-word bans -> top-k, reference captioner.py:183,394-408)
costs ~200 MB of HBM traffic per step at serving shapes when done as
separate XLA ops: the [rows, V] logits round-trip HBM 4-6 times. This
kernel streams W in [512, TILE_V] tiles through VMEM, keeps a running
log-sum-exp (flash-softmax style) and a running exact top-k per row in
scratch, and writes only [rows, k] outputs — the logits never touch HBM.

Semantics match the XLA path bit-for-acceptable-epsilon:
  * normalizer (lse) is over ALL logits — the reference bans AFTER
    log_softmax (captioner.py:394-399), so banned tokens still normalize;
  * bans: static token ids + per-row dynamic last-word id;
  * ties resolve to the lowest index (argmax convention), matching
    lax.top_k / the iterative-argmax fallback.

Grid iterates vocab tiles innermost; TPU grids execute sequentially, so
VMEM scratch carries the running state across tiles of a row block.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _merge_topk(run_v, run_i, cand_v, cand_i, k: int):
    """Merge two [R, k] descending-sorted candidate sets into top-k.
    Ties prefer the lower index (stable with argmax convention)."""
    vals = jnp.concatenate([run_v, cand_v], axis=1)    # [R, 2k]
    idxs = jnp.concatenate([run_i, cand_i], axis=1)
    out_v, out_i = [], []
    for _ in range(k):
        # argmax with lowest-index-on-tie over the value list; tie-break on
        # token index via a tiny lexicographic nudge is avoided — instead
        # pick by (val, -token_idx) packed comparison on separate passes
        best = jnp.max(vals, axis=1, keepdims=True)              # [R,1]
        is_best = vals == best
        # among positions with the best value, take the smallest token idx
        big = jnp.where(is_best, idxs, jnp.int32(2**30))
        tok = jnp.min(big, axis=1, keepdims=True)                # [R,1]
        out_v.append(best)
        out_i.append(tok)
        taken = is_best & (idxs == tok)
        # remove exactly the taken slot(s) — same token can't appear twice
        vals = jnp.where(taken, NEG_INF, vals)
    return (jnp.concatenate(out_v, axis=1),
            jnp.concatenate(out_i, axis=1))


def _kernel(h_ref, w_ref, b_ref, last_ref, out_v_ref, out_i_ref,
            m_scr, s_scr, tv_scr, ti_scr, *, k: int, banned: Tuple[int, ...],
            tile_v: int, num_v_tiles: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        s_scr[:] = jnp.zeros_like(s_scr)
        tv_scr[:] = jnp.full_like(tv_scr, NEG_INF)
        ti_scr[:] = jnp.zeros_like(ti_scr)

    h = h_ref[:]                                       # [R, H]
    w = w_ref[:]                                       # [H, TILE_V]
    logits = jnp.dot(h, w, preferred_element_type=jnp.float32) \
        + b_ref[:].astype(jnp.float32)                 # [R, TILE_V]

    # running log-sum-exp over the un-banned logits
    m_old = m_scr[:]                                   # [R, 1]
    tile_max = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_old, tile_max)
    s_scr[:] = (s_scr[:] * jnp.exp(m_old - m_new)
                + jnp.sum(jnp.exp(logits - m_new), axis=1, keepdims=True))
    m_scr[:] = m_new

    # bans for the top-k candidates only
    col = (j * tile_v
           + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1))
    ban = jnp.zeros(logits.shape, jnp.bool_)
    for tok in banned:
        ban = ban | (col == tok)
    ban = ban | (col == last_ref[:])                   # [R,1] broadcast
    masked = jnp.where(ban, NEG_INF, logits)

    # tile-local top-k by k argmax passes (small k)
    cand_v, cand_i = [], []
    work = masked
    for _ in range(k):
        v = jnp.max(work, axis=1, keepdims=True)
        is_v = work == v
        big = jnp.where(is_v, col, jnp.int32(2**30))
        idx = jnp.min(big, axis=1, keepdims=True)
        cand_v.append(v)
        cand_i.append(idx)
        work = jnp.where(is_v & (col == idx), NEG_INF, work)
    cand_v = jnp.concatenate(cand_v, axis=1)
    cand_i = jnp.concatenate(cand_i, axis=1)

    tv, ti = _merge_topk(tv_scr[:], ti_scr[:], cand_v, cand_i, k)
    tv_scr[:] = tv
    ti_scr[:] = ti

    @pl.when(j == num_v_tiles - 1)
    def _():
        lse = m_scr[:] + jnp.log(s_scr[:])
        out_v_ref[:] = tv_scr[:] - lse                 # logprobs of top-k
        out_i_ref[:] = ti_scr[:]


@functools.partial(jax.jit, static_argnames=("k", "banned", "tile_r",
                                             "tile_v", "interpret"))
def classifier_topk(h, w, b, last_ids, *, k: int = 3,
                    banned: Tuple[int, ...] = (), tile_r: int = 128,
                    tile_v: int = 512, interpret: bool = False):
    """h [rows, H] x w [H, V] + b [V] -> (logprobs [rows, k] f32,
    idx [rows, k] i32): top-k of log_softmax(h@w+b) with `banned` token ids
    and each row's `last_ids` token excluded from the candidates (but not
    from the normalizer). rows must be a multiple of tile_r and V of tile_v
    (pad rows with anything; V is the padded vocab)."""
    rows, H = h.shape
    V = w.shape[1]
    assert rows % tile_r == 0 and V % tile_v == 0, (rows, V)
    num_v = V // tile_v
    grid = (rows // tile_r, num_v)
    kern = functools.partial(_kernel, k=k, banned=tuple(banned),
                             tile_v=tile_v, num_v_tiles=num_v)
    out_v, out_i = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, H), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, tile_v), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_r, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, k), jnp.float32),
            jax.ShapeDtypeStruct((rows, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_r, 1), jnp.float32),   # running max
            pltpu.VMEM((tile_r, 1), jnp.float32),   # running sum
            pltpu.VMEM((tile_r, k), jnp.float32),   # top vals
            pltpu.VMEM((tile_r, k), jnp.int32),     # top idxs
        ],
        interpret=interpret,
    )(h, w, b.reshape(1, V), last_ids.reshape(rows, 1).astype(jnp.int32))
    return out_v, out_i
