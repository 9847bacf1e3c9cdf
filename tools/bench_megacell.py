"""Decode-cell mega-kernel feasibility measurement (VERDICT r2 next #3,
DESIGN.md lead #1).

The proposed kernel fuses attention + both LSTM cells into one pallas
call. Its structural constraint: the beam-shared attention needs a
per-image-tile grid (att/p_att tiles in VMEM), which forces the LSTM
matmuls to run at M = tile_b*beam rows per grid step instead of the
全-batch M = bs*beam rows XLA uses. The whole design therefore stands or
falls on one question — what does an [M=24..96] x [1536, 2048] matmul
cost on the MXU, tiled under a pallas grid with resident weights, vs
XLA's single [1152, 1536] x [1536, 2048]?

This script measures exactly that (att_lstm and lang_lstm shapes at
production serving config: bs=384, beam=3, H=512), plus the VMEM budget
arithmetic for the candidate tile sizes. Run on the default (TPU) env:

    python tools/bench_megacell.py
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

BS, B, H = 384, 3, 512
ROWS = BS * B                    # 1152


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


SCAN_ITERS = 64


def bench_scanned(mm_fn, x, w, iters=SCAN_ITERS, reps=10):
    """Time `iters` chained matmuls INSIDE one jitted lax.scan (the
    profile_serving methodology): per-call dispatch through this
    environment's tunnel costs ~1.3 ms regardless of work, which swamps a
    sub-ms matmul if timed call-by-call. The scan carries a data
    dependence (y folds back into x) so steps cannot be elided."""
    K = x.shape[1]

    @jax.jit
    def run(x0):
        def body(c, _):
            y = mm_fn(c, w)
            c = c + 0.001 * y[:, :K].astype(c.dtype)
            return c, ()
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out.astype(jnp.float32).sum()

    sync(run(x))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(x)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best / iters * 1e3


def _mm_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def pallas_tiled_mm(x, w, tile_rows: int):
    """x [ROWS, K] @ w [K, N] with a grid over row tiles; the weight
    block's index_map is constant, so Mosaic keeps it resident across
    grid steps (fetched once per call) — the weight traffic is NOT the
    cost being measured, the M-dim MXU utilization is."""
    rows, K = x.shape
    N = w.shape[1]
    return pl.pallas_call(
        _mm_kernel,
        grid=(rows // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, N), x.dtype),
    )(x, w)


def main():
    g = np.random.default_rng(0)
    dt = jnp.bfloat16
    print(f"serving config: bs={BS} beam={B} rows={ROWS}")
    for name, K, N in (("att_lstm", H + 2 * H, 4 * H),   # 1536 -> 2048
                       ("lang_lstm", 2 * H, 4 * H)):     # 1024 -> 2048
        x = jnp.asarray(g.normal(size=(ROWS, K)) * 0.02, dt)
        w = jnp.asarray(g.normal(size=(K, N)) * 0.02, dt)

        def xla_mm(a, b):
            return jnp.dot(a, b,
                           preferred_element_type=jnp.float32).astype(dt)

        t_xla = bench_scanned(xla_mm, x, w)
        line = [f"{name}: XLA [{ROWS}x{K}]@[{K}x{N}] {t_xla:.4f} ms/step"]
        for tile_b in (8, 16, 32):
            tr = tile_b * B
            if ROWS % tr:
                continue
            t_p = bench_scanned(
                functools.partial(pallas_tiled_mm, tile_rows=tr), x, w)
            line.append(f"pallas tile_rows={tr}: {t_p:.4f} ms/step "
                        f"({t_p / t_xla:.2f}x)")
        print("\n  ".join(line), flush=True)

    # VMEM budget for the candidate mega-cell tile (bf16 bytes)
    att_hid = 512
    N_reg = 196
    for tile_b in (4, 8, 16):
        att = tile_b * N_reg * 512 * 2
        p_att = tile_b * N_reg * att_hid * 2
        w_att = (H + 2 * H) * 4 * H * 2
        w_lang = (2 * H) * 4 * H * 2
        total = (att + p_att + w_att + w_lang) / 2**20
        print(f"VMEM @tile_b={tile_b}: att+p_att "
              f"{(att + p_att) / 2**20:.1f} MiB + LSTM weights "
              f"{(w_att + w_lang) / 2**20:.1f} MiB = {total:.1f} MiB "
              f"(v5e scoped VMEM = 16 MiB; excludes intermediates, "
              f"senti/fuse params, classifier)")


if __name__ == "__main__":
    main()
