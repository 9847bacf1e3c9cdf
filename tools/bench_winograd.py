"""Micro-bench: direct conv vs Winograd variants at detector shapes.

Production shapes: conv1 [384,14,14,2048]->1024, conv2 ->512 (SAME, s=1).
Run on the default (TPU) env:  python tools/bench_winograd.py [bs]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from insenticap_model_tpu.ops import winograd as wg  # noqa: E402
from insenticap_model_tpu.ops import winograd_pallas as wgp  # noqa: E402


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def bench(fn, *args, iters=30):
    sync(fn(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    g = np.random.default_rng(0)
    for (cin, cout) in [(2048, 1024), (1024, 512)]:
        x = jnp.asarray(g.normal(size=(bs, 14, 14, cin)), dtype)
        w = jnp.asarray(g.normal(size=(3, 3, cin, cout)), dtype) * 0.02
        b = jnp.asarray(g.normal(size=(cout,)), dtype)

        def _direct(x, w, b):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

        direct = jax.jit(_direct)
        wino = jax.jit(wg.conv3x3_winograd)
        # time scalar-returning variants: fetching the full [bs,14,14,K]
        # output through the tunnel (~46 MB/s) would swamp the timer
        direct_s = jax.jit(lambda x, w, b: _direct(x, w, b)
                           .astype(jnp.float32).sum())
        wino_s = jax.jit(lambda x, w, b: wg.conv3x3_winograd(x, w, b)
                         .astype(jnp.float32).sum())
        pallas_s = jax.jit(lambda x, w, b: wgp.conv3x3_winograd_nhwc(x, w, b)
                           .astype(jnp.float32).sum())
        # spatial-major variant without the entry/exit transposes (the
        # detector chains two convs in this layout)
        xsm = x.transpose(1, 2, 0, 3)
        pallas_sm_s = jax.jit(
            lambda x, w, b: wgp.conv3x3_winograd_sm(x, w, b)
            .astype(jnp.float32).sum())
        t_d = bench(direct_s, x, w, b)
        t_w = bench(wino_s, x, w, b)
        t_p = bench(pallas_s, x, w, b)
        t_psm = bench(pallas_sm_s, xsm, w, b)
        print(f"[{cin}->{cout}] direct: {t_d:.2f} ms   xla-wino: {t_w:.2f} ms"
              f"   pallas: {t_p:.2f} ms   pallas-sm: {t_psm:.2f} ms")
        rd = np.asarray(direct(x, w, b), np.float32)
        rw = np.asarray(wino(x, w, b), np.float32)
        rp = np.asarray(wgp.conv3x3_winograd_nhwc(x, w, b), np.float32)
        print(f"    max abs diff xla {np.abs(rd - rw).max():.4f} "
              f"pallas {np.abs(rd - rp).max():.4f} "
              f"(scale {np.abs(rd).max():.2f})")


if __name__ == "__main__":
    main()
