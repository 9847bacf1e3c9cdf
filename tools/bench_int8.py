"""Int8 feasibility measurements for the two remaining serving stages
(DESIGN.md round-3 profile): the sentiment-detector convs (GEMM-bound
bf16 — v5e's MXU runs int8 at 2x bf16 peak) and the decode attention's
att/p_att HBM re-read (154 MB/step bf16 — int8 storage halves it).

Primitive-level only: answers "does the lowering reach the int8 MXU /
does the int8 VMEM load dequantize cheaply" before any integration.
Methodology per CLAUDE.md: ops timed inside one jitted lax.scan to
amortize the ~1.3 ms/call tunnel dispatch floor; sync on a scalar.

    python tools/bench_int8.py [detector|stack|attention|both]
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

BS = 384


def sync(x):
    np.asarray(x)


def bench_scanned(step_fn, x0, iters=32, reps=8):
    """Time `iters` chained applications of step_fn inside one jit; the
    carry folds the output back so steps cannot be elided."""
    @jax.jit
    def run(x):
        def body(c, _):
            return step_fn(c), ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32).sum(), out)

    sync(jax.tree_util.tree_leaves(run(x0))[0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(x0)
        sync(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best / iters * 1e3


# ---------------------------------------------------------------- detector

def detector():
    """Detector conv1 [384,14,14,2048]->1024, 3x3 SAME — the bf16 direct
    conv measured 15.6 ms (MXU peak, DESIGN.md round-2b). Can int8 reach
    ~2x via the MXU's 394 TOPS int8 path?"""
    g = np.random.default_rng(0)
    H = W = 14
    Cin, Cout = 2048, 1024
    x_f = g.normal(size=(BS, H, W, Cin)).astype(np.float32)
    w_f = (g.normal(size=(3, 3, Cin, Cout)) * 0.02).astype(np.float32)
    x8 = jnp.asarray(np.clip(np.round(x_f * 40), -127, 127), jnp.int8)
    w8 = jnp.asarray(np.clip(np.round(w_f * 1000), -127, 127), jnp.int8)
    xb = jnp.asarray(x_f, jnp.bfloat16)
    wb = jnp.asarray(w_f, jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(
        x_f.shape, w_f.shape, ("NHWC", "HWIO", "NHWC"))

    def conv_bf16(x):
        y = jax.lax.conv_general_dilated(
            x, wb, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        # fold back to keep the scan chained (channel slice to Cin width)
        return (x + 1e-3 * jnp.concatenate([y, y], -1).astype(x.dtype))

    t = bench_scanned(conv_bf16, xb, iters=8, reps=4)
    print(f"conv1 direct bf16: {t:.2f} ms", flush=True)

    def conv_int8(x):
        y = jax.lax.conv_general_dilated(
            x, w8, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        # requantize to int8 for the chained carry (shift approximates a
        # scale; the cost shape matches a real int8 stack's requantize)
        return jnp.clip(y[..., :Cin // 2] >> 8, -127, 127).astype(
            jnp.int8).repeat(2, axis=-1)

    try:
        t8 = bench_scanned(conv_int8, x8, iters=8, reps=4)
        print(f"conv1 direct int8 (s8xs8->s32): {t8:.2f} ms "
              f"({t / t8:.2f}x vs bf16)", flush=True)
    except Exception as e:
        print(f"conv1 direct int8 FAILED: {type(e).__name__}: {e}",
              flush=True)

    # 9-tap dot decomposition: conv as 9 shifted [BS*196, Cin]@[Cin, Cout]
    # int8 matmuls (the form guaranteed to hit the MXU int8 path)
    rows = BS * H * W
    x8r = x8.reshape(rows, Cin)
    w8c = w8.reshape(9, Cin, Cout)

    def taps_int8(x):
        acc = jnp.zeros((rows, Cout), jnp.int32)
        for k in range(9):
            acc = acc + jax.lax.dot_general(
                x, w8c[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        return jnp.clip(acc[:, :Cin // 2] >> 8, -127, 127).astype(
            jnp.int8).repeat(2, axis=-1)

    try:
        t9 = bench_scanned(taps_int8, x8r, iters=8, reps=4)
        print(f"conv1 9-tap int8 matmul (no shifts, MXU ceiling probe): "
              f"{t9:.2f} ms ({t / t9:.2f}x vs bf16)", flush=True)
    except Exception as e:
        print(f"conv1 9-tap int8 FAILED: {type(e).__name__}: {e}",
              flush=True)

    def taps_bf16(x):
        acc = jnp.zeros((rows, Cout), jnp.float32)
        wbc = wb.reshape(9, Cin, Cout)
        for k in range(9):
            acc = acc + jax.lax.dot_general(
                x, wbc[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return (x + 1e-3 * acc.repeat(2, axis=-1).astype(x.dtype))

    tb9 = bench_scanned(taps_bf16, xb.reshape(rows, Cin), iters=8, reps=4)
    print(f"conv1 9-tap bf16 matmul (control): {tb9:.2f} ms", flush=True)


def stack():
    """The decisive A/B: the shipped f5 Winograd pallas stack (bf16,
    exact) vs a FULL int8 two-conv XLA stack (dynamic per-batch
    activation scale, per-output-channel weight scales, s32 accum,
    requantize between convs) at production detector shapes
    [384,14,14,2048]->1024->512. The int8 stack includes everything a
    real deployment pays: the input absmax pass, the inter-conv
    requantize, and the final dequant(+bias)."""
    from insenticap_model_tpu.ops.winograd_pallas import conv3x3_stack_sm

    g = np.random.default_rng(0)
    H = W = 14
    C0, C1, C2 = 2048, 1024, 512
    x_f = (np.abs(g.normal(size=(BS, H, W, C0))) * 0.5).astype(np.float32)
    w1 = (g.normal(size=(3, 3, C0, C1)) * 0.02).astype(np.float32)
    b1 = (g.normal(size=(C1,)) * 0.01).astype(np.float32)
    w2 = (g.normal(size=(3, 3, C1, C2)) * 0.02).astype(np.float32)
    b2 = (g.normal(size=(C2,)) * 0.01).astype(np.float32)
    dn = jax.lax.conv_dimension_numbers(
        (BS, H, W, C0), (3, 3, C0, C1), ("NHWC", "HWIO", "NHWC"))

    xb = jnp.asarray(x_f, jnp.bfloat16)
    layers = [(jnp.asarray(w1, jnp.bfloat16), jnp.asarray(b1, jnp.bfloat16)),
              (jnp.asarray(w2, jnp.bfloat16), jnp.asarray(b2, jnp.bfloat16))]

    def f5_stack(x):
        y = conv3x3_stack_sm(x.transpose(1, 2, 0, 3), layers, variant="f5")
        y = y.transpose(2, 0, 1, 3)                    # back to NHWC
        return (x + 1e-3 * jnp.concatenate([y] * 4, -1).astype(x.dtype))

    t_f5 = bench_scanned(f5_stack, xb, iters=8, reps=4)
    print(f"stack f5 winograd pallas bf16 (shipped): {t_f5:.2f} ms",
          flush=True)

    # per-output-channel weight quantization (host, once)
    def qw(w):
        s = np.abs(w).max(axis=(0, 1, 2)) / 127.0 + 1e-12   # [Cout]
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(s.astype(np.float32))

    w1q, w1s = qw(w1)
    w2q, w2s = qw(w2)
    b1j, b2j = jnp.asarray(b1), jnp.asarray(b2)

    def int8_stack(x):
        # dynamic per-batch activation scale (one absmax pass)
        s_x = jnp.abs(x).max().astype(jnp.float32) / 127.0 + 1e-12
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                      -127, 127).astype(jnp.int8)
        a1 = jax.lax.conv_general_dilated(
            xq, w1q, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y1 = a1.astype(jnp.float32) * (s_x * w1s) + b1j     # [.,.,.,C1] f32
        s_1 = jnp.abs(y1).max() / 127.0 + 1e-12
        y1q = jnp.clip(jnp.round(y1 / s_1), -127, 127).astype(jnp.int8)
        a2 = jax.lax.conv_general_dilated(
            y1q, w2q, (1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                (BS, H, W, C1), (3, 3, C1, C2), ("NHWC", "HWIO", "NHWC")),
            preferred_element_type=jnp.int32)
        y2 = (a2.astype(jnp.float32) * (s_1 * w2s) + b2j).astype(x.dtype)
        return (x + 1e-3 * jnp.concatenate([y2] * 4, -1).astype(x.dtype))

    try:
        t_i8 = bench_scanned(int8_stack, xb, iters=8, reps=4)
        print(f"stack int8 direct XLA (dyn act scale): {t_i8:.2f} ms "
              f"({t_f5 / t_i8:.2f}x vs f5)", flush=True)
    except Exception as e:
        print(f"int8 stack FAILED: {type(e).__name__}: {e}", flush=True)
        return

    # numerics: int8 stack vs f32 direct reference
    xf = jnp.asarray(x_f)
    ref = jax.lax.conv_general_dilated(
        xf, jnp.asarray(w1), (1, 1), "SAME", dimension_numbers=dn) + b1j
    ref = jax.lax.conv_general_dilated(
        ref, jnp.asarray(w2), (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            (BS, H, W, C1), (3, 3, C1, C2),
            ("NHWC", "HWIO", "NHWC"))) + b2j

    def int8_fwd(x):
        s_x = jnp.abs(x).max().astype(jnp.float32) / 127.0 + 1e-12
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                      -127, 127).astype(jnp.int8)
        a1 = jax.lax.conv_general_dilated(
            xq, w1q, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y1 = a1.astype(jnp.float32) * (s_x * w1s) + b1j
        s_1 = jnp.abs(y1).max() / 127.0 + 1e-12
        y1q = jnp.clip(jnp.round(y1 / s_1), -127, 127).astype(jnp.int8)
        a2 = jax.lax.conv_general_dilated(
            y1q, w2q, (1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                (BS, H, W, C1), (3, 3, C1, C2), ("NHWC", "HWIO", "NHWC")),
            preferred_element_type=jnp.int32)
        return a2.astype(jnp.float32) * (s_1 * w2s) + b2j

    got = np.asarray(jax.jit(int8_fwd)(xf))
    refn = np.asarray(ref)
    err = np.abs(got - refn)
    print(f"int8 stack |err| mean {err.mean():.5f} max {err.max():.4f} "
          f"(mean |ref| {np.abs(refn).mean():.4f}, rel "
          f"{err.mean() / (np.abs(refn).mean() + 1e-9):.4%})", flush=True)


# --------------------------------------------------------------- attention

def attention():
    """The shipped beam-shared attention kernel (bf16 att/p_att in HBM)
    vs an int8-storage variant that dequantizes per-image-per-channel in
    VMEM. Shapes: bs=384, N=196, Fe=Ah=512, beam=3."""
    from insenticap_model_tpu.ops.fused_attention import (
        beam_content_attention)

    g = np.random.default_rng(0)
    B, N, Fe, Ah, Hd = 3, 196, 512, 512, 512
    att_f = g.normal(size=(BS, N, Fe)).astype(np.float32)
    patt_f = g.normal(size=(BS, N, Ah)).astype(np.float32)
    att = jnp.asarray(att_f, jnp.bfloat16)
    patt = jnp.asarray(patt_f, jnp.bfloat16)
    h0 = jnp.asarray(g.normal(size=(BS * B, Hd)) * 0.1, jnp.bfloat16)
    p_cont = {
        "h2att": {"w": jnp.asarray(g.normal(size=(Hd, Ah)) * 0.05,
                                   jnp.bfloat16),
                  "b": jnp.asarray(np.zeros(Ah), jnp.bfloat16)},
        "att_alpha": {"w": jnp.asarray(g.normal(size=(Ah, 1)) * 0.05,
                                       jnp.bfloat16)},
    }

    def step_bf16(h):
        res = beam_content_attention(h, p_cont, att, patt, B=B)
        return (h + 0.001 * res[:, :Hd].astype(h.dtype))

    t = bench_scanned(step_bf16, h0, iters=16, reps=8)
    print(f"beam attention bf16 storage: {t:.3f} ms/step", flush=True)

    # int8 storage with per-(image, channel) absmax scales
    def quant(x_f):
        s = np.abs(x_f).max(axis=1, keepdims=True) / 127.0 + 1e-12
        q = np.clip(np.round(x_f / s), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(s.astype(np.float32))

    att_q, att_s = quant(att_f)
    patt_q, patt_s = quant(patt_f)


    def _kernel_i8(h_ref, pattq_ref, patts_ref, attq_ref, atts_ref,
                   w_ref, b_ref, aw_ref, out_ref, *, B, TB):
        q = jnp.dot(h_ref[:], w_ref[:],
                    preferred_element_type=jnp.float32) \
            + b_ref[:].astype(jnp.float32)
        patt = pattq_ref[:].astype(jnp.float32) * patts_ref[:]
        attf = attq_ref[:].astype(jnp.float32) * atts_ref[:]
        aw = aw_ref[:].astype(jnp.float32)
        TBB, Ah_ = q.shape
        q3 = q.reshape(TB, B, Ah_)
        aw_row = aw.reshape(1, 1, Ah_)
        for k in range(B):
            qk = q3[:, k:k + 1, :]
            tk = jnp.tanh(patt + qk)
            e = jnp.sum(tk * aw_row, axis=-1)
            wgt = jax.nn.softmax(e, axis=-1)
            res = jnp.sum(wgt[:, :, None] * attf, axis=1)
            out_ref[:, k, :] = res.astype(out_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("B", "tile_b"))
    def beam_attention_i8(h, attq, atts, pattq, patts, *, B, tile_b=8):
        bs = attq.shape[0]
        w = p_cont["h2att"]["w"]
        b = p_cont["h2att"]["b"].reshape(1, -1)
        aw = p_cont["att_alpha"]["w"]
        kern = functools.partial(_kernel_i8, B=B, TB=tile_b)
        out = pl.pallas_call(
            kern,
            grid=(bs // tile_b,),
            in_specs=[
                pl.BlockSpec((tile_b * B, h.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, N, Ah), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, 1, Ah), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, N, Fe), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, 1, Fe), lambda i: (i, 0, 0),
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
            out_shape=jax.ShapeDtypeStruct((bs, B, Fe), jnp.bfloat16),
            )(h, pattq, patts, attq, atts, w, b, aw)
        return out.reshape(bs * B, Fe)

    def step_i8(h):
        res = beam_attention_i8(h, att_q, att_s, patt_q, patt_s, B=B)
        return (h + 0.001 * res[:, :Hd].astype(h.dtype))

    try:
        t8 = bench_scanned(step_i8, h0, iters=16, reps=8)
        print(f"beam attention int8 storage: {t8:.3f} ms/step "
              f"({t / t8:.2f}x)", flush=True)
        # numerics: context error vs the f32 ideal
        ref = beam_content_attention(h0, p_cont, att, patt, B=B)
        got = beam_attention_i8(h0, att_q, att_s, patt_q, patt_s, B=B)
        err = np.abs(np.asarray(got, np.float32)
                     - np.asarray(ref, np.float32))
        den = np.abs(np.asarray(ref, np.float32)).mean() + 1e-9
        print(f"context |err| mean {err.mean():.5f} max {err.max():.4f} "
              f"(rel-to-mean-|ref| {err.mean() / den:.4%})", flush=True)
    except Exception as e:
        print(f"int8 attention FAILED: {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which not in ("detector", "stack", "attention", "both"):
        raise SystemExit(
            f"unknown mode {which!r}: "
            "usage: bench_int8.py [detector|stack|attention|both]")
    if which in ("detector", "both"):
        detector()
    if which in ("stack", "both"):
        stack()
    if which in ("attention", "both"):
        attention()
