"""NN substrate parity tests against torch (CPU torch is available and is
the ground truth for layer semantics — weight layouts must convert 1:1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from insenticap_model_tpu import nn


def test_linear_matches_torch(rng):
    tl = torch.nn.Linear(8, 5)
    p = {"w": jnp.asarray(tl.weight.detach().numpy().T),
         "b": jnp.asarray(tl.bias.detach().numpy())}
    x = np.random.default_rng(0).normal(size=(3, 8)).astype(np.float32)
    ours = nn.linear(p, jnp.asarray(x))
    theirs = tl(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_lstm_cell_matches_torch(rng):
    tc = torch.nn.LSTMCell(6, 4)
    p = {"w_ih": jnp.asarray(tc.weight_ih.detach().numpy().T),
         "w_hh": jnp.asarray(tc.weight_hh.detach().numpy().T),
         "b_ih": jnp.asarray(tc.bias_ih.detach().numpy()),
         "b_hh": jnp.asarray(tc.bias_hh.detach().numpy())}
    g = np.random.default_rng(1)
    x = g.normal(size=(2, 6)).astype(np.float32)
    h = g.normal(size=(2, 4)).astype(np.float32)
    c = g.normal(size=(2, 4)).astype(np.float32)
    h2, c2 = nn.lstm_cell(p, jnp.asarray(x), (jnp.asarray(h), jnp.asarray(c)))
    th, tcell = tc(torch.from_numpy(x), (torch.from_numpy(h),
                                         torch.from_numpy(c)))
    np.testing.assert_allclose(np.asarray(h2), th.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), tcell.detach().numpy(),
                               atol=1e-5)


def test_embedding_pad_row_zero_and_no_grad(rng):
    p = nn.embedding_init(rng, 10, 4, pad_id=0)
    ids = jnp.array([0, 3, 0, 5])
    out = nn.embed(p, ids, pad_id=0)
    assert np.allclose(np.asarray(out[0]), 0) and np.allclose(
        np.asarray(out[2]), 0)

    def loss(table):
        return nn.embed({"table": table}, ids, pad_id=0).sum()

    g = jax.grad(loss)(p["table"])
    assert np.allclose(np.asarray(g[0]), 0.0)  # padding_idx semantics
    assert not np.allclose(np.asarray(g[3]), 0.0)


def test_conv2d_matches_torch():
    tconv = torch.nn.Conv2d(3, 5, 3, stride=2, padding=1)
    p = {"w": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0)),
         "b": jnp.asarray(tconv.bias.detach().numpy())}
    x = np.random.default_rng(2).normal(size=(2, 9, 9, 3)).astype(np.float32)
    ours = nn.conv2d(p, jnp.asarray(x), stride=2, padding=((1, 1), (1, 1)))
    theirs = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    theirs = theirs.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_dropout_scaling(rng):
    x = jnp.ones((1000,))
    y = nn.dropout(rng, x, 0.5, deterministic=False)
    kept = np.asarray(y) > 0
    assert 0.4 < kept.mean() < 0.6
    np.testing.assert_allclose(np.asarray(y)[kept], 2.0)  # 1/(1-p) scaling
    assert np.all(np.asarray(nn.dropout(rng, x, 0.5, True)) == 1.0)


@pytest.mark.parametrize("in_size,out_size", [(14, 14), (28, 14), (17, 14),
                                              (7, 14), (30, 7)])
def test_adaptive_avg_pool_matches_torch(in_size, out_size):
    from insenticap_model_tpu.ops.adaptive_pool import adaptive_avg_pool2d
    x = np.random.default_rng(3).normal(
        size=(2, in_size, in_size, 4)).astype(np.float32)
    ours = adaptive_avg_pool2d(jnp.asarray(x), (out_size, out_size))
    theirs = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), [out_size, out_size])
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_policy_casts_roundtrip_same_leaves():
    """utils/dtypes.cast_bf16 and cast_f32 are the ONE definition of the
    serving cast (train_rl --rl_detector_dtype, serve.py, bench tools):
    both touch exactly the float leaves and leave int/bool leaves alone,
    so a round trip restores the original dtypes."""
    import jax.numpy as jnp
    import numpy as np

    from insenticap_model_tpu.utils.dtypes import cast_bf16, cast_f32

    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "b16": jnp.ones((3,), jnp.bfloat16),
            "ids": jnp.arange(4, dtype=jnp.int32),
            "flag": jnp.asarray([True, False]),
            "nested": [{"v": np.ones((2,), np.float32)}]}
    down = cast_bf16(tree)
    assert down["w"].dtype == jnp.bfloat16
    assert down["b16"].dtype == jnp.bfloat16
    assert down["ids"].dtype == jnp.int32
    assert down["flag"].dtype == jnp.bool_
    assert down["nested"][0]["v"].dtype == jnp.bfloat16
    up = cast_f32(down)
    assert up["w"].dtype == jnp.float32
    assert up["b16"].dtype == jnp.float32      # policy: ALL floats -> f32
    assert up["ids"].dtype == jnp.int32
    assert up["flag"].dtype == jnp.bool_
