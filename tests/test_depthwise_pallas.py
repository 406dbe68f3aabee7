"""Hybrid depthwise conv (XLA fwd/dgrad + Pallas wgrad) vs plain autodiff
of the XLA conv — the two must be the same function with the same VJP.

Reference semantics: the depthwise half of SeprationConv
(``/root/reference/models/QuartNetContext.py:8-29``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightning_asr_tpu.ops.depthwise_pallas import (
    _dw_conv, depthwise_conv1d, set_depthwise_wgrad_pallas)


def make(B, T, C, k, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    wd = (rng.standard_normal((k, C)) / np.sqrt(k)).astype(np.float32)
    dy = rng.standard_normal((B, T, C)).astype(np.float32)
    return (jnp.asarray(x, dtype), jnp.asarray(wd, dtype),
            jnp.asarray(dy, dtype))


def grads(fn, x, wd, dy):
    def scalar(x_, wd_):
        return jnp.sum(fn(x_, wd_).astype(jnp.float32) * dy.astype(jnp.float32))
    return jax.grad(scalar, argnums=(0, 1))(x, wd)


@pytest.mark.parametrize("B,T,C,k", [
    (2, 40, 8, 5),
    (1, 48, 16, 33),
    (3, 32, 24, 7),   # C not a lane multiple (like the 336-ch block)
    (2, 24, 8, 9),
])
def test_fwd_and_grads_match_autodiff_fp32(B, T, C, k):
    x, wd, dy = make(B, T, C, k, jnp.float32)
    hybrid = lambda a, b: depthwise_conv1d(a, b, True)  # interpret mode
    y_h = hybrid(x, wd)
    y_r = _dw_conv(x, wd)
    np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_r),
                               rtol=1e-6, atol=1e-6)
    (gx_h, gw_h) = grads(hybrid, x, wd, dy)
    (gx_r, gw_r) = grads(_dw_conv, x, wd, dy)
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_h), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_grads_match_autodiff_bf16():
    """Under the training dtype policy: bf16 products, fp32 accumulation.
    The Pallas wgrad accumulates in fp32 like XLA's emitter, so agreement
    is to bf16 resolution of the result, not bitwise."""
    x, wd, dy = make(2, 64, 16, 33, jnp.bfloat16, seed=3)
    hybrid = lambda a, b: depthwise_conv1d(a, b, True)
    (gx_h, gw_h) = grads(hybrid, x, wd, dy)
    (gx_r, gw_r) = grads(_dw_conv, x, wd, dy)
    assert gw_h.dtype == gw_r.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(gx_h, np.float32),
                               np.asarray(gx_r, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(gw_h, np.float32),
                               np.asarray(gw_r, np.float32),
                               rtol=2e-2, atol=2e-1)


def test_sepconv_layer_toggle_same_loss_and_grads():
    """SepConv with the hybrid path on vs off: identical params layout,
    same loss and same fp32 gradients (the toggle must be a pure perf
    knob, invisible to checkpoints and numerics)."""
    from lightning_asr_tpu.models.layers import SepConv

    B, T, C = 2, 48, 16
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    pct = jnp.asarray([1.0, 0.6], jnp.float32)
    mod = SepConv(in_ch=C, out_ch=C, k=9, mask=True, drop_rate=0.0)
    variables = mod.init(jax.random.PRNGKey(0), x, pct, False)

    def loss_fn(params):
        y, _ = mod.apply({"params": params,
                          "batch_stats": variables["batch_stats"]},
                         x, pct, True, mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    try:
        set_depthwise_wgrad_pallas(False)
        l0, g0 = jax.value_and_grad(loss_fn)(variables["params"])
        set_depthwise_wgrad_pallas(True)
        variables2 = mod.init(jax.random.PRNGKey(0), x, pct, False)
        assert jax.tree_util.tree_structure(
            variables2["params"]) == jax.tree_util.tree_structure(
            variables["params"])
        l1, g1 = jax.value_and_grad(loss_fn)(variables["params"])
    finally:
        set_depthwise_wgrad_pallas(False)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_stride2_stem_not_routed():
    """The stride-2 stem must stay on nn.Conv even with the toggle on
    (the kernel only implements stride 1)."""
    from lightning_asr_tpu.models.layers import SepConv

    B, T, C = 1, 32, 8
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, C)),
                    jnp.float32)
    pct = jnp.ones((B,), jnp.float32)
    mod = SepConv(in_ch=C, out_ch=C, k=9, stride=2, mask=True, drop_rate=0.0)
    try:
        set_depthwise_wgrad_pallas(True)
        variables = mod.init(jax.random.PRNGKey(0), x, pct, False)
        y = mod.apply(variables, x, pct, False)
    finally:
        set_depthwise_wgrad_pallas(False)
    assert y.shape[1] == T // 2
