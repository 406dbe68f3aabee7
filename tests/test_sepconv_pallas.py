"""Fused sepconv Pallas kernel vs the XLA composition (fwd + grads)."""

import chex
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightning_asr_tpu.ops.sepconv_pallas import sepconv, sepconv_reference


def make(B, T, Cin, Cout, k, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    wd = (rng.standard_normal((k, Cin)) / np.sqrt(k)).astype(np.float32)
    wp = (rng.standard_normal((Cin, Cout)) / np.sqrt(Cin)).astype(np.float32)
    return jnp.asarray(x, dtype), jnp.asarray(wd), jnp.asarray(wp)


@pytest.mark.parametrize("B,T,Cin,Cout,k", [
    (2, 32, 8, 16, 5),
    (1, 48, 16, 8, 33),
    (3, 40, 8, 8, 7),
])
def test_forward_matches_reference_fp32(B, T, Cin, Cout, k):
    x, wd, wp = make(B, T, Cin, Cout, k, jnp.float32)
    got = sepconv(x, wd, wp, True)
    want = sepconv_reference(x, wd, wp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_matches_flax_conv_composition():
    """Against the exact pair of nn.Conv calls the kernel replaces."""
    import flax.linen as nn

    B, T, Cin, Cout, k = 2, 40, 8, 16, 9
    x, wd, wp = make(B, T, Cin, Cout, k, jnp.float32, seed=1)

    class Pair(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(Cin, (k,), padding=((k // 2, k // 2),),
                        feature_group_count=Cin, use_bias=False,
                        name="dw")(x)
            return nn.Conv(Cout, (1,), use_bias=False, name="pw")(x)

    params = {"dw": {"kernel": np.asarray(wd)[:, None, :]},
              "pw": {"kernel": np.asarray(wp)[None, :, :]}}
    want = Pair().apply({"params": params}, x)
    got = sepconv(x, wd, wp, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [5, 33])
def test_gradients_match_reference(k):
    B, T, Cin, Cout = 2, 36, 8, 8
    x, wd, wp = make(B, T, Cin, Cout, k, jnp.float32, seed=2)
    dy_seed = jnp.asarray(
        np.random.default_rng(3).standard_normal((B, T, Cout)), jnp.float32)

    def loss_pallas(x, wd, wp):
        return jnp.sum(sepconv(x, wd, wp, True) * dy_seed)

    def loss_ref(x, wd, wp):
        return jnp.sum(sepconv_reference(x, wd, wp) * dy_seed)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, wd, wp)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wd, wp)
    for a, b, name in zip(g_p, g_r, ("dx", "dwd", "dwp")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_bf16_policy_close_to_fp32():
    B, T, Cin, Cout, k = 2, 32, 8, 8, 7
    x, wd, wp = make(B, T, Cin, Cout, k, jnp.float32, seed=4)
    ref = np.asarray(sepconv(x, wd, wp, True))
    got = np.asarray(sepconv(x.astype(jnp.bfloat16), wd, wp, True)).astype(np.float32)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.1)


def test_model_parity_flag_on_vs_off():
    """Full flagship forward: fused-sepconv path == XLA path on the SAME
    params (checkpoint-compatible naming)."""
    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.ops.sepconv_pallas import set_sepconv_pallas

    B, T, F = 2, 64, 64
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, F), jnp.float32)
    percents = jnp.asarray([1.0, 0.6], jnp.float32)

    model = build_model(num_classes=29, mask=True)
    set_sepconv_pallas(False)
    try:
        variables = model.init({"params": rng, "dropout": rng}, x, percents, False)
        want, want_lens = model.apply(variables, x, percents, False)
        set_sepconv_pallas(True)
        variables2 = model.init({"params": rng, "dropout": rng}, x, percents, False)
        chex.assert_trees_all_equal_shapes(variables["params"], variables2["params"])
        got, got_lens = model.apply(variables, x, percents, False)
    finally:
        set_sepconv_pallas(False)
    np.testing.assert_array_equal(np.asarray(want_lens), np.asarray(got_lens))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
