"""Model zoo: shape/smoke tests (mirroring the reference's ``__main__``
blocks, e.g. ``models/QuartNetContext.py:262-269``) plus numerical parity of
the LSTM and masked BatchNorm primitives against torch."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lightning_asr_tpu.models import build_model
from lightning_asr_tpu.models.layers import MaskedBatchNorm
from lightning_asr_tpu.ops.lstm import LSTMWeights, lstm


def _init_and_run(model, B=2, T=256, F=64, train=False):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, F))
    percents = jnp.array([1.0, 0.7], jnp.float32)[:B]
    variables = model.init({"params": rng, "dropout": rng}, x, percents, train)
    out, lens = model.apply(
        variables, x, percents, train,
        rngs={"dropout": rng} if train else {},
        mutable=["batch_stats"] if train else False,
    )[0] if train else model.apply(variables, x, percents, train)
    return out, lens, variables


@pytest.mark.parametrize("encoder,expect_params_m", [
    ("quartznet12_context", None),
    ("quartznet12_context_se", None),
])
def test_context_model_shapes(encoder, expect_params_m):
    model = build_model(num_classes=29, encoder=encoder, mask=True)
    out, lens, variables = _init_and_run(model, B=2, T=256, F=64)
    assert out.shape == (2, 128, 29)  # stride-2 stem halves T
    # log-softmax rows sum to 1
    np.testing.assert_allclose(np.exp(np.asarray(out[0, 0])).sum(), 1.0, rtol=1e-5)
    # reference length formula: int(T' * percent)
    assert int(lens[0]) == 128 and int(lens[1]) == int(128 * np.float32(0.7))


@pytest.mark.parametrize("encoder", ["quartznet15x5", "quartznet10x5"])
def test_legacy_model_shapes(encoder):
    model = build_model(num_classes=29, encoder=encoder, mask=True)
    out, lens, _ = _init_and_run(model, B=2, T=128, F=64)
    assert out.shape == (2, 64, 29)


def test_ssl_feature_mapping_shapes():
    """SSL path: wav2vec 512-dim features -> feature_mapping -> encoder
    (``train_ssl.py:42,316``)."""
    model = build_model(num_classes=29, feature_in=512, in_c=64, mask=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 128, 512))
    percents = jnp.array([1.0, 0.5])
    variables = model.init(rng, x, percents, False)
    out, lens = model.apply(variables, x, percents, False)
    assert out.shape == (2, 64, 29)


def test_lstm_matches_torch_packed():
    """BiLSTM output must equal torch LSTM over pack_padded_sequence."""
    rng = np.random.default_rng(0)
    B, T, IN, H = 3, 12, 8, 5
    x = rng.standard_normal((B, T, IN)).astype(np.float32)
    lengths = np.array([12, 7, 1], np.int64)

    t_lstm = torch.nn.LSTM(IN, H, batch_first=True, bidirectional=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), lengths=lengths, batch_first=True, enforce_sorted=False
    )
    out_packed, _ = t_lstm(packed)
    golden, _ = torch.nn.utils.rnn.pad_packed_sequence(out_packed, batch_first=True, total_length=T)
    golden = golden.detach().numpy()

    def w(tag):
        return LSTMWeights(
            w_ih=jnp.asarray(getattr(t_lstm, f"weight_ih_l0{tag}").detach().numpy()),
            w_hh=jnp.asarray(getattr(t_lstm, f"weight_hh_l0{tag}").detach().numpy()),
            b_ih=jnp.asarray(getattr(t_lstm, f"bias_ih_l0{tag}").detach().numpy()),
            b_hh=jnp.asarray(getattr(t_lstm, f"bias_hh_l0{tag}").detach().numpy()),
        )

    ours = np.asarray(lstm(jnp.asarray(x), jnp.asarray(lengths), w(""), w("_reverse")))
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)


def test_masked_batchnorm_matches_torch():
    """Train-mode normalization, running-stat updates, and eval mode must
    match torch.nn.BatchNorm1d(eps=1e-3)."""
    rng = np.random.default_rng(1)
    B, C, T = 4, 6, 10
    x = rng.standard_normal((B, T, C)).astype(np.float32) * 3 + 1

    t_bn = torch.nn.BatchNorm1d(C, eps=1e-3)
    t_bn.train()
    tx = torch.from_numpy(np.moveaxis(x, 1, 2).copy())  # (B, C, T)
    golden_train = t_bn(tx).detach().numpy()

    bn = MaskedBatchNorm(C)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    ours_train, new_state = bn.apply(variables, jnp.asarray(x), True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours_train), 1, 2), golden_train, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["mean"]),
        t_bn.running_mean.numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["var"]),
        t_bn.running_var.numpy(), rtol=1e-5, atol=1e-6,
    )

    t_bn.eval()
    golden_eval = t_bn(tx).detach().numpy()
    ours_eval = bn.apply(
        {"params": variables["params"], "batch_stats": new_state["batch_stats"]},
        jnp.asarray(x), False,
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours_eval), 1, 2), golden_eval, rtol=1e-4, atol=1e-5
    )


def test_param_count_in_reference_ballpark():
    """QuartNet12-context has ~9M params (QuartzNet-12x1-scale); catch
    gross architecture mistakes."""
    model = build_model(num_classes=29, mask=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 64, 64)), jnp.ones((1,)), False)
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert 5e6 < n < 20e6, f"param count {n} outside expected range"
