"""Pallas LSTM kernel parity vs the scan implementation (itself torch-
verified): outputs and gradients (x, W_hh, W_ih, biases), variable lengths,
both directions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightning_asr_tpu.ops.lstm import LSTMWeights, lstm
from lightning_asr_tpu.ops.lstm_pallas import lstm_pallas


def make_weights(rng, IN, H):
    s = 1.0 / np.sqrt(H)
    return LSTMWeights(
        w_ih=jnp.asarray(rng.uniform(-s, s, (4 * H, IN)).astype(np.float32)),
        w_hh=jnp.asarray(rng.uniform(-s, s, (4 * H, H)).astype(np.float32)),
        b_ih=jnp.asarray(rng.uniform(-s, s, (4 * H,)).astype(np.float32)),
        b_hh=jnp.asarray(rng.uniform(-s, s, (4 * H,)).astype(np.float32)),
    )


@pytest.mark.parametrize("T,lengths", [(40, [40, 25, 1]), (37, [30, 37, 9])])
def test_lstm_pallas_matches_scan(T, lengths):
    rng = np.random.default_rng(0)
    B, IN, H = 3, 16, 8
    x = jnp.asarray(rng.standard_normal((B, T, IN)).astype(np.float32))
    lens = jnp.asarray(np.array(lengths, np.int32))
    fw = make_weights(rng, IN, H)
    bw = make_weights(rng, IN, H)

    ref = np.asarray(lstm(x, lens, fw, bw))
    out = np.asarray(lstm_pallas(x, lens, fw, bw))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_lstm_pallas_grads_match_scan():
    rng = np.random.default_rng(1)
    B, T, IN, H = 2, 32, 12, 8
    x = jnp.asarray(rng.standard_normal((B, T, IN)).astype(np.float32))
    lens = jnp.asarray(np.array([32, 20], np.int32))
    fw = make_weights(rng, IN, H)
    bw = make_weights(rng, IN, H)
    probe = jnp.asarray(rng.standard_normal((B, T, 2 * H)).astype(np.float32))

    def loss(fn, x, fw, bw):
        return jnp.sum(fn(x, lens, fw, bw) * probe)

    g_ref = jax.grad(lambda *a: loss(lstm, *a), argnums=(0, 1, 2))(x, fw, bw)
    g_out = jax.grad(lambda *a: loss(lstm_pallas, *a), argnums=(0, 1, 2))(x, fw, bw)

    for r, o in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_out)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-4, atol=1e-5)


def test_lstm_pallas_unidirectional():
    rng = np.random.default_rng(2)
    B, T, IN, H = 2, 16, 8, 4
    x = jnp.asarray(rng.standard_normal((B, T, IN)).astype(np.float32))
    lens = jnp.asarray(np.array([16, 10], np.int32))
    fw = make_weights(rng, IN, H)
    ref = np.asarray(lstm(x, lens, fw, None))
    out = np.asarray(lstm_pallas(x, lens, fw, None))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("T,lengths", [(40, [40, 25, 1]), (37, [30, 37, 9])])
def test_lstm_pallas_fused_bidir_matches_scan(T, lengths):
    """Batch-stacked direction fusion (2x-batch layout): outputs identical
    to the scan oracle and to the two-kernel path."""
    rng = np.random.default_rng(3)
    B, IN, H = 3, 16, 8
    x = jnp.asarray(rng.standard_normal((B, T, IN)).astype(np.float32))
    lens = jnp.asarray(np.array(lengths, np.int32))
    fw = make_weights(rng, IN, H)
    bw = make_weights(rng, IN, H)

    ref = np.asarray(lstm(x, lens, fw, bw))
    out = np.asarray(lstm_pallas(x, lens, fw, bw, fuse_directions=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_lstm_pallas_fused_bidir_grads_match_scan():
    rng = np.random.default_rng(4)
    B, T, IN, H = 2, 32, 12, 8
    x = jnp.asarray(rng.standard_normal((B, T, IN)).astype(np.float32))
    lens = jnp.asarray(np.array([32, 20], np.int32))
    fw = make_weights(rng, IN, H)
    bw = make_weights(rng, IN, H)
    probe = jnp.asarray(rng.standard_normal((B, T, 2 * H)).astype(np.float32))

    def loss(fn, x, fw, bw, **kw):
        return jnp.sum(fn(x, lens, fw, bw, **kw) * probe)

    g_ref = jax.grad(lambda *a: loss(lstm, *a), argnums=(0, 1, 2))(x, fw, bw)
    g_out = jax.grad(
        lambda *a: loss(lstm_pallas, *a, fuse_directions=True),
        argnums=(0, 1, 2))(x, fw, bw)

    for r, o in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_out)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-4, atol=1e-5)


def test_batch_tiling_matches_untiled(monkeypatch):
    """B above _MAX_B splits into per-kernel batch tiles (the BPTT kernel's
    scoped VMEM blows the 16 MB limit at B=64 on v5e); tiled forward AND
    gradients must equal the untiled computation exactly."""
    import importlib

    lp = importlib.import_module("lightning_asr_tpu.ops.lstm_pallas")

    rng = np.random.default_rng(5)
    B, T, C, H = 6, 20, 16, 8
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 0.3)
    lens = jnp.asarray(np.r_[T, rng.integers(2, T, B - 1)].astype(np.int32))

    def w():
        return LSTMWeights(
            jnp.asarray(rng.standard_normal((4 * H, C)).astype(np.float32) * 0.2),
            jnp.asarray(rng.standard_normal((4 * H, H)).astype(np.float32) * 0.2),
            jnp.asarray(rng.standard_normal(4 * H).astype(np.float32) * 0.1),
            jnp.asarray(rng.standard_normal(4 * H).astype(np.float32) * 0.1),
        )

    fw, bw = w(), w()

    def run(xx):
        return lp.lstm_pallas(xx, lens, fw, bw).sum()

    whole, g_whole = jax.value_and_grad(run)(x)
    monkeypatch.setattr(lp, "_MAX_B", 2)  # force a 3-way split
    tiled, g_tiled = jax.value_and_grad(run)(x)
    np.testing.assert_allclose(float(whole), float(tiled), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_whole), np.asarray(g_tiled), atol=1e-6)
