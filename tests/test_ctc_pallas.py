"""Pallas CTC kernel parity vs the scan implementation (itself torch-
verified): values and gradients, variable lengths, repeated labels.
Runs in interpret mode on the CPU mesh; compiled mode on real TPU."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lightning_asr_tpu.ops.ctc import ctc_loss
from lightning_asr_tpu.ops.ctc_pallas import ctc_loss_pallas


def make_batch(rng, B=4, T=64, C=29, L=12):
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    input_lengths = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
    input_lengths[0] = T
    target_lengths = rng.integers(1, L + 1, size=B).astype(np.int32)
    targets = rng.integers(0, C - 1, size=(B, L)).astype(np.int32)
    return log_probs, input_lengths, targets, target_lengths


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_matches_scan(seed):
    rng = np.random.default_rng(seed)
    lp, il, tg, tl = make_batch(rng)
    blank = lp.shape[-1] - 1
    ref = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(il),
                              jnp.asarray(tg), jnp.asarray(tl), blank_id=blank))
    out = np.asarray(ctc_loss_pallas(jnp.asarray(lp), jnp.asarray(il),
                                     jnp.asarray(tg), jnp.asarray(tl), blank_id=blank))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_repeated_labels():
    rng = np.random.default_rng(7)
    B, T, C, L = 3, 48, 10, 8
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    tg = np.tile(np.array([[1, 1, 2, 2, 3, 3, 1, 1]], np.int32), (B, 1))
    tl = np.array([8, 6, 4], np.int32)
    il = np.array([48, 35, 30], np.int32)
    blank = C - 1
    ref = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(il),
                              jnp.asarray(tg), jnp.asarray(tl), blank_id=blank))
    out = np.asarray(ctc_loss_pallas(jnp.asarray(lp), jnp.asarray(il),
                                     jnp.asarray(tg), jnp.asarray(tl), blank_id=blank))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_grad_matches_scan():
    rng = np.random.default_rng(5)
    lp, il, tg, tl = make_batch(rng, B=3, T=32, C=12, L=6)
    blank = lp.shape[-1] - 1

    def loss_scan(x):
        return jnp.mean(ctc_loss(jax.nn.log_softmax(x, -1), jnp.asarray(il),
                                 jnp.asarray(tg), jnp.asarray(tl), blank_id=blank))

    def loss_pallas(x):
        return jnp.mean(ctc_loss_pallas(jax.nn.log_softmax(x, -1), jnp.asarray(il),
                                        jnp.asarray(tg), jnp.asarray(tl), blank_id=blank))

    x = jnp.asarray(rng.standard_normal(lp.shape).astype(np.float32))
    g_ref = np.asarray(jax.grad(loss_scan)(x))
    g_out = np.asarray(jax.grad(loss_pallas)(x))
    np.testing.assert_allclose(g_out, g_ref, rtol=1e-3, atol=1e-5)


def test_pallas_odd_T_padding():
    """T not divisible by the chunk size exercises the CT=1 fallback."""
    rng = np.random.default_rng(9)
    lp, il, tg, tl = make_batch(rng, B=2, T=37, C=8, L=5)
    blank = lp.shape[-1] - 1
    ref = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(il),
                              jnp.asarray(tg), jnp.asarray(tl), blank_id=blank))
    out = np.asarray(ctc_loss_pallas(jnp.asarray(lp), jnp.asarray(il),
                                     jnp.asarray(tg), jnp.asarray(tl), blank_id=blank))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_batch_tiling_matches_untiled(monkeypatch):
    """Oversized B*S_pad lattices are split along batch (the Mosaic AOT
    compile crashes past ~24k on v5e); the tiled result must equal the
    untiled one exactly (per-sample independence)."""
    import lightning_asr_tpu.ops.ctc_pallas as cp

    rng = np.random.default_rng(3)
    B, T, C, L = 8, 48, 12, 10
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32)))
    tl = jnp.asarray(np.r_[T, rng.integers(T // 2, T, B - 1)].astype(np.int32))
    tgt = jnp.asarray(rng.integers(0, C - 1, (B, L)).astype(np.int32))
    tgl = jnp.asarray(np.r_[L, rng.integers(1, L, B - 1)].astype(np.int32))

    def run(lp):
        return cp.ctc_loss_pallas(lp, tl, tgt, tgl, C - 1)

    whole, g_whole = jax.value_and_grad(lambda lp: run(lp).sum())(logp)
    monkeypatch.setattr(cp, "_MAX_B_SPAD", 3 * 128)  # force ~3-way split
    tiled, g_tiled = jax.value_and_grad(lambda lp: run(lp).sum())(logp)
    np.testing.assert_allclose(float(whole), float(tiled), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_whole), np.asarray(g_tiled),
                               atol=1e-6)
