"""CTC loss parity vs torch.nn.CTCLoss (blank = last index, reduction='none'),
the exact objective of the reference (``/root/reference/train.py:196,77``)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lightning_asr_tpu.ops.ctc import ctc_loss, ctc_loss_mean


def make_batch(rng, B=4, T=50, C=29, L=12):
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    input_lengths = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
    input_lengths[0] = T
    target_lengths = rng.integers(1, L + 1, size=B).astype(np.int32)
    targets = rng.integers(0, C - 1, size=(B, L)).astype(np.int32)  # no blanks
    return log_probs, input_lengths, targets, target_lengths


def torch_ctc(log_probs, input_lengths, targets, target_lengths, blank):
    lp = torch.from_numpy(log_probs).transpose(0, 1)  # (T, B, C)
    loss = torch.nn.CTCLoss(blank=blank, reduction="none", zero_infinity=False)
    flat_targets = torch.cat(
        [torch.from_numpy(targets[i, : target_lengths[i]]).long() for i in range(targets.shape[0])]
    )
    return loss(
        lp,
        flat_targets,
        torch.from_numpy(input_lengths).long(),
        torch.from_numpy(target_lengths).long(),
    ).numpy()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_loss_matches_torch(seed):
    rng = np.random.default_rng(seed)
    log_probs, input_lengths, targets, target_lengths = make_batch(rng)
    blank = log_probs.shape[-1] - 1

    golden = torch_ctc(log_probs, input_lengths, targets, target_lengths, blank)
    ours = np.asarray(
        ctc_loss(
            jnp.asarray(log_probs),
            jnp.asarray(input_lengths),
            jnp.asarray(targets),
            jnp.asarray(target_lengths),
            blank_id=blank,
        )
    )
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-4)


def test_ctc_loss_repeated_labels():
    """Repeats forbid the skip transition — the recursion must respect it."""
    rng = np.random.default_rng(10)
    B, T, C, L = 3, 40, 10, 8
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    targets = np.tile(np.array([[1, 1, 2, 2, 3, 3, 1, 1]], np.int32), (B, 1))
    target_lengths = np.array([8, 6, 4], np.int32)
    input_lengths = np.array([40, 35, 30], np.int32)
    blank = C - 1

    golden = torch_ctc(log_probs, input_lengths, targets, target_lengths, blank)
    ours = np.asarray(
        ctc_loss(jnp.asarray(log_probs), jnp.asarray(input_lengths),
                 jnp.asarray(targets), jnp.asarray(target_lengths), blank_id=blank)
    )
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-4)


def test_ctc_grad_matches_torch():
    rng = np.random.default_rng(5)
    B, T, C, L = 2, 20, 8, 5
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    input_lengths = np.array([20, 15], np.int32)
    targets = rng.integers(0, C - 1, size=(B, L)).astype(np.int32)
    target_lengths = np.array([5, 3], np.int32)
    blank = C - 1

    t_logits = torch.from_numpy(logits.copy()).requires_grad_(True)
    lp = torch.log_softmax(t_logits, dim=-1).transpose(0, 1)
    flat_targets = torch.cat(
        [torch.from_numpy(targets[i, : target_lengths[i]]).long() for i in range(B)]
    )
    loss = torch.nn.CTCLoss(blank=blank, reduction="none")(
        lp, flat_targets, torch.from_numpy(input_lengths).long(),
        torch.from_numpy(target_lengths).long(),
    ).mean()
    loss.backward()
    golden_grad = t_logits.grad.numpy()

    def loss_fn(lg):
        lps = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss_mean(
            lps, jnp.asarray(input_lengths), jnp.asarray(targets),
            jnp.asarray(target_lengths), blank_id=blank,
        )

    ours_grad = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))
    np.testing.assert_allclose(ours_grad, golden_grad, rtol=1e-3, atol=1e-4)


def test_ctc_padding_invariance():
    """Extra time padding beyond input_lengths must not change the loss."""
    rng = np.random.default_rng(9)
    log_probs, input_lengths, targets, target_lengths = make_batch(rng, B=2, T=30)
    blank = log_probs.shape[-1] - 1
    base = np.asarray(ctc_loss(jnp.asarray(log_probs), jnp.asarray(input_lengths),
                               jnp.asarray(targets), jnp.asarray(target_lengths), blank_id=blank))

    padded = np.concatenate([log_probs, rng.standard_normal((2, 13, log_probs.shape[-1])).astype(np.float32)], axis=1)
    out = np.asarray(ctc_loss(jnp.asarray(padded), jnp.asarray(input_lengths),
                              jnp.asarray(targets), jnp.asarray(target_lengths), blank_id=blank))
    np.testing.assert_allclose(out, base, rtol=1e-6, atol=1e-6)
