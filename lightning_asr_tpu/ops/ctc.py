"""CTC loss — log-space alpha (forward) recursion, batched, scan over time.

Semantics match ``torch.nn.CTCLoss(blank=V, reduction='none')`` as the
reference uses it (``/root/reference/train.py:196``, blank is the LAST
index; per-sample losses are un-normalized -log p(y|x) and the training step
takes their mean, ``train.py:77-78``).

Implementation notes (TPU-first):
  * states are the 2L+1 blank-interleaved extended labels; the recursion is a
    ``lax.scan`` over (static, padded) time with per-sample valid-length
    masking — no data-dependent shapes, so one compile per bucket;
  * everything is vectorized over (batch, states): per step we gather the
    emission log-prob of each state's label and combine three shifted copies
    of alpha with logsumexp;
  * gradients flow through ``lax.scan`` autodiff.  A fused Pallas
    forward/backward (alpha-beta) kernel can replace this via the same public
    function without touching callers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_NEG_INF = -1.0e30


def _extended_labels(targets: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """(B, L) labels -> (B, 2L+1) blank-interleaved extended states."""
    B, L = targets.shape
    ext = jnp.full((B, 2 * L + 1), blank_id, targets.dtype)
    return ext.at[:, 1::2].set(targets)


@partial(jax.jit, static_argnames=("blank_id",))
def ctc_loss(
    log_probs: jnp.ndarray,
    input_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int,
) -> jnp.ndarray:
    """Per-sample CTC negative log likelihood.

    Args:
      log_probs: (B, T, C) log-softmax outputs.
      input_lengths: (B,) int valid frame counts (<= T).
      targets: (B, L) int padded label sequences.
      target_lengths: (B,) int valid label counts (<= L).
      blank_id: index of the CTC blank (the reference uses C-1).

    Returns:
      (B,) float32 losses (un-normalized -log p, like torch reduction='none').
    """
    log_probs = log_probs.astype(jnp.float32)
    B, T, C = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1

    ext = _extended_labels(targets.astype(jnp.int32), blank_id)      # (B, S)
    is_blank = ext == blank_id
    # skip transition allowed when label(s) != blank and label(s) != label(s-2)
    ext_m2 = jnp.concatenate([jnp.full((B, 2), blank_id, ext.dtype), ext[:, :-2]], axis=1)
    allow_skip = (~is_blank) & (ext != ext_m2)                        # (B, S)

    # Emission log-probs for every (time, state) as ONE one-hot matmul on the
    # MXU: emit[b,t,s] = log_probs[b,t,ext[b,s]].  Gathers are scalar-unit
    # work on TPU (~100x slower per element than matmul FLOPs).  Precision
    # HIGH (3-pass bf16) instead of HIGHEST (6-pass): the 0/1 one-hot operand
    # is EXACT in bf16 (its lo split is all zeros), so each output is a
    # single selected log-prob reconstructed from the hi+lo splits of
    # log_probs — error <= 2^-16 relative (~1e-5), and the autodiff backward
    # einsum inherits the same precision.  At the AISHELL head (C=4334,
    # /root/reference/data/aishell1-vocab.txt) this halves the emission
    # matmuls' MXU time; exactness at C<=32 is unaffected in practice.
    neg_inf = jnp.float32(_NEG_INF)
    onehot = (ext[:, :, None] == jnp.arange(C)[None, None, :]).astype(log_probs.dtype)
    emit_all = jnp.einsum(
        "btc,bsc->bts", log_probs, onehot, precision=lax.Precision.HIGH
    )  # (B, T, S)

    alpha0 = jnp.full((B, S), neg_inf)
    alpha0 = alpha0.at[:, 0].set(emit_all[:, 0, 0])
    has_label = target_lengths > 0
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, emit_all[:, 0, 1], neg_inf))

    emit_t = jnp.moveaxis(emit_all[:, 1:, :], 1, 0)                   # (T-1, B, S)
    valid_t = (jnp.arange(1, T)[:, None] < input_lengths[None, :])    # (T-1, B)

    def step(alpha, inputs):
        emit, valid = inputs
        a_prev = alpha
        a_m1 = jnp.concatenate([jnp.full((B, 1), neg_inf), alpha[:, :-1]], axis=1)
        a_m2 = jnp.concatenate([jnp.full((B, 2), neg_inf), alpha[:, :-2]], axis=1)
        a_m2 = jnp.where(allow_skip, a_m2, neg_inf)

        m = jnp.maximum(jnp.maximum(a_prev, a_m1), a_m2)
        lse = m + jnp.log(
            jnp.exp(a_prev - m) + jnp.exp(a_m1 - m) + jnp.exp(a_m2 - m)
        )
        new_alpha = lse + emit
        return jnp.where(valid[:, None], new_alpha, alpha), None

    alpha, _ = lax.scan(step, alpha0, (emit_t, valid_t), unroll=8)

    # Final states: 2*target_len (last blank) and 2*target_len - 1 (last label)
    idx_last = (2 * target_lengths).astype(jnp.int32)
    a_last = jnp.take_along_axis(alpha, idx_last[:, None], axis=1)[:, 0]
    idx_prev = jnp.maximum(idx_last - 1, 0)
    a_prev = jnp.take_along_axis(alpha, idx_prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(target_lengths > 0, a_prev, neg_inf)

    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    return -ll


def ctc_loss_mean(log_probs, input_lengths, targets, target_lengths, blank_id) -> jnp.ndarray:
    """Batch-mean CTC loss, the reference's training objective
    (``train.py:77-78``)."""
    return jnp.mean(ctc_loss(log_probs, input_lengths, targets, target_lengths, blank_id))
