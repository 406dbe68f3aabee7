"""Length-masked (bi)LSTM via ``lax.scan`` — packed-sequence equivalent.

The reference runs a cuDNN BiLSTM over ``pack_padded_sequence`` inputs
(``/root/reference/models/QuartNetContext.py:186-199``): output frames past
each sample's true length are zero after unpacking, and the backward
direction starts its recurrence at the true last frame.  Equivalent TPU
semantics here:

  * the input projection ``x @ W_ih^T + b`` for all steps is hoisted out of
    the scan as one big (B*T, in) x (in, 4H) matmul that lands on the MXU;
    the scan body only carries the small (B, H) recurrences;
  * the backward direction runs over the time-reversed padded batch with a
    *masked state update*: during the leading pads of a reversed sequence the
    carry stays at the initial state, so the recurrence effectively starts at
    the true last frame — exactly pack_padded_sequence's behavior;
  * outputs at padded frames are zeroed.

Gate order and math follow torch.nn.LSTM: gates [i, f, g, o], both b_ih and
b_hh applied.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LSTMWeights(NamedTuple):
    w_ih: jnp.ndarray  # (4H, in)
    w_hh: jnp.ndarray  # (4H, H)
    b_ih: jnp.ndarray  # (4H,)
    b_hh: jnp.ndarray  # (4H,)


def _direction(
    x: jnp.ndarray, lengths: jnp.ndarray, w: LSTMWeights, reverse: bool
) -> jnp.ndarray:
    """One LSTM direction over (B, T, in) -> (B, T, H), pad frames zeroed."""
    B, T, _ = x.shape
    H = w.w_hh.shape[1]

    # Hoisted input projection: one MXU matmul for the whole sequence.
    xproj = jnp.einsum("bti,gi->btg", x, w.w_ih) + w.b_ih + w.b_hh  # (B, T, 4H)

    t_idx = lax.broadcasted_iota(jnp.int32, (T, 1), 0)[:, 0]  # (T,)
    if reverse:
        xproj = jnp.flip(xproj, axis=1)
        # reversed position t corresponds to original frame T-1-t
        valid_t = (T - 1 - t_idx)[:, None] < lengths[None, :]  # (T, B)
    else:
        valid_t = t_idx[:, None] < lengths[None, :]

    xproj_t = jnp.moveaxis(xproj, 1, 0)  # (T, B, 4H)

    def step(carry, inputs):
        h, c = carry
        xp, valid = inputs  # (B, 4H), (B,)
        gates = xp + h @ w.w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        v = valid[:, None]
        h = jnp.where(v, h_new, h)
        c = jnp.where(v, c_new, c)
        out = jnp.where(v, h_new, 0.0)
        return (h, c), out

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    # unroll amortizes per-iteration loop overhead; the recurrence itself is
    # tiny (B x H) so the sequential chain is latency-bound
    _, outs = lax.scan(step, init, (xproj_t, valid_t), unroll=8)  # (T, B, H)
    outs = jnp.moveaxis(outs, 0, 1)  # (B, T, H)
    if reverse:
        outs = jnp.flip(outs, axis=1)
    return outs


def lstm(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    forward: LSTMWeights,
    backward: LSTMWeights | None = None,
) -> jnp.ndarray:
    """(B, T, in) -> (B, T, H) or (B, T, 2H) if bidirectional.

    Output frames at t >= lengths[b] are exactly zero (packed-sequence
    unpack parity)."""
    out_f = _direction(x, lengths, forward, reverse=False)
    if backward is None:
        return out_f
    out_b = _direction(x, lengths, backward, reverse=True)
    return jnp.concatenate([out_f, out_b], axis=-1)
