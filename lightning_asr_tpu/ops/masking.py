"""Length/percentage masking helpers.

The reference carries sequence lengths as *fractions of the padded batch
length* ("input_percentages", ``/root/reference/data_module.py:244``) and
recovers frame counts at each masking point via ``int(T * percent)``
(``models/QuartNetContext.py:249``).  Internally this framework carries
absolute lengths; these helpers convert at API edges and reproduce the
reference's floor-based recovery formula exactly so masking/CTC lengths match
to the frame.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def percents_from_lengths(lengths: jnp.ndarray, padded_len: int) -> jnp.ndarray:
    """lengths (B,) int -> percents (B,) float32 of padded_len."""
    return lengths.astype(jnp.float32) / jnp.float32(padded_len)


def lengths_from_percents(percents: jnp.ndarray, padded_len: int) -> jnp.ndarray:
    """Reference recovery: ``int(T * percent)`` with float32 rounding to match
    torch (``QuartNetContext.py:249``, ``train.py:76``)."""
    return (jnp.float32(padded_len) * percents.astype(jnp.float32)).astype(jnp.int32)


def length_mask(lengths: jnp.ndarray, padded_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B,) int lengths -> (B, padded_len) mask, 1.0 for t < length."""
    t = lax.broadcasted_iota(jnp.int32, (1, padded_len), 1)
    return (t < lengths[:, None]).astype(dtype)


def mask_padding(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Zero frames >= length. x is (B, T, ...); lengths (B,) int."""
    mask = length_mask(lengths, x.shape[1], x.dtype)
    return x * mask.reshape(mask.shape + (1,) * (x.ndim - 2))
