"""Greedy CTC decoding — vectorized collapse on device, strings on host.

The reference collapses per sample in a CPU python loop
(``/root/reference/utils/asr_metrics.py:138-171``): emit p when
``(p != previous or previous == blank) and p != blank`` within the valid
length.  Here the emit mask is computed for the whole batch on-device (one
fused elementwise pass over (B, T)); the host then compacts masked ids into
strings — O(emitted chars), no device sync per sample.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@partial(jax.jit, static_argnames=("blank_id",))
def greedy_collapse_device(
    predictions: jnp.ndarray, lengths: jnp.ndarray, blank_id: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T) argmax ids + (B,) valid lengths -> (ids, emit_mask).

    emit_mask[b, t] is True where the reference's greedy collapse would
    append ids[b, t]."""
    B, T = predictions.shape
    prev = jnp.concatenate(
        [jnp.full((B, 1), blank_id, predictions.dtype), predictions[:, :-1]], axis=1
    )
    t_idx = lax.broadcasted_iota(jnp.int32, (B, T), 1)
    emit = ((predictions != prev) | (prev == blank_id)) \
        & (predictions != blank_id) \
        & (t_idx < lengths[:, None])
    return predictions, emit


def greedy_decode_to_strings(
    predictions,
    lengths,
    vocabulary: Sequence[str],
    blank_id: int | None = None,
) -> List[str]:
    """Decode device argmax ids to text. `predictions` (B, T) int,
    `lengths` (B,) int."""
    vocab = list(vocabulary)
    if blank_id is None:
        blank_id = len(vocab)
    ids, emit = greedy_collapse_device(
        jnp.asarray(predictions), jnp.asarray(lengths), blank_id
    )
    ids = np.asarray(ids)
    emit = np.asarray(emit)
    out = []
    for row_ids, row_emit in zip(ids, emit):
        out.append("".join(vocab[i] for i in row_ids[row_emit]))
    return out
