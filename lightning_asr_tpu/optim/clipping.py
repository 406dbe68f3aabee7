"""Gradient clipping — the reference exposes Lightning's
``gradient_clip_val`` / ``gradient_clip_algorithm`` knobs on its Trainer
(``/root/reference/train.py:249-250``, pinned to 0/'value' = off in the
shipped recipes).  Here clipping composes as an optax transformation
chained AHEAD of NovoGrad, so it runs inside the one jitted train graph
like everything else.

Lightning semantics preserved: ``clip_val == 0`` disables clipping;
``algorithm`` is ``'value'`` (elementwise clamp to [-v, +v]) or ``'norm'``
(rescale so the global L2 norm is at most v).
"""

from __future__ import annotations

import optax


def with_gradient_clipping(
    optimizer: optax.GradientTransformation,
    clip_val: float = 0.0,
    algorithm: str = "value",
) -> optax.GradientTransformation:
    """Wrap ``optimizer`` so incoming gradients are clipped first.

    NaN gradients pass through both algorithms non-finite (clip(NaN) is
    NaN; a NaN global norm rescales to NaN), so the trainer's in-graph
    NaN-skip guard still sees and skips bad steps.
    """
    if not clip_val:
        return optimizer
    if algorithm == "value":
        clip = optax.clip(float(clip_val))
    elif algorithm == "norm":
        clip = optax.clip_by_global_norm(float(clip_val))
    else:
        raise ValueError(
            f"gradient_clip_algorithm must be 'value' or 'norm', got {algorithm!r}")
    return optax.chain(clip, optimizer)
