"""Activation zoo — Swish and Mish, defined (and selectable) like the
reference's ``activate_fun/Swish.py`` (imported by every model file there
but unused at runtime; ReLU is the default throughout).  Exposed here so
encoders can swap activations via ``activation=``."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) (SiLU)."""
    return x * jax.nn.sigmoid(x)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """x * tanh(softplus(x))."""
    return x * jnp.tanh(jax.nn.softplus(x))


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "swish": swish,
    "mish": mish,
}


def get_activation(name: str):
    if name not in ACTIVATIONS:
        raise ValueError(f"unknown activation {name!r}; choose from {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[name]
