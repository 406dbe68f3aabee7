"""NovoGrad as an optax gradient transformation.

Semantics match the NVIDIA implementation the reference trains with
(``/root/reference/scheduler/novograd.py``; used with betas (0.8, 0.5),
lr 1e-2, wd 1e-3 — ``train.py:46``), including its quirks:

  * the second moment is a **scalar per parameter tensor** (the squared
    grad L2 norm), *initialized to the first step's norm* rather than 0
    (guarded by an ``exp_avg_sq == 0`` check, reproduced exactly);
  * update order: normalize grad by sqrt(second moment)+eps, then add
    weight decay ON THE NORMALIZED grad, optional grad averaging, then
    momentum ``m = beta1*m + g``; step ``p -= lr*m``;
  * optional AMSGrad and LUC trust-ratio clipping.

TPU notes: the transform is elementwise + per-tensor reductions — XLA fuses
it into the backward pass; state is two scalars + one momentum tensor per
parameter.  ``learning_rate`` may be a scalar or an optax schedule; the step
count lives in the optimizer state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class NovogradState(NamedTuple):
    count: jnp.ndarray              # scalar int32 step counter
    exp_avg: optax.Updates          # momentum, like params
    exp_avg_sq: optax.Updates       # scalar per tensor
    max_exp_avg_sq: optax.Updates   # scalar per tensor (amsgrad)


def novograd(
    learning_rate: optax.ScalarOrSchedule,
    betas: tuple[float, float] = (0.95, 0.98),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    grad_averaging: bool = False,
    amsgrad: bool = False,
    luc: bool = False,
    luc_trust: float = 1e-3,
    luc_eps: float = 1e-8,
) -> optax.GradientTransformation:
    beta1, beta2 = betas
    if not (0.0 <= beta1 < 1.0 and 0.0 <= beta2 < 1.0):
        raise ValueError(f"Betas have to be between 0 and 1: {betas}")
    if eps < 0:
        raise ValueError(f"Invalid epsilon value: {eps}")

    def init_fn(params):
        return NovogradState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            exp_avg_sq=jax.tree.map(lambda p: jnp.zeros((), jnp.float32), params),
            max_exp_avg_sq=jax.tree.map(lambda p: jnp.zeros((), jnp.float32), params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("novograd requires params (weight decay / LUC)")
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        lr = jnp.asarray(lr, jnp.float32)

        def moments(g, m, v, vmax, p):
            g = g.astype(jnp.float32)
            norm = jnp.sum(g * g)
            v_new = jnp.where(v == 0.0, norm, beta2 * v + (1.0 - beta2) * norm)
            vmax_new = jnp.maximum(vmax, v_new) if amsgrad else vmax
            denom = jnp.sqrt(vmax_new if amsgrad else v_new) + eps
            g = g / denom
            if weight_decay != 0.0:
                g = g + weight_decay * p.astype(jnp.float32)
            if grad_averaging:
                g = g * (1.0 - beta1)
            m_new = beta1 * m + g
            return m_new, v_new, vmax_new

        def step_update(m, p):
            if luc:
                data_norm = jnp.linalg.norm(p.astype(jnp.float32))
                grad_norm = jnp.linalg.norm(m)
                factor = jnp.minimum(luc_trust * data_norm / (grad_norm + luc_eps), lr)
                return (-factor * m).astype(p.dtype)
            return (-lr * m).astype(p.dtype)

        flat_g, treedef = jax.tree.flatten(updates)
        flat_m = treedef.flatten_up_to(state.exp_avg)
        flat_v = treedef.flatten_up_to(state.exp_avg_sq)
        flat_vm = treedef.flatten_up_to(state.max_exp_avg_sq)
        flat_p = treedef.flatten_up_to(params)

        out = [moments(g, m, v, vm, p)
               for g, m, v, vm, p in zip(flat_g, flat_m, flat_v, flat_vm, flat_p)]
        new_m = treedef.unflatten([o[0] for o in out])
        new_v = treedef.unflatten([o[1] for o in out])
        new_vm = treedef.unflatten([o[2] for o in out])

        new_updates = jax.tree.map(step_update, new_m, params)
        return new_updates, NovogradState(state.count + 1, new_m, new_v, new_vm)

    return optax.GradientTransformation(init_fn, update_fn)
