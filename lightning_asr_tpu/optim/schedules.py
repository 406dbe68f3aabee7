"""Learning-rate schedules.

  * ``cosine_annealing_warmup_restarts`` — the schedule the reference
    actually trains with (``/root/reference/scheduler/
    cosine_annearing_with_warmup.py``, wired at ``train.py:53-55`` with
    first_cycle_steps = total_epochs * steps_per_epoch, cycle_mult=2,
    min_lr=1e-4, warmup_steps=1000, gamma=0.5, stepped per optimizer step).
    Implemented as a pure jittable function of the step count: cycle
    boundaries are precomputed host-side, the cycle index is a
    ``searchsorted``.  Every cycle begins with a fresh linear warmup from
    min_lr, and the cycle's max lr decays as ``max_lr * gamma**cycle`` —
    matching the torch class step-for-step.
  * ``ReduceLROnPlateau`` — host-side controller with torch semantics
    (mode=min, rel threshold, patience, cooldown, min_lr), the recipe the
    reference README used for the 16.4% train-clean-100 run.
  * the NVIDIA LR-policy zoo (``scheduler/lr_policy.py``) as optax-style
    schedule factories with a ``get_lr_policy`` registry.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def cosine_annealing_warmup_restarts(
    first_cycle_steps: int,
    cycle_mult: float = 1.0,
    max_lr: float = 0.1,
    min_lr: float = 0.001,
    warmup_steps: int = 0,
    gamma: float = 1.0,
    max_total_steps: int = 1 << 40,
) -> Schedule:
    """Pure-function equivalent of CosineAnnealingWarmupRestarts.

    lr(step): with c the cycle index and s the step within the cycle,
      s < warmup:  min_lr + (max_lr*gamma^c - min_lr) * s / warmup
      else:        min_lr + (max_lr*gamma^c - min_lr) *
                   (1 + cos(pi*(s - warmup)/(cycle_len - warmup))) / 2
    Cycle lengths grow as len_{c+1} = (len_c - warmup)*cycle_mult + warmup.
    """
    assert warmup_steps < first_cycle_steps

    lengths = [first_cycle_steps]
    while sum(lengths) < max_total_steps and len(lengths) < 64:
        lengths.append(int((lengths[-1] - warmup_steps) * cycle_mult) + warmup_steps)
    starts = np.concatenate([[0], np.cumsum(lengths)]).astype(np.float64)
    lengths = np.asarray(lengths, np.float64)

    starts_j = jnp.asarray(starts[:-1])
    lengths_j = jnp.asarray(lengths)
    cycle_repeats = cycle_mult == 1.0

    def schedule(step) -> jnp.ndarray:
        step = jnp.asarray(step, jnp.float64 if starts_j.dtype == jnp.float64 else jnp.float32)
        stepf = step.astype(jnp.float32)
        if cycle_repeats:
            cycle = jnp.floor(stepf / first_cycle_steps)
            sic = stepf - cycle * first_cycle_steps
            cycle_len = jnp.float32(first_cycle_steps)
        else:
            cycle = jnp.clip(
                jnp.searchsorted(starts_j.astype(jnp.float32), stepf, side="right") - 1,
                0, len(lengths) - 1,
            )
            sic = stepf - starts_j.astype(jnp.float32)[cycle]
            cycle_len = lengths_j.astype(jnp.float32)[cycle]
        cur_max = max_lr * jnp.power(jnp.float32(gamma), cycle.astype(jnp.float32))
        warm = min_lr + (cur_max - min_lr) * sic / max(warmup_steps, 1)
        cos = min_lr + (cur_max - min_lr) * (
            1.0 + jnp.cos(jnp.pi * (sic - warmup_steps) / (cycle_len - warmup_steps))
        ) / 2.0
        return jnp.where(sic < warmup_steps, warm, cos).astype(jnp.float32)

    return schedule


class ReduceLROnPlateau:
    """Host-side plateau controller (torch semantics, mode='min').

    Call ``step(metric)`` each validation; read ``lr`` (or use as a
    multiplier via ``scale``). Defaults mirror the reference's commented
    recipe (``train.py:49-52``): factor 0.1, patience 10, rel threshold
    1e-4, cooldown 3, min_lr 1e-4."""

    def __init__(
        self,
        init_lr: float,
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        threshold_mode: str = "rel",
        cooldown: int = 3,
        min_lr: float = 1e-4,
    ):
        if factor >= 1.0:
            raise ValueError("factor must be < 1.0")
        self.init_lr = init_lr
        self.lr = init_lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.cooldown_counter = 0
        self.num_bad_epochs = 0
        self.best = math.inf

    def _is_better(self, metric: float) -> bool:
        if self.threshold_mode == "rel":
            return metric < self.best * (1.0 - self.threshold)
        return metric < self.best - self.threshold

    def step(self, metric: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    @property
    def scale(self) -> float:
        return self.lr / self.init_lr

    def state_dict(self) -> dict:
        return {k: getattr(self, k) for k in
                ("lr", "cooldown_counter", "num_bad_epochs", "best")}

    def load_state_dict(self, state: dict) -> None:
        for k, v in state.items():
            setattr(self, k, v)


# ---------------------------------------------------------------------------
# NVIDIA lr-policy zoo (reference scheduler/lr_policy.py) as schedule factories
# ---------------------------------------------------------------------------

def _with_warmup(body, initial_lr, warmup_steps, total_steps, after_total):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = initial_lr * (step + 1.0) / (warmup_steps + 1.0)
        main = body(step)
        out = jnp.where(step < warmup_steps, warm, main)
        if total_steps is not None:
            out = jnp.where(step > total_steps, after_total, out)
        return out
    return schedule


def warmup_policy(initial_lr, warmup_steps=0, total_steps=None, warmup_ratio=None):
    if warmup_ratio is not None:
        warmup_steps = int(warmup_ratio * total_steps)
    return _with_warmup(lambda s: jnp.float32(initial_lr), initial_lr, warmup_steps, total_steps, 0.0)


def warmup_hold_policy(initial_lr, warmup_steps=0, hold_steps=0, total_steps=None, min_lr=0.0):
    hold_end = warmup_steps + hold_steps

    def body(step):
        return jnp.where(step < hold_end, initial_lr, initial_lr)
    return _with_warmup(body, initial_lr, warmup_steps, total_steps, min_lr)


def square_annealing(initial_lr, total_steps, warmup_steps=0, min_lr=1e-5):
    def body(step):
        s = step - warmup_steps
        span = total_steps - warmup_steps
        mult = ((span - s) / span) ** 2
        return jnp.maximum(initial_lr * mult, min_lr)
    return _with_warmup(body, initial_lr, warmup_steps, total_steps, 0.0)


def squareroot_annealing(initial_lr, total_steps, warmup_steps=0, min_lr=0.0):
    def body(step):
        mult = jnp.sqrt(jnp.maximum((total_steps - step) / total_steps, 0.0))
        return jnp.maximum(initial_lr * mult, min_lr)
    return _with_warmup(body, initial_lr, warmup_steps, total_steps, 0.0)


def cosine_annealing(initial_lr, total_steps, warmup_steps=0, min_lr=0.0):
    if initial_lr < min_lr:
        raise ValueError("initial lr below minimum lr")

    def body(step):
        s = step - warmup_steps
        span = total_steps - warmup_steps
        mult = 0.5 * (1.0 + jnp.cos(jnp.pi * s / span))
        return (initial_lr - min_lr) * mult + min_lr
    return _with_warmup(body, initial_lr, warmup_steps, total_steps, 0.0)


def warmup_annealing(initial_lr, total_steps, warmup_steps=0):
    def body(step):
        progress = step / total_steps
        warmup_ratio = warmup_steps / total_steps
        mult = jnp.maximum((progress - 1.0) / (warmup_ratio - 1.0), 0.0)
        return initial_lr * mult
    return _with_warmup(body, initial_lr, warmup_steps, total_steps, 0.0)


def inverse_squareroot_annealing(initial_lr, total_steps, warmup_steps=0):
    def body(step):
        denom = jnp.sqrt((step + 1.0) / (warmup_steps + 1.0))
        return initial_lr / denom
    return _with_warmup(body, initial_lr, warmup_steps, total_steps, 0.0)


def polynomial_decay_annealing(initial_lr, total_steps, warmup_steps=0, min_lr=0.0, power=1.0):
    def body(step):
        s = jnp.minimum(step - warmup_steps, total_steps - warmup_steps)
        p = s / (total_steps - warmup_steps)
        return (initial_lr - min_lr) * jnp.power(1.0 - p, power) + min_lr
    return _with_warmup(body, initial_lr, warmup_steps, total_steps, 0.0)


def polynomial_hold_decay_annealing(initial_lr, total_steps, warmup_steps=0,
                                    hold_steps=0, min_lr=0.0, power=1.0):
    hold_end = warmup_steps + hold_steps

    def body(step):
        span = total_steps - max(warmup_steps, hold_end)
        s = jnp.clip(step - hold_end, 0.0, span)
        p = s / span
        decay = (initial_lr - min_lr) * jnp.power(1.0 - p, power) + min_lr
        return jnp.where(step < hold_end, initial_lr, decay)
    return _with_warmup(body, initial_lr, warmup_steps, total_steps, min_lr)


LR_POLICIES = {
    "WarmupPolicy": warmup_policy,
    "WarmupHoldPolicy": warmup_hold_policy,
    "SquareAnnealing": square_annealing,
    "SquareRootAnnealing": squareroot_annealing,
    "CosineAnnealing": cosine_annealing,
    "WarmupAnnealing": warmup_annealing,
    "InverseSquareRootAnnealing": inverse_squareroot_annealing,
    "PolynomialDecayAnnealing": polynomial_decay_annealing,
    "PolynomialHoldDecayAnnealing": polynomial_hold_decay_annealing,
    "CosineAnnealingWarmupRestarts": cosine_annealing_warmup_restarts,
}


def get_lr_policy(name: str, **kwargs) -> Schedule:
    if name not in LR_POLICIES:
        raise ValueError(f"{name} is not a supported lr policy. Supported: {sorted(LR_POLICIES)}")
    return LR_POLICIES[name](**kwargs)
