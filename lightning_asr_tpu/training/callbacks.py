"""Trainer callbacks.

The reference declares a (pl.Callback / ModelCheckpoint) callback surface
(``/root/reference/callback.py`` — empty stubs) and uses the built-in
ModelCheckpoint + LearningRateMonitor (``train.py:210-213``).  Here the
callback interface is a first-class Trainer extension point; checkpointing
and LR monitoring are built into the Trainer, and these callbacks layer
user hooks on top."""

from __future__ import annotations

import logging
from typing import Any, Optional

logger = logging.getLogger(__name__)


class Callback:
    """Base callback: override any subset of hooks."""

    def on_fit_start(self, trainer, state) -> None: ...
    def on_train_epoch_start(self, trainer, state, epoch: int) -> None: ...
    def on_train_batch_end(self, trainer, state, metrics: dict, batch, batch_idx: int) -> None: ...
    def on_train_epoch_end(self, trainer, state, epoch: int) -> None: ...
    def on_validation_end(self, trainer, state, epoch: int, metrics: dict) -> None: ...
    def on_fit_end(self, trainer, state) -> None: ...


class LearningRateMonitor(Callback):
    """Log lr per step (the reference's LearningRateMonitor(
    logging_interval='step'), ``train.py:213``) — built into Trainer logging;
    this variant logs at a custom cadence."""

    def __init__(self, every_n_steps: int = 1):
        self.every_n_steps = every_n_steps

    def on_train_batch_end(self, trainer, state, metrics, batch, batch_idx):
        step = int(state.step)
        if trainer.lr_schedule is not None and step % self.every_n_steps == 0:
            trainer.loggers.log_metrics({"lr": float(trainer.lr_schedule(step - 1))}, step)


class EarlyStopping(Callback):
    """Stop when the monitored metric stops improving (capability extension
    over the reference, which has no early stopping)."""

    def __init__(self, monitor: str = "val_wer", patience: int = 20, mode: str = "min"):
        self.monitor = monitor
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.bad = 0

    def on_validation_end(self, trainer, state, epoch, metrics):
        value = metrics.get(self.monitor)
        if value is None:
            return
        improved = self.best is None or (
            value < self.best if self.mode == "min" else value > self.best
        )
        if improved:
            self.best = value
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                logger.info("early stopping at epoch %d (%s=%.4f, best=%.4f)",
                            epoch, self.monitor, value, self.best)
                trainer.should_stop = True
