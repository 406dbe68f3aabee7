from .steps import AsrTrainState, make_train_step, make_eval_step, create_train_state
from .trainer import Trainer
from .checkpoint import CheckpointManager, load_checkpoint
from .loggers import (
    CSVLogger,
    CometLogger,
    MultiLogger,
    TensorBoardLogger,
    init_loggers,
)
from .profiler import SimpleProfiler

__all__ = [
    "AsrTrainState",
    "make_train_step",
    "make_eval_step",
    "create_train_state",
    "Trainer",
    "CheckpointManager",
    "load_checkpoint",
    "CSVLogger",
    "CometLogger",
    "MultiLogger",
    "TensorBoardLogger",
    "init_loggers",
    "SimpleProfiler",
]
