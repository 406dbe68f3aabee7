from .layers import SepConv, QuartNetBlock, MaskedBatchNorm, SELayer, BatchLSTM, torch_uniform_init
from .quartznet import (
    QuartNet12Context,
    QuartNet15x5,
    QuartNet105,
    AsrModel,
    build_model,
    MODEL_REGISTRY,
)

__all__ = [
    "SepConv",
    "QuartNetBlock",
    "MaskedBatchNorm",
    "SELayer",
    "BatchLSTM",
    "torch_uniform_init",
    "QuartNet12Context",
    "QuartNet15x5",
    "QuartNet105",
    "AsrModel",
    "build_model",
    "MODEL_REGISTRY",
]
