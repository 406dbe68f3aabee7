from .clipping import with_gradient_clipping
from .novograd import novograd, novograd_with_runtime_lr
from .schedules import (
    cosine_annealing_warmup_restarts,
    ReduceLROnPlateau,
    get_lr_policy,
    LR_POLICIES,
)

__all__ = [
    "with_gradient_clipping",
    "novograd",
    "novograd_with_runtime_lr",
    "cosine_annealing_warmup_restarts",
    "ReduceLROnPlateau",
    "get_lr_policy",
    "LR_POLICIES",
]
