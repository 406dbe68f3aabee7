from .novograd import novograd
from .schedules import (
    cosine_annealing_warmup_restarts,
    ReduceLROnPlateau,
    get_lr_policy,
    LR_POLICIES,
)

__all__ = [
    "novograd",
    "cosine_annealing_warmup_restarts",
    "ReduceLROnPlateau",
    "get_lr_policy",
    "LR_POLICIES",
]
