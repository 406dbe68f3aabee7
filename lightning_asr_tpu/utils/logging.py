"""Logging + determinism helpers.

The reference seeds python/numpy/torch via ``pl.seed_everything(0)``
(``/root/reference/train.py:203``) and logs through hydra-configured python
logging (``/root/reference/conf/log/hypra_logger.yaml``).  Here determinism is
JAX-native: one root PRNG key threads the whole run; ``seed_everything`` also
seeds python/numpy for host-side shuffling.
"""

from __future__ import annotations

import logging
import os
import random
import sys

import numpy as np

_FORMAT = "[%(asctime)s][%(name)s][%(levelname)s] - %(message)s"


def get_logger(name: str = "lightning_asr_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    return logger


def add_file_handler(logger: logging.Logger, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    handler = logging.FileHandler(path, encoding="utf-8")
    handler.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(handler)


def enable_compile_cache(path: str = "/tmp/jax_cache") -> None:
    """Persistent XLA compile cache — first compile of each graph is slow
    (remote Mosaic compiles ~minutes); every later process reuses it."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - older jax
        pass


def seed_everything(seed: int = 0) -> "jax.Array":  # noqa: F821
    """Seed host RNGs and return the root JAX PRNG key for the run."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import jax

    return jax.random.PRNGKey(seed)
