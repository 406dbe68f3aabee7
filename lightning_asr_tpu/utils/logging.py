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


def setup_run_dir(cfg, default: str = "outputs/run") -> "Path":  # noqa: F821
    """Resolve the templated run directory from the ``log`` config group,
    create it, and wire job logging into it.

    Mirrors the reference's hydra-managed run dirs
    (``/root/reference/conf/log/hypra_logger.yaml:40-41``): every run lands in
    ``outputs/${model_name}/${date}/${time}-${experiment_name}`` with a
    formatted file+console logging profile (``job_logging`` section).  Falls
    back to a top-level ``run_dir`` key, then to ``default``.
    """
    from pathlib import Path

    run_dir = Path(cfg.get("log.run.dir") or cfg.get("run_dir") or default)
    run_dir.mkdir(parents=True, exist_ok=True)

    job = cfg.get("log.job_logging")
    if job:
        fmt = job.get("format", _FORMAT)
        level = getattr(logging, str(job.get("level", "INFO")).upper(), logging.INFO)
        pkg = logging.getLogger("lightning_asr_tpu")
        pkg.setLevel(level)
        for h in pkg.handlers:
            h.setFormatter(logging.Formatter(fmt))
        filename = job.get("filename")
        if filename:
            handler = logging.FileHandler(run_dir / filename, encoding="utf-8")
            handler.setFormatter(logging.Formatter(fmt))
            pkg.addHandler(handler)
    return run_dir


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
