"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (the TPU-native analog of testing
multi-node without a cluster — absent in the reference, required here).

Note: a sitecustomize may import jax before this file runs, so env vars alone
are too late — backend *initialization* is lazy, so overriding
``jax_platforms`` via jax.config here still takes effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the big QuartzNet train-step compiles once per
# machine, not once per pytest run.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
