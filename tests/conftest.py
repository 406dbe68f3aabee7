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


# ---------------------------------------------------------------------------
# Two-tier suite (VERDICT r4 #5): `-m fast` is the quick all-green signal
# (no trainer fits / heavy train-step compiles); the full run is the
# pre-commit gate.  Files here fit trainers, compile full train steps, or
# spawn worker processes — everything else is auto-marked `fast`.
# Timings: see CLAUDE.md "Commands"; re-measure with
#   python -m pytest tests/ -q --durations=30
# ---------------------------------------------------------------------------
SLOW_FILES = {
    "test_training_e2e.py",     # Trainer.fit + full-step compiles
    "test_plateau_trainer.py",  # Trainer.fit (plateau recipe)
    "test_grad_accum.py",       # accum/clip train-step compiles
    "test_tensor_parallel.py",  # dp x tp sharded step compiles
    "test_multihost.py",        # 2-process gloo workers
    "test_ssl.py",              # SSL trainer fits + pseudo loop
    "test_ssl_retrain.py",      # retrain-mode trainer
    "test_ssl_speakers.py",     # speaker-corpus trainer
    "test_dual_stream.py",      # dual-stream trainer
    "test_predict_parity.py",   # train->ckpt->predict round trip
    "test_inference.py",        # translator compiles + server
    "test_cli_wiring.py",       # train.py entry smoke (fit)
    "test_streaming.py",        # streaming vs translate_long compiles
    "test_torch_import.py",     # torch reference model build + parity
    "test_ctc_pallas.py",       # interpret-mode kernel grads
    "test_lstm_pallas.py",
    "test_sepconv_pallas.py",
    "test_depthwise_pallas.py",
    "test_convergence_resume.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.path.name if hasattr(item, "path") else item.fspath.basename
        if fname in SLOW_FILES:
            item.add_marker(pytest.mark.slow)
        elif "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
