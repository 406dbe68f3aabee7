#!/usr/bin/env python
"""Prime the persistent XLA compile cache for CI / fresh machines.

The test suite runs on a virtual 8-device CPU mesh (tests/conftest.py) and
its first cold run spends ~10 minutes compiling; the CLIs similarly pay
minutes of remote Mosaic compiles on the first TPU run of each shape.  This
script front-loads the expensive compiles into /tmp/jax_cache so everything
after it is warm:

  * CPU mode (default, matches CI): the full sharded train step + val step
    at the tests' tiny shapes on the 8-device mesh, plus the Pallas kernels
    in interpret mode.
  * TPU mode (--tpu, run on a chip): the bench train-step shape, the
    predict forward, and the compiled Pallas kernels.

Usage: python scripts/prime_compile_cache.py [--tpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def prime_cpu() -> None:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    _prime_common(n_devices=8, B=8, T=128)


def prime_tpu() -> None:
    import jax

    assert jax.default_backend() != "cpu", "run --tpu on a TPU host"
    _prime_common(n_devices=1, B=32, T=1670)


def _prime_common(n_devices: int, B: int, T: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.ops.frontend import MelFrontendConfig
    from lightning_asr_tpu.optim import cosine_annealing_warmup_restarts, novograd
    from lightning_asr_tpu.parallel import (
        batch_sharding, make_mesh, replicated_sharding)
    from lightning_asr_tpu.training.steps import (
        create_train_state, make_eval_step, make_train_step)
    from lightning_asr_tpu.utils import enable_compile_cache

    enable_compile_cache()
    t0 = time.monotonic()
    S = T * 160
    rng = jax.random.PRNGKey(0)
    rng_np = np.random.default_rng(0)
    cfg = MelFrontendConfig(precision="default")
    model = build_model(num_classes=29, mask=True, dtype=jnp.bfloat16)
    schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=100, cycle_mult=2, max_lr=1e-2, min_lr=1e-4,
        warmup_steps=10, gamma=0.5)
    opt = novograd(schedule, betas=(0.8, 0.5), weight_decay=1e-3)
    state = create_train_state(model, opt, rng, feature_shape=(1, 128, 64))

    mesh = make_mesh(n_devices)
    state = jax.device_put(state, replicated_sharding(mesh))
    batch = {
        "waves": jnp.asarray((rng_np.standard_normal((B, S)) * 0.1)
                             .astype(np.float32)),
        "wave_lens": jnp.full((B,), S, jnp.int32),
        "prev_samples": jnp.zeros((B,)),
        "targets": jnp.asarray(rng_np.integers(0, 28, (B, 32)).astype(np.int32)),
        "target_lens": jnp.full((B,), 32, jnp.int32),
    }
    batch = jax.device_put(batch, batch_sharding(mesh))
    train_step = jax.jit(make_train_step(model, opt, 28, cfg, augment=True),
                         donate_argnums=(0,))
    state2, metrics = train_step(state, batch, rng)
    print(f"train step compiled+ran in {time.monotonic() - t0:.1f}s "
          f"(loss={float(metrics['loss']):.3f})")

    t0 = time.monotonic()
    eval_step = jax.jit(make_eval_step(model, 28, cfg))
    m = eval_step(state2, batch)
    print(f"eval step compiled+ran in {time.monotonic() - t0:.1f}s "
          f"(mean loss={float(m['losses'].mean()):.3f})")

    t0 = time.monotonic()
    # the ops package re-exports functions under the module names — import
    # the modules explicitly
    import importlib

    ctc_pallas = importlib.import_module("lightning_asr_tpu.ops.ctc_pallas")
    lstm_pallas = importlib.import_module("lightning_asr_tpu.ops.lstm_pallas")
    from lightning_asr_tpu.ops.lstm import LSTMWeights

    lp = jax.nn.log_softmax(
        jnp.asarray(rng_np.standard_normal((4, 96, 29)).astype(np.float32)), -1)
    ctc_pallas.ctc_loss_pallas(
        lp, jnp.full((4,), 96, jnp.int32),
        jnp.asarray(rng_np.integers(0, 28, (4, 24)).astype(np.int32)),
        jnp.full((4,), 24, jnp.int32), blank_id=28).block_until_ready()
    H = 40
    s = 1.0 / np.sqrt(H)
    w = LSTMWeights(
        w_ih=jnp.asarray(rng_np.uniform(-s, s, (4 * H, 64)).astype(np.float32)),
        w_hh=jnp.asarray(rng_np.uniform(-s, s, (4 * H, H)).astype(np.float32)),
        b_ih=jnp.zeros((4 * H,)), b_hh=jnp.zeros((4 * H,)))
    lstm_pallas.lstm_pallas(
        jnp.asarray(rng_np.standard_normal((4, 96, 64)).astype(np.float32)),
        jnp.full((4,), 96, jnp.int32), w, w).block_until_ready()
    print(f"pallas kernels compiled+ran in {time.monotonic() - t0:.1f}s")

    # heavy-test graph variants (the slow tier's other big compiles): the
    # grad-accum scanned step and the gradient-clipping optax chain
    # (tests/test_grad_accum.py) — tp graphs stay per-test (their meshes
    # reshape the device grid, which cannot be primed from here)
    t0 = time.monotonic()
    import optax

    clip_opt = optax.chain(optax.clip(0.5), opt)
    accum_state = create_train_state(model, clip_opt, rng, feature_shape=(1, 128, 64))
    accum_state = jax.device_put(accum_state, replicated_sharding(mesh))
    accum_step = jax.jit(
        make_train_step(model, clip_opt, 28, cfg, augment=True,
                        accum_steps=2),
        donate_argnums=(0,))
    accum_step(accum_state, batch, rng)
    print(f"accum+clip step compiled+ran in {time.monotonic() - t0:.1f}s")
    print("CACHE PRIMED")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    prime_tpu() if args.tpu else prime_cpu()
