#!/usr/bin/env python
"""A/B: BiLSTM direction overlap (VERDICT r2 #6) on the real chip.

The context BiLSTM's fw/bw recurrences are independent but ran serially as
two Pallas kernel calls (~5.2 ms of a ~28 ms step).  The batch-stacked
variant ("2x-batch layout") advances both directions in ONE sequential loop
— backward rides as extra batch rows with a per-direction split matmul —
same total MXU FLOPs, half the sequential depth.  (The earlier lane-packed
variant paid 4x FLOPs and measured slower; this one does not.)

Measures, at the flagship shapes (B=32, T=835, IN=256, H=40):
  1. isolated BiLSTM fwd+bwd: two-kernel vs batch-stacked;
  2. the full train step with each variant.

Writes LSTM_OVERLAP.json.  Timing: chained data dependencies + final host
fetch (block_until_ready under-reports through the tunnel).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
import sys

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def time_fn(fn, args, n_steps=20, n_windows=3):
    """Best-window seconds/call; fn must return a pytree of arrays."""
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            out = fn(*args)
        jax.block_until_ready(out)
        float(jnp.sum(jax.tree.leaves(out)[0]))  # real host sync
        best = min(best, time.perf_counter() - t0)
    return best / n_steps


def bench_isolated() -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from lightning_asr_tpu.ops.lstm_pallas import lstm_pallas
    from tests.test_lstm_pallas import make_weights

    B, T, IN, H = 32, 835, 256, 40
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, IN)).astype(np.float32))
    lens = jnp.asarray(
        rng.integers(int(T * 0.9), T + 1, size=B).astype(np.int32))
    fw = make_weights(rng, IN, H)
    bw = make_weights(rng, IN, H)

    def make(fuse):
        def loss(x, fw, bw):
            out = lstm_pallas(x, lens, fw, bw, fuse_directions=fuse)
            return jnp.sum(out * out)

        def step(x, fw, bw):
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, fw, bw)
            # consume ALL grads or XLA DCEs the backward
            return l + optax.global_norm(grads)

        return jax.jit(step)

    res = {}
    for name, fuse in (("two_kernel_ms", False), ("batch_stacked_ms", True)):
        res[name] = round(time_fn(make(fuse), (x, fw, bw)) * 1e3, 3)
    return res


def bench_full_step(fuse: bool) -> float:
    """Full flagship train step sec/step with the given LSTM variant."""
    import jax
    import jax.numpy as jnp

    os.environ["LASR_LSTM_FUSED_BIDIR"] = "1" if fuse else "0"
    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.ops.frontend import MelFrontendConfig
    from lightning_asr_tpu.optim import cosine_annealing_warmup_restarts, novograd
    from lightning_asr_tpu.training.steps import create_train_state, make_train_step

    B, SECONDS = 32, 16.7
    S = int(SECONDS * 16000)
    model = build_model(num_classes=29, encoder="quartznet12_context", mask=True,
                        dtype=jnp.bfloat16)
    schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=100000, cycle_mult=2, max_lr=1e-2, min_lr=1e-4,
        warmup_steps=1000, gamma=0.5)
    optimizer = novograd(schedule, betas=(0.8, 0.5), weight_decay=1e-3)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, optimizer, rng, feature_shape=(1, 320, 64))
    rng_np = np.random.default_rng(0)
    batch = {
        "waves": jax.device_put((rng_np.standard_normal((B, S)) * 0.1).astype(np.float32)),
        "wave_lens": jax.device_put(np.full((B,), S, np.int32)),
        "prev_samples": jax.device_put(np.zeros((B,), np.float32)),
        "targets": jax.device_put(rng_np.integers(0, 28, size=(B, 224)).astype(np.int32)),
        "target_lens": jax.device_put(np.full((B,), 224, np.int32)),
    }
    train_step = jax.jit(
        make_train_step(model, optimizer, blank_id=28,
                        frontend=MelFrontendConfig(precision="default"),
                        augment=True))
    state, metrics = train_step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    n_steps, best = 15, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = train_step(state, batch, rng)
        jax.block_until_ready(metrics["loss"])
        float(jnp.sum(metrics["loss"]))
        best = min(best, time.perf_counter() - t0)
    return best / n_steps


def main() -> None:
    from lightning_asr_tpu.utils import enable_compile_cache

    enable_compile_cache()
    iso = bench_isolated()
    step_two = bench_full_step(False)
    step_fused = bench_full_step(True)
    report = {
        "shapes": "B=32 T=835 IN=256 H=40 (flagship context BiLSTM)",
        "isolated_fwd_bwd": iso,
        "full_step_two_kernel_ms": round(step_two * 1e3, 2),
        "full_step_batch_stacked_ms": round(step_fused * 1e3, 2),
        "full_step_delta_ms": round((step_two - step_fused) * 1e3, 2),
        "winner": ("batch_stacked" if step_fused < step_two else "two_kernel"),
        "note": ("batch-stacked = both directions in one sequential loop as "
                 "2B batch rows with split per-direction matmuls (same "
                 "FLOPs, half the sequential depth); lane-packed variant "
                 "(4x FLOPs) measured 5.9 vs 5.2 ms in round 2 and stays "
                 "rejected."),
    }
    out = Path(__file__).resolve().parents[1] / "LSTM_OVERLAP.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
