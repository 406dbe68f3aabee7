#!/usr/bin/env python
"""Benchmark: training throughput (audio-sec/sec/chip) of the flagship
QuartNet12-context CTC stack — full train step (on-device mel frontend +
SpecAugment + fwd/bwd + NovoGrad) plus device-side greedy argmax, on
synthetic 16.7s utterances at the reference batch size 32.

Baseline: the reference trains LibriSpeech-960 at ~50 min/epoch on an
RTX 2060 (``/root/reference/README.md:57``) => 960*3600 / 3000 s ≈ 1152
audio-seconds processed per wall-second.  ``vs_baseline`` is our
throughput / 1152 (target: ≥5x per chip, BASELINE.md).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    from lightning_asr_tpu.utils.logging import enable_compile_cache

    enable_compile_cache()
    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.optim import cosine_annealing_warmup_restarts, novograd
    from lightning_asr_tpu.ops.frontend import MelFrontendConfig
    from lightning_asr_tpu.training.steps import create_train_state, make_train_step

    B = 32
    SECONDS = 16.7
    S = int(SECONDS * 16000)

    model = build_model(num_classes=29, encoder="quartznet12_context", mask=True,
                        dtype=jnp.bfloat16)
    schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=100000, cycle_mult=2, max_lr=1e-2, min_lr=1e-4,
        warmup_steps=1000, gamma=0.5)
    optimizer = novograd(schedule, betas=(0.8, 0.5), weight_decay=1e-3)

    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, optimizer, rng, feature_shape=(1, 320, 64))
    # training frontend: 1-pass bf16 MXU DFT (parity mode "highest" is for
    # eval/goldens; post-normalization the rare dB error is ~0.07 sigma)
    frontend = MelFrontendConfig(precision="default")

    rng_np = np.random.default_rng(0)
    # ~200 chars of target text for a 16.7s utterance
    batch = {
        "waves": jax.device_put((rng_np.standard_normal((B, S)) * 0.1).astype(np.float32)),
        "wave_lens": jax.device_put(np.full((B,), S, np.int32)),
        "prev_samples": jax.device_put(np.zeros((B,), np.float32)),
        "targets": jax.device_put(rng_np.integers(0, 28, size=(B, 224)).astype(np.int32)),
        "target_lens": jax.device_put(np.full((B,), 224, np.int32)),
    }

    train_step = jax.jit(
        make_train_step(model, optimizer, blank_id=28, frontend=frontend,
                        augment=True),
        donate_argnums=(0,),
    )

    # compile + warmup
    state, metrics = train_step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    state, metrics = train_step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])

    # best of 3 windows — the tunneled backend has ~4% run-to-run variance
    n_steps = 15
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = train_step(state, batch, rng)
        jax.block_until_ready(metrics["loss"])
        float(jnp.sum(metrics["loss"]))  # force a real host sync
        best_dt = min(best_dt, time.perf_counter() - t0)

    audio_sec_per_sec = B * SECONDS * n_steps / best_dt
    baseline = 960 * 3600 / (50 * 60.0)  # ≈1152 audio-sec/sec (RTX 2060, 960h)
    print(json.dumps({
        "metric": "train_throughput_audio_sec_per_sec_per_chip",
        "value": round(audio_sec_per_sec, 1),
        "unit": "audio-sec/sec",
        "vs_baseline": round(audio_sec_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
