#!/usr/bin/env python
"""Component-level timing of the train step on the current backend.

Uses chained data dependencies (output feeds next input) with a final host
fetch — `block_until_ready` alone under-reports on tunneled backends — and
consumes all gradients so XLA cannot DCE backward passes."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import optax


def chain_time(fn, x0, n=10):
    x = fn(x0)
    float(jnp.sum(x))  # compile + settle
    t0 = time.perf_counter()
    x = x0
    for _ in range(n):
        x = fn(x)
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.ops.ctc_pallas import ctc_loss_pallas
    from lightning_asr_tpu.ops.frontend import (
        MelFrontendConfig, log_mel_spectrogram, normalize_features)
    from lightning_asr_tpu.optim import novograd
    from lightning_asr_tpu.training.steps import create_train_state, make_train_step

    B, SECONDS = 32, 16.7
    S = int(SECONDS * 16000)
    rng = jax.random.PRNGKey(0)
    rng_np = np.random.default_rng(0)

    waves = jnp.asarray((rng_np.standard_normal((B, S)) * 0.1).astype(np.float32))
    wave_lens = jnp.full((B,), S, jnp.int32)
    targets = jnp.asarray(rng_np.integers(0, 28, size=(B, 224)).astype(np.int32))
    target_lens = jnp.full((B,), 224, jnp.int32)
    cfg = MelFrontendConfig(precision="default")

    @jax.jit
    def fe(w):
        m, ml = log_mel_spectrogram(w, wave_lens, cfg, rng=rng)
        return w + jnp.sum(normalize_features(m, ml)) * 1e-12
    print(f"frontend+norm:     {chain_time(fe, waves):8.2f} ms")

    model = build_model(num_classes=29, mask=True, dtype=jnp.bfloat16)
    mels, mel_lens = jax.jit(lambda w: log_mel_spectrogram(w, wave_lens, cfg))(waves)
    mels = normalize_features(mels, mel_lens)
    percents = mel_lens.astype(jnp.float32) / mels.shape[1]
    variables = model.init({"params": rng, "dropout": rng}, mels[:1, :320], percents[:1], False)
    params, bstats = variables["params"], variables.get("batch_stats", {})

    @jax.jit
    def enc_fb(m):
        def loss(p):
            (lp, ol), _ = model.apply({"params": p, "batch_stats": bstats}, m, percents,
                                      True, rngs={"dropout": rng}, mutable=["batch_stats"])
            return jnp.mean(ctc_loss_pallas(lp, ol, targets, target_lens, 28))
        l, g = jax.value_and_grad(loss)(params)
        return m + (l + optax.global_norm(g)) * 1e-9
    print(f"model f+b + ctc:   {chain_time(enc_fb, mels):8.2f} ms")

    opt = novograd(1e-3, betas=(0.8, 0.5), weight_decay=1e-3)
    state = create_train_state(model, opt, rng)
    step = jax.jit(make_train_step(model, opt, 28, cfg, augment=True), donate_argnums=(0,))
    batch = {"waves": waves, "wave_lens": wave_lens,
             "prev_samples": jnp.zeros((B,)), "targets": targets, "target_lens": target_lens}
    state, m = step(state, batch, rng); float(m["loss"])
    state, m = step(state, batch, rng); float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = step(state, batch, rng)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"full train step:   {dt:8.2f} ms  ({B * SECONDS / (dt / 1e3):.0f} audio-sec/sec)")


if __name__ == "__main__":
    main()
