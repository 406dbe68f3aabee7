#!/usr/bin/env python
"""Component-level timing of the train step on the current backend.

Times (compile-excluded): frontend alone, encoder forward, CTC alone,
full forward, full train step — to target optimization work."""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.ops.ctc import ctc_loss
    from lightning_asr_tpu.ops.frontend import MelFrontendConfig, log_mel_spectrogram, normalize_features
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

    cfg = MelFrontendConfig()
    cfg_fast = MelFrontendConfig(precision="default")

    f_hi = jax.jit(lambda w, l: log_mel_spectrogram(w, l, cfg))
    f_lo = jax.jit(lambda w, l: log_mel_spectrogram(w, l, cfg_fast))
    print(f"frontend (HIGHEST): {timeit(f_hi, waves, wave_lens)*1e3:8.2f} ms")
    print(f"frontend (DEFAULT): {timeit(f_lo, waves, wave_lens)*1e3:8.2f} ms")

    mels, mel_lens = f_hi(waves, wave_lens)
    mels = normalize_features(mels, mel_lens)
    percents = mel_lens.astype(jnp.float32) / mels.shape[1]

    model = build_model(num_classes=29, mask=True)
    variables = model.init({"params": rng, "dropout": rng}, mels[:1, :320], percents[:1], False)

    fwd = jax.jit(lambda v, m, p: model.apply(v, m, p, False))
    print(f"encoder fwd (eval): {timeit(fwd, variables, mels, percents)*1e3:8.2f} ms")

    log_probs, out_lens = fwd(variables, mels, percents)
    ctc = jax.jit(lambda lp, ol: ctc_loss(lp, ol, targets, target_lens, 28).mean())
    print(f"ctc fwd:            {timeit(ctc, log_probs, out_lens)*1e3:8.2f} ms")

    ctc_grad = jax.jit(jax.grad(lambda lp: ctc_loss(lp, out_lens, targets, target_lens, 28).mean()))
    print(f"ctc fwd+bwd:        {timeit(ctc_grad, log_probs)*1e3:8.2f} ms")

    opt = novograd(1e-3, betas=(0.8, 0.5), weight_decay=1e-3)
    state = create_train_state(model, opt, rng)
    step = jax.jit(make_train_step(model, opt, 28, cfg, augment=True))
    batch = {"waves": waves, "wave_lens": wave_lens,
             "prev_samples": jnp.zeros((B,)), "targets": targets, "target_lens": target_lens}

    def run(state):
        s, m = step(state, batch, rng)
        return m["loss"]

    print(f"full train step:    {timeit(run, state)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
