#!/usr/bin/env python
"""Benchmark: training throughput (audio-sec/sec/chip) of the flagship
QuartNet12-context CTC stack — full train step (on-device mel frontend +
SpecAugment + fwd/bwd + NovoGrad), on synthetic utterances at the reference
batch size 32.

Two numbers are reported in ONE JSON line:

  * ``value`` — the 16.7 s single-bucket rate (the headline metric, kept
    across rounds for continuity);
  * ``weighted_value`` — a duration-weighted aggregate over the training
    bucket ladder (``data/pipeline.py:40``) under a LibriSpeech-like
    duration histogram: the rate a real epoch mixing those buckets would
    sustain (harmonic mean of per-bucket rates weighted by audio share),
    with ``per_bucket`` rates alongside so any other corpus histogram can
    be re-aggregated.

``large_batch_16.7s`` adds bs=64/128 points on the headline bucket — the
reference is locked to bs=32 by GPU memory; TPU HBM is not, and larger
batches amortize the BiLSTM recurrence (the step's serial fraction).

Baseline: the reference trains LibriSpeech-960 at ~50 min/epoch on an
RTX 2060 (``/root/reference/README.md:57``) => 960*3600 / 3000 s ≈ 1152
audio-seconds processed per wall-second.  ``vs_baseline`` is our
throughput / 1152 (target: ≥5x per chip, BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# Training bucket ladder (data/pipeline.py:40, <= the 16.7 s train cap) with
# approximate LibriSpeech-960 audio-share weights: utterances are segmented
# close to the cap, so most AUDIO lives in the top buckets; the tail of
# short utterances carries little audio mass.  Weights are the fraction of
# total audio seconds falling in (prev, sec].
SWEEP = [
    (2.0, 0.01),
    (4.0, 0.03),
    (6.0, 0.05),
    (8.0, 0.07),
    (10.0, 0.09),
    (12.0, 0.12),
    (14.0, 0.18),
    (16.7, 0.45),
]
CHARS_PER_SEC = 224 / 16.7  # reference-like transcript density


def bench_bucket(model, optimizer, frontend, seconds: float, B: int = 32,
                 n_windows: int = 3, num_classes: int = 29,
                 chars_per_sec: float = CHARS_PER_SEC,
                 want_cost: bool = False):
    """Best-window throughput (audio-sec/sec) for one duration bucket.

    With ``want_cost`` returns ``(rate, flops_per_step)`` using the SAME
    jitted step (the lower/compile hits the in-process jit cache — no
    second remote Mosaic compile)."""
    from lightning_asr_tpu.training.steps import create_train_state, make_train_step

    S = int(seconds * 16000)
    L = max(int(seconds * chars_per_sec), 4)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, optimizer, rng, feature_shape=(1, 320, 64))

    rng_np = np.random.default_rng(0)
    batch = {
        "waves": jax.device_put((rng_np.standard_normal((B, S)) * 0.1).astype(np.float32)),
        "wave_lens": jax.device_put(np.full((B,), S, np.int32)),
        "prev_samples": jax.device_put(np.zeros((B,), np.float32)),
        "targets": jax.device_put(
            rng_np.integers(0, num_classes - 1, size=(B, L)).astype(np.int32)),
        "target_lens": jax.device_put(np.full((B,), L, np.int32)),
    }

    train_step = jax.jit(
        make_train_step(model, optimizer, blank_id=num_classes - 1,
                        frontend=frontend, augment=True),
        donate_argnums=(0,),
    )

    flops = None
    if want_cost:
        try:
            cost = train_step.lower(state, batch, rng).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", float("nan")))
        except Exception:
            pass  # cost analysis unsupported on some backends

    # compile + warmup
    state, metrics = train_step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    state, metrics = train_step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])

    # short buckets need more steps per window for a stable measurement
    n_steps = max(15, int(round(15 * 16.7 / seconds / 5) * 5))
    best_dt = float("inf")
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = train_step(state, batch, rng)
        jax.block_until_ready(metrics["loss"])
        float(jnp.sum(metrics["loss"]))  # force a real host sync
        best_dt = min(best_dt, time.perf_counter() - t0)
    rate = B * seconds * n_steps / best_dt
    return (rate, flops) if want_cost else rate


def main() -> None:
    from lightning_asr_tpu.utils.logging import enable_compile_cache

    enable_compile_cache()
    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.optim import cosine_annealing_warmup_restarts, novograd
    from lightning_asr_tpu.ops.frontend import MelFrontendConfig

    model = build_model(num_classes=29, encoder="quartznet12_context", mask=True,
                        dtype=jnp.bfloat16)
    schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=100000, cycle_mult=2, max_lr=1e-2, min_lr=1e-4,
        warmup_steps=1000, gamma=0.5)
    optimizer = novograd(schedule, betas=(0.8, 0.5), weight_decay=1e-3)
    # training frontend: 1-pass bf16 MXU DFT (parity mode "highest" is for
    # eval/goldens; post-normalization the rare dB error is ~0.07 sigma)
    frontend = MelFrontendConfig(precision="default")

    per_bucket = {}
    headline_flops = None
    for seconds, _ in SWEEP:
        if seconds == 16.7:  # capture step FLOPs from the same jitted step
            per_bucket[seconds], headline_flops = bench_bucket(
                model, optimizer, frontend, seconds, want_cost=True)
        else:
            per_bucket[seconds] = bench_bucket(model, optimizer, frontend, seconds)

    # beyond reference parity: the reference is locked to bs=32 by GPU
    # memory (/root/reference/conf/conf.yaml:24); larger batches amortize
    # the BiLSTM recurrence + per-step overheads on TPU.  Report the
    # large-batch points separately so `value` stays the bs=32
    # apples-to-apples number.
    large_batch = {}
    for B in (64, 128):
        try:
            large_batch[B] = bench_bucket(model, optimizer, frontend, 16.7, B=B)
        except Exception as e:  # HBM-bound on smaller parts: report what fits
            large_batch[f"bs{B}_error"] = f"{type(e).__name__}: {e}"[:200]
            break

    headline = per_bucket[16.7]
    # epoch-mix rate: total audio / total time = 1 / sum(w_b / rate_b)
    weighted = 1.0 / sum(w / per_bucket[s] for s, w in SWEEP)

    # MFU at the headline point: whole-train-step FLOPs from XLA's cost
    # analysis of the SAME compiled step the sweep timed (fwd+bwd+NovoGrad,
    # everything in the jitted graph) divided by measured step time and chip
    # peak (v5e bf16 ~197 TFLOP/s; override LASR_PEAK_TFLOPS for other
    # parts).  Small-channel conv+recurrence nets are bandwidth-shaped, so
    # this contextualizes the audio-sec/s number; see ROOFLINE.json for the
    # per-op-class bound attribution.
    mfu = None
    if headline_flops is not None and np.isfinite(headline_flops) and headline_flops > 0:
        import os

        from lightning_asr_tpu.ops.frontend import mel_num_frames, mel_pallas_enabled

        if mel_pallas_enabled():
            # the fused DFT+power+mel Pallas kernel's MXU work is a custom
            # call XLA's cost analysis cannot see — add its semantic FLOPs
            # back so mfu stays comparable across kernel on/off
            T_mel = int(mel_num_frames(int(16.7 * 16000)))
            headline_flops += 2 * 32 * T_mel * 512 * 514 + 2 * 32 * T_mel * 257 * 64
        peak = float(os.environ.get("LASR_PEAK_TFLOPS", "197")) * 1e12
        mfu = round(headline_flops * headline / (32 * 16.7) / peak, 4)

    # AISHELL-1 configuration (directive r3#7): decoder 1024 -> 4334
    # (/root/reference/data/aishell1-vocab.txt 4333 chars + blank,
    # train.py:216-219) — certifies the CER path's throughput with CTC /
    # log-softmax / the one-hot emission matmul at full vocab.  ~5 chars/sec
    # transcript density (AISHELL-1: ~400k utts, ~14 chars / ~3 s).
    cn = {}
    try:
        cn_model = build_model(num_classes=4334, encoder="quartznet12_context",
                               mask=True, dtype=jnp.bfloat16)
        cn_rate = bench_bucket(cn_model, optimizer, frontend, 16.7, B=32,
                               num_classes=4334, chars_per_sec=5.0)
        cn = {"audio_sec_per_sec": round(cn_rate, 1),
              "step_ms": round(32 * 16.7 / cn_rate * 1000, 2)}
    except Exception as e:
        cn = {"error": f"{type(e).__name__}: {e}"[:200]}

    baseline = 960 * 3600 / (50 * 60.0)  # ≈1152 audio-sec/sec (RTX 2060, 960h)
    print(json.dumps({
        "metric": "train_throughput_audio_sec_per_sec_per_chip",
        "value": round(headline, 1),
        "unit": "audio-sec/sec",
        "vs_baseline": round(headline / baseline, 3),
        "weighted_value": round(weighted, 1),
        "weighted_vs_baseline": round(weighted / baseline, 3),
        "per_bucket": {str(s): round(v, 1) for s, v in per_bucket.items()},
        "weights": {str(s): w for s, w in SWEEP},
        "large_batch_16.7s": {
            (b if isinstance(b, str) else f"bs{b}"):
                (round(v, 1) if isinstance(v, float) else v)
            for b, v in large_batch.items()},
        "mfu_headline": mfu,
        "cn_vocab_4334": cn,
    }))


if __name__ == "__main__":
    main()
