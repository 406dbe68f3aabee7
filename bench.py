#!/usr/bin/env python
"""Benchmark: training throughput (audio-sec/sec/chip) of the flagship
QuartNet12-context CTC stack — full train step (on-device mel frontend +
SpecAugment + fwd/bwd + NovoGrad), on synthetic utterances at the reference
batch size 32.

Driver-proof by construction (VERDICT r4 #1): the harness that runs this
script has a hard timeout, and the tunneled device client can wedge for
15-20 min before the FIRST device op (CLAUDE.md).  This script therefore

  * probes the first device op on a daemon thread with a timeout — a wedge
    produces a diagnostic JSON line (``{"error": "tunnel_wedge", ...}``),
    never silence;
  * measures the HEADLINE bucket first, then the rest in descending
    importance, flushing a partial artifact (``BENCH_PARTIAL.json``) after
    every stage;
  * enforces an internal wall-clock budget (``LASR_BENCH_BUDGET_S``,
    default 330 s) with a watchdog thread that prints whatever has been
    measured and exits 0 — stdout carries EXACTLY one JSON line on every
    path.

Two primary numbers are reported:

  * ``value`` — the 16.7 s single-bucket rate (the headline metric, kept
    across rounds for continuity);
  * ``weighted_value`` — a duration-weighted aggregate over the training
    bucket ladder (``data/pipeline.py:40``) under a LibriSpeech-like
    duration histogram (harmonic mean of per-bucket rates weighted by
    audio share); null if the budget expired before the full sweep, with
    ``per_bucket`` rates alongside for re-aggregation.

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
import os
import sys
import threading
import time

import numpy as np

BASELINE = 960 * 3600 / (50 * 60.0)  # ≈1152 audio-sec/sec (RTX 2060, 960h)
BUDGET_S = float(os.environ.get("LASR_BENCH_BUDGET_S", "330"))
PROBE_TIMEOUT_S = float(os.environ.get("LASR_BENCH_PROBE_S", "180"))
_T0 = time.monotonic()

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

# ---------------------------------------------------------------------------
# exactly-once result emission, shared between the main thread, the watchdog
# and the probe path
# ---------------------------------------------------------------------------

_emit_lock = threading.Lock()
_emitted = False
_result: dict = {
    "metric": "train_throughput_audio_sec_per_sec_per_chip",
    "value": None,
    "unit": "audio-sec/sec",
    "vs_baseline": None,
    "weighted_value": None,
    "weighted_vs_baseline": None,
    "per_bucket": {},
    "weights": {str(s): w for s, w in SWEEP},
    "large_batch_16.7s": {},
    "mfu_headline": None,
    "cn_vocab_4334": {},
    "stages_done": [],
    "stages_skipped": [],
    "elapsed_s": None,
    "budget_s": BUDGET_S,
}


def _snapshot() -> dict:
    out = dict(_result)
    out["elapsed_s"] = round(time.monotonic() - _T0, 1)
    return out


def _flush_partial() -> None:
    """Persist the running partial result next to the script (atomic)."""
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_PARTIAL.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(_snapshot(), f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except Exception:
        pass  # the partial artifact is best-effort; stdout is the contract


def _emit_and_exit(code: int = 0, **extra) -> None:
    """Print EXACTLY one JSON line on stdout and hard-exit.

    ``os._exit`` (not ``sys.exit``) so a device op stuck in a C extension on
    another thread cannot block process teardown.
    """
    global _emitted
    with _emit_lock:
        if _emitted:
            os._exit(code)
        _emitted = True
        _result.update(extra)
        snap = _snapshot()
        _flush_partial()
        sys.stdout.write(json.dumps(snap) + "\n")
        sys.stdout.flush()
    os._exit(code)


def _watchdog() -> None:
    """Emit whatever has been measured when the budget expires."""
    while True:
        left = BUDGET_S - (time.monotonic() - _T0)
        if left <= 0:
            break
        time.sleep(min(left, 2.0))
    _emit_and_exit(0, note="internal wall-clock budget expired; "
                           "partial results emitted (stages_skipped lists "
                           "what was not measured)")


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _update_weighted() -> None:
    """Epoch-mix rate 1 / sum(w_b / rate_b), refreshed after EVERY bucket so
    the watchdog snapshot always carries the best current estimate.  The
    exact number needs the full histogram; with a budget-cut sweep
    (per-bucket Mosaic/XLA compiles are NOT persisted across processes on
    the tunneled backend, ~90 s each) a renormalized estimate over the
    measured buckets is emitted, clearly labeled — the sweep runs
    heaviest-weighted first, so measured buckets cover most of the audio
    mass and per-bucket rates differ by only a few percent."""
    measured = [(s, w) for s, w in SWEEP if str(s) in _result["per_bucket"]]
    if not measured:
        return
    wsum = sum(w for _, w in measured)
    weighted = wsum / sum(w / _result["per_bucket"][str(s)] for s, w in measured)
    if len(measured) == len(SWEEP):
        _result["weighted_value"] = round(weighted, 1)
        _result["weighted_vs_baseline"] = round(weighted / BASELINE, 3)
        _result.pop("weighted_value_partial", None)
        _result.pop("weighted_vs_baseline_partial", None)
        _result.pop("weighted_note", None)
    else:
        _result["weighted_value_partial"] = round(weighted, 1)
        _result["weighted_vs_baseline_partial"] = round(weighted / BASELINE, 3)
        _result["weighted_note"] = (
            f"renormalized over the {len(measured)}/{len(SWEEP)} measured "
            f"buckets covering {wsum:.0%} of the audio-mass histogram")


def _probe_first_device_op() -> None:
    """Force one tiny device round-trip on a daemon thread with a timeout.

    A fresh process can sit futex-waiting on the tunnel before its first
    device op (CLAUDE.md); this converts that silent wedge into a
    diagnostic JSON.  The host fetch (``np.asarray``) is the completion
    signal — ``block_until_ready`` alone is unreliable on this backend.
    """
    done = threading.Event()
    err: list = []

    def _run():
        try:
            import jax

            x = jax.device_put(np.ones((8, 128), np.float32))
            y = jax.numpy.tanh(x) @ x.T
            np.asarray(y)  # host fetch => the op really completed
            done.set()
        except Exception as e:  # pragma: no cover - backend-dependent
            err.append(f"{type(e).__name__}: {e}"[:300])
            done.set()

    threading.Thread(target=_run, daemon=True).start()
    # wait as long as the budget allows while reserving ~140 s for a warm
    # headline measurement — post-exit wedges sometimes clear in minutes
    if not done.wait(timeout=max(min(PROBE_TIMEOUT_S, _remaining() - 140), 10)):
        _emit_and_exit(0, error="tunnel_wedge",
                       note=f"first device op did not complete within "
                            f"{PROBE_TIMEOUT_S:.0f}s — tunneled backend "
                            f"wedged (documented 15-20 min recovery); "
                            f"no throughput could be measured")
    if err:
        _emit_and_exit(0, error="device_init_failed", note=err[0])


# ---------------------------------------------------------------------------
# measurement
# ---------------------------------------------------------------------------

def bench_bucket(model, optimizer, frontend, seconds: float, B: int = 32,
                 n_windows: int = 3, num_classes: int = 29,
                 chars_per_sec: float = CHARS_PER_SEC,
                 want_cost: bool = False):
    """Best-window throughput (audio-sec/sec) for one duration bucket.

    With ``want_cost`` returns ``(rate, flops_per_step)`` using the SAME
    jitted step (the lower/compile hits the in-process jit cache — no
    second remote Mosaic compile)."""
    import jax
    import jax.numpy as jnp

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
    threading.Thread(target=_watchdog, daemon=True).start()
    _flush_partial()
    _probe_first_device_op()
    _result["stages_done"].append("probe")
    _flush_partial()

    import jax.numpy as jnp

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

    # --- stage 1: HEADLINE bucket (most important number first) ------------
    headline, headline_flops = bench_bucket(
        model, optimizer, frontend, 16.7, want_cost=True)
    _result["per_bucket"]["16.7"] = round(headline, 1)
    _result["value"] = round(headline, 1)
    _result["vs_baseline"] = round(headline / BASELINE, 3)
    _result["stages_done"].append("headline_16.7")
    _update_weighted()
    _flush_partial()

    # MFU at the headline point: whole-train-step FLOPs from XLA's cost
    # analysis of the SAME compiled step the sweep timed (fwd+bwd+NovoGrad,
    # everything in the jitted graph) divided by measured step time and chip
    # peak (v5e bf16 ~197 TFLOP/s; override LASR_PEAK_TFLOPS for other
    # parts).  Small-channel conv+recurrence nets are bandwidth-shaped, so
    # this contextualizes the audio-sec/s number; see ROOFLINE.json for the
    # per-op-class bound attribution.
    if headline_flops is not None and np.isfinite(headline_flops) and headline_flops > 0:
        from lightning_asr_tpu.ops.frontend import mel_num_frames, mel_pallas_enabled

        if mel_pallas_enabled():
            # the fused DFT+power+mel Pallas kernel's MXU work is a custom
            # call XLA's cost analysis cannot see — add its semantic FLOPs
            # back so mfu stays comparable across kernel on/off
            T_mel = int(mel_num_frames(int(16.7 * 16000)))
            headline_flops += 2 * 32 * T_mel * 512 * 514 + 2 * 32 * T_mel * 257 * 64
        peak = float(os.environ.get("LASR_PEAK_TFLOPS", "197")) * 1e12
        _result["mfu_headline"] = round(
            headline_flops * headline / (32 * 16.7) / peak, 4)
        _flush_partial()

    # --- stage 2: the rest of the sweep, longest (heaviest-weighted) first -
    # each bucket is ~10-20 s warm; skip the remainder when the budget nears
    rest = [s for s, _ in SWEEP if s != 16.7][::-1]
    for seconds in rest:
        if _remaining() < 30:
            _result["stages_skipped"].extend(
                f"bucket_{s}" for s in rest if str(s) not in _result["per_bucket"])
            break
        rate = bench_bucket(model, optimizer, frontend, seconds)
        _result["per_bucket"][str(seconds)] = round(rate, 1)
        _result["stages_done"].append(f"bucket_{seconds}")
        _update_weighted()
        _flush_partial()


    # --- stage 3: beyond reference parity — large batches ------------------
    # the reference is locked to bs=32 by GPU memory
    # (/root/reference/conf/conf.yaml:24); larger batches amortize the
    # BiLSTM recurrence + per-step overheads on TPU.  Reported separately so
    # `value` stays the bs=32 apples-to-apples number.
    for B in (64, 128):
        if _remaining() < 45:
            _result["stages_skipped"].append(f"bs{B}")
            continue
        try:
            rate = bench_bucket(model, optimizer, frontend, 16.7, B=B)
            _result["large_batch_16.7s"][f"bs{B}"] = round(rate, 1)
            _result["stages_done"].append(f"bs{B}")
        except Exception as e:  # HBM-bound on smaller parts: report what fits
            _result["large_batch_16.7s"][f"bs{B}_error"] = \
                f"{type(e).__name__}: {e}"[:200]
            break
        _flush_partial()

    # --- stage 4: AISHELL-1 configuration (directive r3#7) -----------------
    # decoder 1024 -> 4334 (/root/reference/data/aishell1-vocab.txt 4333
    # chars + blank, train.py:216-219) — certifies the CER path's throughput
    # with CTC / log-softmax / the one-hot emission matmul at full vocab.
    # ~5 chars/sec transcript density (AISHELL-1: ~14 chars / ~3 s).
    if _remaining() < 60:
        _result["stages_skipped"].append("cn_vocab_4334")
    else:
        try:
            cn_model = build_model(num_classes=4334, encoder="quartznet12_context",
                                   mask=True, dtype=jnp.bfloat16)
            cn_rate = bench_bucket(cn_model, optimizer, frontend, 16.7, B=32,
                                   num_classes=4334, chars_per_sec=5.0)
            _result["cn_vocab_4334"] = {
                "audio_sec_per_sec": round(cn_rate, 1),
                "step_ms": round(32 * 16.7 / cn_rate * 1000, 2)}
            _result["stages_done"].append("cn_vocab_4334")
        except Exception as e:
            _result["cn_vocab_4334"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        _flush_partial()

    _emit_and_exit(0)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # any crash still yields one parseable JSON line
        import traceback

        _emit_and_exit(0, error=f"{type(e).__name__}: {e}"[:300],
                       note=traceback.format_exc()[-1000:])
