"""Jitted train/eval steps — frontend + model + CTC + optimizer in ONE graph.

The reference splits work host/device: CPU dataloader workers compute mels,
the GPU runs forward/backward, python steps the optimizer and scheduler
(``/root/reference/train.py:64-86``).  Here one jitted function consumes raw
waveform batches and performs: dither/preemph/STFT/mel/dB (on MXU),
SpecAugment, normalization, the QuartzNet forward, CTC loss, backward,
NovoGrad + schedule — fused by XLA with zero host round-trips per step.

Data parallelism: the Trainer device_puts batch arrays with a ``data``-axis
sharding and keeps state replicated; XLA inserts the gradient all-reduce
over ICI from those annotations (pjit "computation follows sharding").

NaN guard (SURVEY §5.3 — the reference documents NaN loss as a real failure
mode on 960h): when the loss is non-finite the whole state update is skipped
in-graph and a counter increments, so one bad batch cannot poison training.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..ops.augment import cutout, spec_augment, wave_crop
from ..ops.ctc import ctc_loss as ctc_loss_scan
from ..ops.ctc_pallas import ctc_loss_pallas as ctc_loss
from ..ops.frontend import MelFrontendConfig, log_mel_spectrogram, normalize_features


@flax.struct.dataclass
class AsrTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    nan_count: jnp.ndarray


def create_train_state(model, optimizer, rng, feature_shape=(1, 320, 64)) -> AsrTrainState:
    """Initialize parameters/batch stats with a dummy batch."""
    dummy = jnp.zeros(feature_shape, jnp.float32)
    percents = jnp.ones((feature_shape[0],), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, dummy, percents, False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return AsrTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        nan_count=jnp.zeros((), jnp.int32),
    )


def _guarded_update(state, optimizer, loss, grads, new_stats, log_probs, out_lens):
    """Optimizer update + in-graph NaN-skip guard + step metrics — shared by
    every train-step variant."""
    updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    finite = jnp.isfinite(loss)
    keep = lambda new, old: jax.tree.map(lambda a, b: jnp.where(finite, a, b), new, old)
    new_state = AsrTrainState(
        step=state.step + 1,
        params=keep(new_params, state.params),
        batch_stats=keep(new_stats, state.batch_stats),
        opt_state=keep(new_opt_state, state.opt_state),
        nan_count=state.nan_count + jnp.where(finite, 0, 1),
    )
    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        "finite": finite,
        "preds": jnp.argmax(log_probs, axis=-1).astype(jnp.int32),
        "pred_lens": out_lens,
    }
    return new_state, metrics


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    blank_id: int,
    frontend: MelFrontendConfig = MelFrontendConfig(),
    augment: bool | str | None = True,
    freq_mask: float | int = 27,
    time_mask: float | int = 0.07,
    from_features: bool = False,
    normalize: bool = True,
    crop: bool = False,
    crop_weight: float = 0.98,
    accum_steps: int = 1,
) -> Callable:
    """Build the jitted train step.

    If ``from_features`` the batch carries precomputed features
    (``waves`` = (B, T, F), ``wave_lens`` = frame counts) — the SSL path,
    which uses ``augment='cutout'`` (features_cutout, 5 rects up to 150x100,
    ``ssl_data_module.py:332-350``) and no per-utterance normalization.
    ``augment`` True/'specaugment' applies the mel SpecAugment; None/False
    disables augmentation.  ``crop`` applies the reference's random wave
    crop IN-GRAPH (``ops.augment.wave_crop``) — used by ``device_cache``
    mode, whose HBM-resident batches carry uncropped waveforms so every
    replay epoch re-rolls the crop like the host loader does per epoch
    (``/root/reference/data_module.py:138-148``).

    ``accum_steps`` > 1 is gradient accumulation, TPU-inverted relative to
    the reference's ``accumulate_grad_batches`` (``train.py:244``): instead
    of holding grads across k loader batches, the step splits ONE (k×
    larger) device batch into k sequential micro-batches under
    ``lax.scan`` — forward/backward activations live for one micro-batch
    at a time, so the effective batch grows k× past the HBM activation
    ceiling while XLA still sees a single fused graph and the optimizer
    updates once per step.  BN batch stats update per micro-batch
    (sequentially carried), matching what k separate small batches would
    do.  The batch size must divide by ``accum_steps``.
    """
    if augment is True:
        augment = "specaugment"
    elif augment is False:
        augment = None

    def train_step(state: AsrTrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        r_dither, r_spec, r_drop = jax.random.split(step_rng, 3)

        if from_features:
            feats, feat_lens = batch["waves"], batch["wave_lens"]
        else:
            waves, wave_lens = batch["waves"], batch["wave_lens"]
            prev_samples = batch.get("prev_samples")
            if crop:
                # separate stream so the dither/augment/dropout streams stay
                # identical to the crop-off graph
                r_crop = jax.random.fold_in(step_rng, 7919)
                waves, wave_lens, prev_samples = wave_crop(
                    waves, wave_lens, r_crop, crop_weight)
            feats, feat_lens = log_mel_spectrogram(
                waves, wave_lens, frontend,
                rng=r_dither if frontend.dither > 0 else None,
                prev_samples=prev_samples,
            )
        if augment == "specaugment":
            feats = spec_augment(feats, feat_lens, r_spec, freq_mask, time_mask)
        elif augment == "cutout":
            feats = cutout(feats, r_spec, rect_masks=5, rect_freq=150, rect_time=100)
        if normalize:
            feats = normalize_features(feats, feat_lens)
        percents = feat_lens.astype(jnp.float32) / jnp.float32(feats.shape[1])

        def loss_fn(params, stats, feats_m, percents_m, targets_m, tlens_m, rd):
            (log_probs, out_lens), mutated = model.apply(
                {"params": params, "batch_stats": stats},
                feats_m, percents_m, True,
                rngs={"dropout": rd},
                mutable=["batch_stats"],
            )
            loss = jnp.mean(
                ctc_loss(log_probs, out_lens, targets_m, tlens_m, blank_id)
            )
            return loss, (mutated["batch_stats"], log_probs, out_lens)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum_steps <= 1:
            (loss, (new_stats, log_probs, out_lens)), grads = grad_fn(
                state.params, state.batch_stats, feats, percents,
                batch["targets"], batch["target_lens"], r_drop)
        else:
            B = feats.shape[0]
            if B % accum_steps:
                raise ValueError(
                    f"batch size {B} must divide by accum_steps={accum_steps}")
            mb = B // accum_steps
            split = lambda x: x.reshape((accum_steps, mb) + x.shape[1:])
            xs = (split(feats), split(percents), split(batch["targets"]),
                  split(batch["target_lens"]),
                  jax.random.split(r_drop, accum_steps))

            def body(carry, x):
                stats, grad_sum, loss_sum = carry
                f, p, t, tl, rd = x
                (l, (nstats, lp, ol)), g = grad_fn(
                    state.params, stats, f, p, t, tl, rd)
                grad_sum = jax.tree.map(jnp.add, grad_sum, g)
                return (nstats, grad_sum, loss_sum + l), (lp, ol)

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, grad_sum, loss_sum), (lp_s, ol_s) = jax.lax.scan(
                body,
                (state.batch_stats, zero_grads, jnp.zeros((), jnp.float32)),
                xs)
            loss = loss_sum / accum_steps
            grads = jax.tree.map(lambda g: g / accum_steps, grad_sum)
            log_probs = lp_s.reshape((B,) + lp_s.shape[2:])
            out_lens = ol_s.reshape((B,))
        return _guarded_update(state, optimizer, loss, grads, new_stats,
                               log_probs, out_lens)

    return train_step


def make_raw_ssl_train_step(
    model,
    optimizer: optax.GradientTransformation,
    blank_id: int,
) -> Callable:
    """Train step for the SSL retrain model (``ssl_codec/retrain.py``): the
    model consumes raw waveforms and contains the trainable wav2vec2 feature
    encoder + cutout augmentation; everything else matches make_train_step."""

    def train_step(state: AsrTrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        r_aug, r_drop = jax.random.split(step_rng)

        def loss_fn(params):
            (log_probs, out_lens), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["waves"], batch["wave_lens"], True,
                rngs={"dropout": r_drop, "augment": r_aug},
                mutable=["batch_stats"],
            )
            loss = jnp.mean(
                ctc_loss(log_probs, out_lens, batch["targets"], batch["target_lens"], blank_id)
            )
            return loss, (mutated["batch_stats"], log_probs, out_lens)

        (loss, (new_stats, log_probs, out_lens)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return _guarded_update(state, optimizer, loss, grads, new_stats,
                               log_probs, out_lens)

    return train_step


def make_raw_ssl_eval_step(model, blank_id: int) -> Callable:
    def eval_step(state: AsrTrainState, batch: dict):
        log_probs, out_lens = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["waves"], batch["wave_lens"], False,
        )
        losses = ctc_loss(log_probs, out_lens, batch["targets"], batch["target_lens"], blank_id)
        return {
            "losses": losses,
            "log_probs": log_probs,
            "preds": jnp.argmax(log_probs, axis=-1).astype(jnp.int32),
            "pred_lens": out_lens,
        }

    return eval_step


def make_dual_train_step(
    model,
    optimizer: optax.GradientTransformation,
    blank_id: int,
    mel_frontend: MelFrontendConfig,
    freq_mask: float | int = 27,
    time_mask: float | int = 0.07,
) -> Callable:
    """Train step for the dual-stream SSL model (``train_ssl_double.py``):
    wav2vec2 features from the host + mel computed on-device from the raw
    waveform (20 ms hop), features_cutout on the wav2vec stream and
    SpecAugment + per-utterance normalization on the mel stream."""

    def train_step(state: AsrTrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        r_dither, r_spec, r_cut, r_drop = jax.random.split(step_rng, 4)

        w2v, w2v_lens = batch["waves"], batch["wave_lens"]
        mel, mel_lens = log_mel_spectrogram(
            batch["raw_waves"], batch["raw_wave_lens"], mel_frontend,
            rng=r_dither if mel_frontend.dither > 0 else None,
        )
        mel = spec_augment(mel, mel_lens, r_spec, freq_mask, time_mask)
        mel = normalize_features(mel, mel_lens)
        w2v = cutout(w2v, r_cut, rect_masks=5, rect_freq=150, rect_time=100)
        percents = w2v_lens.astype(jnp.float32) / jnp.float32(w2v.shape[1])

        def loss_fn(params):
            (log_probs, out_lens), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                w2v, mel, percents, True,
                rngs={"dropout": r_drop}, mutable=["batch_stats"],
            )
            loss = jnp.mean(
                ctc_loss(log_probs, out_lens, batch["targets"], batch["target_lens"], blank_id)
            )
            return loss, (mutated["batch_stats"], log_probs, out_lens)

        (loss, (new_stats, log_probs, out_lens)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return _guarded_update(state, optimizer, loss, grads, new_stats,
                               log_probs, out_lens)

    return train_step


def make_dual_eval_step(model, blank_id: int, mel_frontend: MelFrontendConfig) -> Callable:
    def eval_step(state: AsrTrainState, batch: dict):
        w2v, w2v_lens = batch["waves"], batch["wave_lens"]
        mel, mel_lens = log_mel_spectrogram(
            batch["raw_waves"], batch["raw_wave_lens"], mel_frontend, rng=None)
        mel = normalize_features(mel, mel_lens)
        percents = w2v_lens.astype(jnp.float32) / jnp.float32(w2v.shape[1])
        log_probs, out_lens = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            w2v, mel, percents, False,
        )
        losses = ctc_loss(log_probs, out_lens, batch["targets"], batch["target_lens"], blank_id)
        return {
            "losses": losses,
            "log_probs": log_probs,
            "preds": jnp.argmax(log_probs, axis=-1).astype(jnp.int32),
            "pred_lens": out_lens,
        }

    return eval_step


def make_eval_step(
    model,
    blank_id: int,
    frontend: MelFrontendConfig = MelFrontendConfig(),
    from_features: bool = False,
    normalize: bool = True,
) -> Callable:
    """Eval step: forward in eval mode (running BN stats, no dropout, no
    dither/augment), per-sample CTC losses + argmax for host-side WER."""

    def eval_step(state: AsrTrainState, batch: dict):
        if from_features:
            feats, feat_lens = batch["waves"], batch["wave_lens"]
        else:
            feats, feat_lens = log_mel_spectrogram(
                batch["waves"], batch["wave_lens"], frontend, rng=None,
                prev_samples=batch.get("prev_samples"),
            )
        if normalize:
            feats = normalize_features(feats, feat_lens)
        percents = feat_lens.astype(jnp.float32) / jnp.float32(feats.shape[1])

        log_probs, out_lens = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            feats, percents, False,
        )
        losses = ctc_loss(log_probs, out_lens, batch["targets"], batch["target_lens"], blank_id)
        return {
            "losses": losses,
            "log_probs": log_probs,
            "preds": jnp.argmax(log_probs, axis=-1).astype(jnp.int32),
            "pred_lens": out_lens,
        }

    return eval_step
