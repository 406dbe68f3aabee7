"""Training-time augmentation, matching the reference's semantics.

Reference (``/root/reference/data_module.py``):
  * ``sub_secquence`` (:138-148): random waveform crop, applied pre-mel.
    ``target_length = int(L * U(0.98, 1))``, ``location = int(U(0, L -
    target_length))``, slice ``x[location:target_length]`` — the slice end is
    ``target_length`` (not location+target_length), so the effective crop is
    ``[location, target_length)``.  Host-side here (it changes lengths and
    feeds bucketing); returns (offset, new_length).
  * ``spec_augment`` (:97-122): ONE random frequency band (width ~ U(0, 27))
    and ONE random time band zeroed across the full other axis.  A float
    ``time_mask`` is **proportional to the true T** (:108-109) — the
    length-proportional masking the reference README credits with fixing NaN
    loss on 960h.  Runs on-device over the padded batch, widths driven by
    per-sample true lengths.  Masked cells are set to 0 dB *before*
    normalization, like the reference.
  * ``cutout`` (:75-95) and ``sample_aug`` (:124-136): present-but-unused
    extras, provided for parity.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def sub_sequence_crop(
    length: int, rng: np.random.Generator, weight: float = 0.98
) -> Tuple[int, int]:
    """Host-side: pick the reference's crop window for a waveform of
    ``length`` samples. Returns (offset, new_length); slice is
    ``wave[offset : offset + new_length]`` with new_length =
    target_length - offset (reference's ``x[:, location:target_length]``)."""
    target_length = int(length * rng.uniform(weight, 1.0))
    location = int(rng.uniform(0, length - target_length))
    return location, max(target_length - location, 1)


def wave_crop(
    waves: jnp.ndarray,
    wave_lens: jnp.ndarray,
    rng: jax.Array,
    weight: float = 0.98,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """IN-GRAPH reference random crop, for HBM-resident replay epochs.

    Same distribution as ``sub_sequence_crop`` (the reference's
    ``sub_secquence``, ``/root/reference/data_module.py:138-148``):
    ``target = int(len * U(w, 1))``, ``offset = int(U(0, len - target))``,
    crop window ``[offset, target)`` — but executed inside the jitted step
    on (B, S) device arrays, so ``device_cache`` training re-rolls the crop
    every replay epoch instead of freezing epoch 0's windows (VERDICT r3
    #6).  Returns ``(waves, new_lens, prev_samples)``: rows shifted to
    start 0 via per-row dynamic_slice, zero-padded past ``new_len``, and
    the pre-crop sample (float, int16 wire rescaled) for preemphasis
    continuity — exactly what the host loader hands the frontend.
    """
    B, S = waves.shape
    r1, r2 = jax.random.split(rng)
    lens_f = wave_lens.astype(jnp.float32)
    target = jnp.floor(lens_f * jax.random.uniform(
        r1, (B,), minval=weight, maxval=1.0)).astype(jnp.int32)
    offset = jnp.floor(jax.random.uniform(r2, (B,))
                       * (lens_f - target.astype(jnp.float32))).astype(jnp.int32)
    new_len = jnp.maximum(target - offset, 1)

    # per-row left shift by offset: pad S zeros so the static-size slice
    # never clamps the start index (dynamic_slice clamps to [0, S - size])
    padded = jnp.concatenate([waves, jnp.zeros_like(waves)], axis=1)
    shifted = jax.vmap(
        lambda w, o: lax.dynamic_slice(w, (o,), (S,)))(padded, offset)
    idx = lax.broadcasted_iota(jnp.int32, (1, S), 1)
    shifted = jnp.where(idx < new_len[:, None], shifted, jnp.zeros((), waves.dtype))

    prev_idx = jnp.maximum(offset - 1, 0)
    prev = jax.vmap(lambda w, i: lax.dynamic_slice(w, (i,), (1,))[0])(waves, prev_idx)
    prev = prev.astype(jnp.float32)
    if waves.dtype == jnp.int16:  # int16 wire format: frontend-scale floats
        prev = prev / 32768.0
    prev = jnp.where(offset > 0, prev, 0.0)
    return shifted, new_len, prev


def _band_mask(size: int, start: jnp.ndarray, width: jnp.ndarray) -> jnp.ndarray:
    """(..., size) boolean mask, True inside [start, start+width)."""
    idx = lax.broadcasted_iota(jnp.int32, (1, size), 1)
    return (idx >= start[:, None]) & (idx < (start + width)[:, None])


def spec_augment(
    feats: jnp.ndarray,
    feat_lens: jnp.ndarray,
    rng: jax.Array,
    freq_mask: Union[int, float] = 27,
    time_mask: Union[int, float] = 0.07,
) -> jnp.ndarray:
    """Batched SpecAugment on (B, T, F) log-mels.

    One freq band and one time band per sample are zeroed.  Float parameters
    are proportional to the sample's true extent (time: true frame count,
    freq: n_mels), matching the reference exactly. Band start is drawn from
    ``U(0, extent - width)`` like the reference.
    """
    B, T, F = feats.shape
    k_fw, k_fx, k_tw, k_tx = jax.random.split(rng, 4)

    f_extent = jnp.full((B,), F, jnp.float32)
    f_param = (f_extent * freq_mask) if isinstance(freq_mask, float) else jnp.full((B,), freq_mask, jnp.float32)
    t_extent = feat_lens.astype(jnp.float32)
    t_param = (t_extent * time_mask) if isinstance(time_mask, float) else jnp.full((B,), time_mask, jnp.float32)

    w_f = (jax.random.uniform(k_fw, (B,)) * f_param).astype(jnp.int32)
    w_t = (jax.random.uniform(k_tw, (B,)) * t_param).astype(jnp.int32)
    x_f = (jax.random.uniform(k_fx, (B,)) * (f_extent - w_f.astype(jnp.float32))).astype(jnp.int32)
    x_t = (jax.random.uniform(k_tx, (B,)) * (t_extent - w_t.astype(jnp.float32))).astype(jnp.int32)

    fmask = _band_mask(F, x_f, w_f)[:, None, :]   # (B, 1, F)
    tmask = _band_mask(T, x_t, w_t)[:, :, None]   # (B, T, 1)
    keep = ~(fmask | tmask)
    return feats * keep.astype(feats.dtype)


def cutout(
    feats: jnp.ndarray,
    rng: jax.Array,
    rect_masks: int = 5,
    rect_freq: int = 50,
    rect_time: int = 120,
) -> jnp.ndarray:
    """Zero `rect_masks` random rectangles per sample (reference extra)."""
    B, T, F = feats.shape
    out = feats
    for i in range(rect_masks):
        k_wf, k_wt, k_xf, k_xt = jax.random.split(jax.random.fold_in(rng, i), 4)
        w_f = (jax.random.uniform(k_wf, (B,)) * rect_freq).astype(jnp.int32)
        w_t = (jax.random.uniform(k_wt, (B,)) * rect_time).astype(jnp.int32)
        x_f = (jax.random.uniform(k_xf, (B,)) * (F - w_f)).astype(jnp.int32)
        x_t = (jax.random.uniform(k_xt, (B,)) * (T - w_t)).astype(jnp.int32)
        fmask = _band_mask(F, x_f, w_f)[:, None, :]
        tmask = _band_mask(T, x_t, w_t)[:, :, None]
        out = out * (~(fmask & tmask)).astype(out.dtype)
    return out


def sample_aug(feats: jnp.ndarray, rng: jax.Array, prob: float = 0.4) -> jnp.ndarray:
    """Random pixel dropout of mel cells (reference extra)."""
    k_p, k_m = jax.random.split(rng)
    p = jax.random.uniform(k_p, (), minval=0.0, maxval=prob)
    mask = jnp.round(jax.random.uniform(k_m, feats.shape) * (0.5 / (1.0 - p)))
    return feats * (mask < 0.5).astype(feats.dtype)
