"""CTC confidence scoring for pseudo-label filtering.

The reference scores an utterance as the negated mean of the per-frame max
log-probs over the valid frames (``/root/reference/ssl_codec/utils.py``),
with quirky constants (sum starts at -1e-5, count denominator +1e-6) that
the pseudo-label threshold (prob <= 0.01, ``train_ssl.py:233``) was
calibrated against — reproduced here.

NOTE (reference quirk, preserved as the default): the reference intends to
skip blank frames but compares ``argmax == vocab_size`` where vocab_size is
the class-axis size V+1 while argmax ranges over [0, V] — the skip never
fires.  Passing ``blank_id`` explicitly enables the *intended* behavior of
skipping blank frames.

Vectorized over the batch (one pass on device/numpy, no per-frame python
loop, no thread pool needed — the reference's ThreadPoolExecutor.map over
``seq_sum_logprob_np`` becomes a single batched call).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def sum_logprob(
    log_probs: np.ndarray,
    lengths: np.ndarray,
    blank_id: Optional[int] = None,
) -> np.ndarray:
    """(B, T, C) log-probs + (B,) valid lengths -> (B,) confidence scores
    (lower = more confident; reference threshold keeps <= 0.01)."""
    log_probs = np.asarray(log_probs)
    lengths = np.asarray(lengths)
    B, T, C = log_probs.shape
    am = log_probs.argmax(axis=-1)                       # (B, T)
    mx = log_probs.max(axis=-1)                          # (B, T)
    valid = np.arange(T)[None, :] < lengths[:, None]
    if blank_id is not None:
        valid = valid & (am != blank_id)
    total = (mx * valid).sum(axis=1) - 1e-5
    count = valid.sum(axis=1).astype(np.float64)
    return -(total / (count + 1e-6))


def confidence_scores(
    log_probs: np.ndarray,
    lengths: np.ndarray,
    blank_id: int,
    measure: str = "ref",
) -> np.ndarray:
    """Per-utterance confidence, LOWER = more confident (so one threshold
    convention covers every measure).  ``measure``:

    * ``ref`` — the reference's score verbatim (mean max log-prob with the
      never-firing blank skip, ``/root/reference/ssl_codec/utils.py``);
    * ``nonblank`` — the reference's INTENDED score: mean max log-prob over
      non-blank frames only;
    * ``min_maxlp`` — the weakest frame: negated min over valid frames of
      the max log-prob (one garbage frame disqualifies the utterance —
      mean-based scores let a few confident frames mask it);
    * ``entropy`` — mean per-frame posterior entropy (nats): uses the whole
      distribution instead of just the argmax.

    Beyond reference: the reference hardcodes ``ref``; pseudo-label quality
    depends on confidence↔correctness correlation, which
    ``scripts/ssl_smoke.py --diagnose`` measures per-candidate so the
    training loop can pick the measure that actually selects correct
    decodes (``SSLTrainer(pseudo_confidence_measure=...)``)."""
    log_probs = np.asarray(log_probs, np.float32)
    lengths = np.asarray(lengths)
    B, T, C = log_probs.shape
    valid = np.arange(T)[None, :] < lengths[:, None]
    if measure == "ref":
        return sum_logprob(log_probs, lengths, None)
    if measure == "nonblank":
        return sum_logprob(log_probs, lengths, blank_id)
    mx = log_probs.max(axis=-1)                          # (B, T)
    if measure == "min_maxlp":
        return -np.where(valid, mx, np.inf).min(axis=1)
    if measure == "entropy":
        ent = -(np.exp(log_probs) * log_probs).sum(axis=-1)  # (B, T) nats
        return ((ent * valid).sum(axis=1)
                / np.maximum(valid.sum(axis=1), 1))
    raise ValueError(f"unknown confidence measure {measure!r}")


def seq_sum_logprob(data: tuple, blank_id: Optional[int] = None) -> tuple:
    """Single-sample variant keeping the reference's (index, (T, C) array,
    length) -> (index, score) tuple protocol (``ssl_codec/utils.py:48-66``)."""
    idx, log_probs, length = data
    score = sum_logprob(np.asarray(log_probs)[None], np.asarray([length]), blank_id)[0]
    return idx, float(score)
