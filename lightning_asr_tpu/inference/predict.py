"""Offline inference API — the reference's ``AsrTranslator`` surface
(``/root/reference/predict.py:21-74``): load a checkpoint, transcribe a wav
path or BytesIO, evaluate a manifest; plus the SSL-translator extras
(confidence scores, LM beam-search fusion, per-utterance CSV stats —
``predict.py:76-189``).

TPU-native design: the checkpoint carries its hyperparameters
(labels/encoder/in_c), so construction needs no config.  Single-utterance
inference pads the waveform to a small set of bucket lengths so repeated
calls reuse compiled graphs; an optional beam-search decoder (native C++
with n-gram LM) replaces greedy decoding when provided.
"""

from __future__ import annotations

import io
import logging
import time
from pathlib import Path
from typing import List, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..data.audio import read_audio
from ..data.manifest import read_manifests
from ..data.vocab import Vocabulary
from ..decoding.greedy import greedy_decode_to_strings
from ..metrics.wer import WER
from ..models import build_model
from ..ops.frontend import MelFrontendConfig, log_mel_spectrogram, normalize_features
from ..training.checkpoint import load_checkpoint
from ..training.steps import AsrTrainState

logger = logging.getLogger(__name__)

_BUCKET_SECONDS = (2.0, 4.0, 8.0, 16.0, 24.0, 32.0, 40.0)


def plan_chunks(n_samples: int, chunk: int, overlap: int) -> List[tuple]:
    """Split [0, n_samples) into windows of `chunk` samples overlapping by
    2*`overlap`, with non-overlapping keep-regions that tile the signal.

    Returns [(start, keep_lo, keep_hi)] where keep_lo/keep_hi are relative
    to `start`; the kept intervals [start+keep_lo, start+keep_hi) exactly
    partition [0, n_samples).  Used by ``AsrTranslator.translate_long`` to
    transcribe audio beyond the longest compiled bucket (the reference caps
    utterances at its 40 s dev filter and has no long-audio path)."""
    if chunk <= 2 * overlap:
        raise ValueError(f"chunk ({chunk}) must exceed 2*overlap ({2 * overlap})")
    if n_samples <= chunk:
        return [(0, 0, n_samples)]
    hop = chunk - 2 * overlap
    plans = []
    start = 0
    while True:
        if start + chunk >= n_samples:  # final window: right-aligned
            final_start = max(n_samples - chunk, 0)
            prev_keep_end = plans[-1][0] + plans[-1][2] if plans else 0
            plans.append((final_start, prev_keep_end - final_start,
                          n_samples - final_start))
            return plans
        keep_lo = overlap if start > 0 else 0
        plans.append((start, keep_lo, chunk - overlap))
        start += hop


class AsrTranslator:
    """Checkpoint -> text transcription.

    Args:
      model_path: checkpoint directory (as written by CheckpointManager).
      labels: override vocabulary (defaults to the checkpoint's hparams).
      lang: 'en' or 'cn' — only used to pick default labels when the
        checkpoint carries none (the reference hardcodes English labels,
        ``predict.py:31-32``).
      beam_decoder: optional object with ``forward(log_probs, lengths) ->
        [str]`` (duck-typed to BeamSearchDecoderWithLM).
    """

    EN_LABELS = [" ", "'"] + [chr(ord("a") + i) for i in range(26)]

    def __init__(
        self,
        model_path: Union[str, Path],
        labels: Optional[Sequence[str]] = None,
        lang: str = "en",
        beam_decoder=None,
        frontend: Optional[MelFrontendConfig] = None,
        return_confidence: bool = False,
    ):
        t0 = time.time()
        from ..utils.logging import enable_compile_cache

        enable_compile_cache()
        state_raw, meta = load_checkpoint(model_path)
        hparams = meta.get("hparams", {})
        if labels is None:
            labels = hparams.get("labels") or self.EN_LABELS
        self.vocab = Vocabulary(list(labels), bool(hparams.get("use_cer", lang == "cn")))
        if frontend is None:
            # Rebuild the TRAINING frontend from the checkpoint (precision
            # tier included) so inference features match the distribution the
            # model's BN stats were calibrated on; the eval path passes
            # rng=None so the stored dither never fires.  Old checkpoints
            # without the hparam fall back to the fp32 default.
            fd = hparams.get("frontend")
            frontend = MelFrontendConfig.from_dict(fd) if fd else MelFrontendConfig(dither=0.0)
        self.frontend = frontend
        self.normalize = bool(hparams.get("normalize", True))
        self.beam_decoder = beam_decoder
        self.return_confidence = return_confidence

        dtype_name = hparams.get("compute_dtype")
        compute_dtype = jnp.dtype(dtype_name) if dtype_name not in (None, "float32") else None
        self.model = build_model(
            num_classes=self.vocab.num_classes,
            encoder=hparams.get("encoder", "quartznet12_context"),
            in_c=hparams.get("in_c", 64),
            drop_rate=float(hparams.get("drop_rate", 0.0)),
            mask=bool(hparams.get("mask", True)),
            feature_in=hparams.get("feature_in"),
            dtype=compute_dtype,
        )
        self.params = state_raw["params"]
        self.batch_stats = state_raw.get("batch_stats", {})
        # SSL checkpoints (feature_in set) consume wav2vec2 features instead
        # of mels — the reference's AsrTranslatorSSL (predict.py:76-133)
        self.ssl_extractor = None
        if hparams.get("feature_in"):
            from ..ssl_codec.extractor import Wav2Vec2Extractor

            self.ssl_extractor = Wav2Vec2Extractor(
                hparams.get("ssl_model_name", "facebook/wav2vec2-large-xlsr-53"))
        self._jit_forward = jax.jit(self._forward)
        self._jit_forward_feats = jax.jit(self._forward_feats)
        logger.info("loaded checkpoint in %.2fs", time.time() - t0)

    # ------------------------------------------------------------------
    def _forward(self, waves, wave_lens):
        feats, feat_lens = log_mel_spectrogram(waves, wave_lens, self.frontend, rng=None)
        if self.normalize:
            feats = normalize_features(feats, feat_lens)
        percents = feat_lens.astype(jnp.float32) / jnp.float32(feats.shape[1])
        log_probs, out_lens = self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            feats, percents, False,
        )
        return log_probs, out_lens

    def _forward_feats(self, feats, feat_lens):
        percents = feat_lens.astype(jnp.float32) / jnp.float32(feats.shape[1])
        return self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            feats, percents, False,
        )

    def _bucket_len(self, n: int) -> int:
        for s in _BUCKET_SECONDS:
            b = int(s * self.frontend.sample_rate)
            if n <= b:
                return b
        return n

    def transcribe_batch(self, waves: List[np.ndarray]) -> List[str]:
        """Transcribe a list of 1-D float32 waveforms."""
        return self.transcribe_batch_submit(waves)()

    def transcribe_batch_submit(self, waves: List[np.ndarray]):
        """Dispatch a batch's device work; return a zero-arg resolver.

        JAX dispatch is asynchronous: the jitted forward (and the greedy
        argmax) are enqueued on the device immediately and this method
        returns without blocking.  All host-side blocking — the result
        fetches and string decoding — happens in the returned resolver.
        A pipelined caller (``server.DynamicBatcher._device_loop``) submits
        batch N+1 BEFORE resolving batch N, so the host<->device round-trip
        of the fetch overlaps the next batch's compute; on a remote or
        tunneled device the round-trip can rival the compute itself, and a
        strictly sequential submit->fetch loop was measured at ~2x the
        per-batch cost of this double-buffered form at concurrency 32."""
        if self.ssl_extractor is not None:
            feats, _ = self.ssl_extractor(list(waves))  # (B, T, 512)
            # exact wav2vec2 conv-stack output lengths, not a 50 Hz estimate
            # (``/root/reference/convert_manifestwav2pkl.py:53-60`` returns
            # the extractor's own lengths as percentages)
            from ..ssl_codec.wav2vec_flax import Wav2Vec2FeatureEncoderFlax

            sample_lens = np.asarray([w.shape[0] for w in waves], np.int64)
            frames = np.asarray(
                Wav2Vec2FeatureEncoderFlax.output_lengths(sample_lens), np.int32)
            frames = np.minimum(frames, feats.shape[1])
            # batch-dim bucketing (see the mel path below)
            B = len(waves)
            Bp = 1 << (B - 1).bit_length()
            if Bp != B:
                feats = np.concatenate(
                    [feats, np.repeat(feats[:1], Bp - B, axis=0)], axis=0)
                frames = np.concatenate([frames, np.repeat(frames[:1], Bp - B)])
            log_probs, out_lens = self._jit_forward_feats(
                jnp.asarray(feats), jnp.asarray(frames))
        else:
            n_max = self._bucket_len(max(w.shape[0] for w in waves))
            # bucket the BATCH dimension too (next power of two): callers
            # like the serving DynamicBatcher produce arbitrary batch sizes
            # depending on arrival timing, and each distinct (B, T) shape
            # is a separate XLA compile — pad rows with a copy of row 0
            # (benign: keeps per-utterance normalization finite) and trim
            # the outputs back to the real rows
            B = len(waves)
            Bp = 1 << (B - 1).bit_length()
            batch = np.zeros((Bp, n_max), np.float32)
            lens = np.zeros(Bp, np.int32)
            for i, w in enumerate(waves):
                batch[i, : w.shape[0]] = w
                lens[i] = w.shape[0]
            for i in range(B, Bp):
                batch[i] = batch[0]
                lens[i] = lens[0]
            log_probs, out_lens = self._jit_forward(jnp.asarray(batch), jnp.asarray(lens))
        # enqueue the greedy argmax on the device NOW (still async) so the
        # resolver only fetches; device ops stay on the warmed ladder shape
        # Bp — a device-side [:B] trim would give every raw batch size its
        # own downstream shapes, each paying a fresh XLA compile (~2 s on
        # the tunneled backend) at first sight (diagnosed via
        # scripts/probe_serving_c32.py: serving p50 at c32 was 2.5 s while
        # every warm ladder batch ran in ~200 ms)
        need_lp = self.beam_decoder is not None or self.return_confidence
        preds_dev = None if need_lp else jnp.argmax(log_probs, axis=-1)

        def resolve():
            # trim padding rows on the HOST (see the shape note above)
            out_lens_np = np.asarray(out_lens)[:B]
            if need_lp:
                lp_np = np.asarray(log_probs, np.float32)[:B]
            if self.beam_decoder is not None:
                texts = self.beam_decoder.forward(lp_np, out_lens_np)
            else:
                # confidence path already fetched lp_np: argmax on host
                # (a device argmax over the trimmed [:B] would re-compile
                # per raw batch size)
                preds = (np.asarray(preds_dev)[:B] if preds_dev is not None
                         else np.argmax(lp_np, axis=-1))
                texts = greedy_decode_to_strings(
                    preds, out_lens_np, self.vocab.labels, self.vocab.blank_id)
            if self.return_confidence:
                from ..ssl_codec.confidence import sum_logprob

                conf = sum_logprob(lp_np, out_lens_np, self.vocab.blank_id)
                return list(zip(texts, conf.tolist()))
            return texts

        return resolve

    def warmup(self, seconds: Sequence[float] = (5.0,),
               max_batch: int = 1) -> None:
        """Pre-compile the (batch, bucket) ladder a server will hit.

        Every distinct padded shape is a separate XLA compile (20-40 s on
        the tunneled backend), so a cold server answers its first
        concurrent burst at compile latency, not step latency.  Runs one
        silent batch through ``transcribe_batch`` for each power-of-two
        batch size up to ``max_batch`` x each duration's bucket — after
        this, any request pattern within the ladder reuses cached
        executables.  (No reference analog: the Flask app serves
        single-stream eager torch, ``/root/reference/server/app.py``.)"""
        sizes = []
        b = 1
        # cover the padded shape of EVERY batch size the DynamicBatcher can
        # emit: transcribe_batch pads to the next power of two, so a
        # non-power-of-two max_batch (say 12) still produces Bp=16 batches —
        # warm through the power of two >= max_batch, not just <= it
        while True:
            sizes.append(b)
            if b >= max(1, max_batch):
                break
            b <<= 1
        buckets = sorted({self._bucket_len(int(s * self.frontend.sample_rate))
                          for s in seconds})
        for n in buckets:
            wave = np.zeros(n, np.float32)
            for b in sizes:
                self.transcribe_batch([wave] * b)

    def translate(self, audio: Union[str, Path, bytes, io.BytesIO]) -> str:
        """Transcribe one utterance from a path / bytes / BytesIO
        (``predict.py:43-62,198-200``)."""
        t0 = time.time()
        samples, sr = read_audio(audio, mono=True)
        if sr != self.frontend.sample_rate:
            raise ValueError(f"expected {self.frontend.sample_rate} Hz audio, got {sr}")
        t1 = time.time()
        out = self.transcribe_batch([samples[0]])[0]
        logger.info("load %.3fs  compute+decode %.3fs", t1 - t0, time.time() - t1)
        return out

    def translate_long(
        self,
        audio: Union[str, Path, bytes, io.BytesIO],
        chunk_seconds: float = 20.0,
        overlap_seconds: float = 2.0,
    ) -> str:
        """Transcribe arbitrarily long audio by overlapped chunking.

        The waveform is cut into fixed-size windows (one compiled graph,
        reused for every window), each window's log-probs are trimmed to a
        non-overlapping keep-region in frame space, the trimmed frames are
        concatenated, and ONE greedy/beam pass decodes the stitched
        sequence — so a character spanning a boundary collapses correctly.
        Goes beyond the reference, which has no long-audio path (utterances
        are capped by the 40 s dev filter)."""
        if self.ssl_extractor is not None:
            raise NotImplementedError("translate_long supports the mel path")
        samples, sr = read_audio(audio, mono=True)
        if sr != self.frontend.sample_rate:
            raise ValueError(f"expected {self.frontend.sample_rate} Hz audio, got {sr}")
        wave = samples[0]
        chunk = int(chunk_seconds * sr)
        overlap = int(overlap_seconds * sr)
        plans = plan_chunks(wave.shape[0], chunk, overlap)
        if len(plans) == 1:
            return self.transcribe_batch([wave])[0]

        # pad the row count to a power of two so files with different chunk
        # counts reuse the same compiled graph
        B = 1 << (len(plans) - 1).bit_length()
        batch = np.zeros((B, chunk), np.float32)
        lens = np.zeros(B, np.int32)
        for i, (start, _, _) in enumerate(plans):
            seg = wave[start : start + chunk]
            batch[i, : seg.shape[0]] = seg
            lens[i] = seg.shape[0]
        for i in range(len(plans), B):  # benign rows (keep normalization finite)
            batch[i] = batch[0]
            lens[i] = lens[0]
        log_probs, out_lens = self._jit_forward(jnp.asarray(batch), jnp.asarray(lens))
        log_probs = np.asarray(log_probs)
        out_lens = np.asarray(out_lens)

        # sample -> output-frame conversion via the model's EXACT length
        # function (mel framing + int(T'*percent) trim), not a linear
        # proportion — a rounding mismatch there can drop or duplicate a
        # boundary character (ADVICE r2)
        from ..ops.frontend import mel_num_frames

        T_mel = mel_num_frames(chunk, self.frontend)

        def out_frame(s: int, frames: int) -> int:
            """Output frames a keep-prefix of `s` samples would produce."""
            if s <= 0:
                return 0
            return min(frames, frames * mel_num_frames(s, self.frontend) // T_mel)

        pieces = []
        for i, (start, keep_lo, keep_hi) in enumerate(plans):
            frames = int(out_lens[i])
            f_lo = out_frame(keep_lo, frames)
            f_hi = out_frame(keep_hi, frames)
            pieces.append(log_probs[i, f_lo : max(f_hi, f_lo)])
        stitched = np.concatenate(pieces, axis=0)[None]
        total = np.asarray([stitched.shape[1]], np.int32)
        if self.beam_decoder is not None:
            return self.beam_decoder.forward(stitched, total)[0]
        preds = np.argmax(stitched, axis=-1)
        return greedy_decode_to_strings(preds, total, self.vocab.labels,
                                        self.vocab.blank_id)[0]

    # ------------------------------------------------------------------
    def evaluate_manifest(
        self,
        manifest_path: Union[str, Path],
        batch_size: int = 16,
        max_duration: float = 40.0,
        csv_path: Optional[Union[str, Path]] = None,
    ) -> dict:
        """Batch-evaluate a JSONL manifest; returns corpus WER/CER
        (``predict.py:64-74,135-189``).  With ``csv_path``, dumps
        per-utterance WER (and confidence when enabled) like the reference's
        confidence-vs-WER stats CSV."""
        entries = read_manifests(manifest_path, max_duration)
        metric = WER(self.vocab.labels, self.vocab.use_cer)
        rows = []

        # double-buffered evaluation: submit batch i+1's device work before
        # blocking on batch i's fetch (same discipline as the serving
        # device loop) — on a remote/tunneled device the result round-trip
        # rivals the compute, and the host-side WAV reads for the next
        # batch also overlap the in-flight forward
        def score(chunk, resolver):
            for e, res in zip(chunk, resolver()):
                text, conf = (res if isinstance(res, tuple) else (res, None))
                utt_wer = metric.update([text], [e.text])
                rows.append((e.audio_filepath, e.text, text, utt_wer, conf))

        pending = None  # (chunk, resolver)
        for i in range(0, len(entries), batch_size):
            chunk = entries[i : i + batch_size]
            waves = []
            for e in chunk:
                samples, _ = read_audio(e.audio_filepath, mono=True)
                waves.append(samples[0])
            resolver = self.transcribe_batch_submit(waves)
            if pending is not None:
                score(*pending)
            pending = (chunk, resolver)
        if pending is not None:
            score(*pending)
        overall = metric.compute()
        if csv_path:
            import csv

            with open(csv_path, "w", newline="", encoding="utf-8") as f:
                w = csv.writer(f)
                w.writerow(["audio_filepath", "reference", "hypothesis", "wer", "confidence"])
                w.writerows(rows)
        tag = "cer" if self.vocab.use_cer else "wer"
        logger.info("manifest %s: %s=%.4f over %d utts", manifest_path, tag, overall, len(rows))
        return {tag: overall, "n_utterances": len(rows)}
