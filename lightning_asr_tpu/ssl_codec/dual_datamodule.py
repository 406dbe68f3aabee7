"""Dual-stream SSL data pipeline (``ssl_data_module_double.py``): each batch
carries wav2vec2 features AND the raw waveform; the mel stream is computed
on-device at the 20 ms wav2vec2 frame rate by the dual train step."""

from __future__ import annotations

from typing import Iterator, List

import numpy as np

from ..data.audio import read_audio
from ..data.pipeline import Batch
from .ssl_datamodule import SSLBucketBatcher, SSLDataModule, WAV2VEC_FPS


class DualSSLBucketBatcher(SSLBucketBatcher):
    """SSLBucketBatcher that also packs the raw waveform into
    ``batch.extra`` for the on-device mel stream."""

    SAMPLE_RATE = 16000

    def _assemble(self, bucket: int, chunk: list[int]) -> Batch:
        batch = super()._assemble(bucket, chunk)
        # raw-audio bucket aligned with the feature bucket (20 ms frames)
        S = bucket * (self.SAMPLE_RATE // WAV2VEC_FPS)
        B = len(chunk)
        raw = np.zeros((B, S), np.float32)
        raw_lens = np.zeros(B, np.int32)
        for i, idx in enumerate(chunk):
            samples, sr = read_audio(self.entries[idx].audio_filepath, mono=True)
            wave = samples[0]
            n = min(wave.shape[0], S)
            raw[i, :n] = wave[:n]
            raw_lens[i] = n
        batch.extra = {"raw_waves": raw, "raw_wave_lens": raw_lens}
        return batch


class DualSSLDataModule(SSLDataModule):
    def _batcher(self, entries, bs, train) -> DualSSLBucketBatcher:
        kwargs = {}
        if self.bucket_seconds is not None:
            kwargs["bucket_seconds"] = self.bucket_seconds
        return DualSSLBucketBatcher(
            entries, self.vocab, bs, ssl_folder=self.ssl_folder,
            extractor=self.extractor, train=train, seed=self.seed, **kwargs,
        )
