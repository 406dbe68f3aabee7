"""wav2vec2 feature extraction for the SSL training path.

The reference wraps HuggingFace wav2vec2 (default
``facebook/wav2vec2-large-xlsr-53``) to produce (B, T, 512)
``extract_features`` with optional freezing, plus an offline mode that dumps
one pickle per utterance (``/root/reference/ssl_codec/
convert_manifestwav2pkl.py:23-88``).  The extractor stays a torch-CPU/host
component (it is a frozen feature frontend, not part of the TPU training
graph); features flow to the device as numpy arrays.  Non-16k audio is
resampled with scipy like the reference (:47-52).
"""

from __future__ import annotations

import logging
import pickle
from pathlib import Path
from typing import List, Sequence, Tuple, Union

import numpy as np

from ..data.audio import read_audio
from ..data.manifest import read_manifests

logger = logging.getLogger(__name__)


class Wav2Vec2Extractor:
    """Lazy wrapper; requires `transformers` + torch (both in this image)."""

    def __init__(self, model_name: str = "facebook/wav2vec2-large-xlsr-53", frozen: bool = True):
        self.model_name = model_name
        self.frozen = frozen
        self._model = None
        self._processor = None

    def _ensure_loaded(self):
        if self._model is not None:
            return
        import torch
        from transformers import Wav2Vec2FeatureExtractor, Wav2Vec2Model

        self._torch = torch
        self._processor = Wav2Vec2FeatureExtractor.from_pretrained(self.model_name)
        self._model = Wav2Vec2Model.from_pretrained(self.model_name)
        self._model.eval()
        if self.frozen:
            self.freeze()

    def freeze(self) -> None:
        self._ensure_loaded()
        for p in self._model.parameters():
            p.requires_grad = False

    @staticmethod
    def _load_resampled(path, target_sr: int = 16000) -> np.ndarray:
        wave, sr = read_audio(path, mono=True)
        wave = wave[0]
        if sr != target_sr:
            from scipy import signal

            wave = signal.resample(wave, int(len(wave) * target_sr / sr)).astype(np.float32)
        return wave

    def __call__(self, audio: Sequence[Union[str, Path, np.ndarray]]) -> Tuple[np.ndarray, np.ndarray]:
        """paths/waveforms -> (features (B, T, 512) float32, percents (B,))."""
        self._ensure_loaded()
        torch = self._torch
        waves = [a if isinstance(a, np.ndarray) else self._load_resampled(a) for a in audio]
        lengths = np.asarray([len(w) for w in waves])
        max_len = int(lengths.max())
        batch = np.zeros((len(waves), max_len), np.float32)
        for i, w in enumerate(waves):
            batch[i, : len(w)] = w
        inputs = self._processor(
            list(batch), sampling_rate=16000, return_tensors="pt", padding=False
        )
        with torch.no_grad():
            out = self._model(inputs.input_values.squeeze(0) if inputs.input_values.ndim == 3 else inputs.input_values)
        feats = out.extract_features.cpu().numpy()  # (B, T, 512)
        percents = lengths / lengths.max()
        return feats.astype(np.float32), percents.astype(np.float32)


def convert(extractor: Wav2Vec2Extractor, audio_path: Union[str, Path], out_dir: Union[str, Path]) -> Path:
    """Extract one utterance and pickle it as {out_dir}/{stem}.pkl
    (offline mode keying, ``ssl_data_module.py:50-52``)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    feats, _ = extractor([audio_path])
    out_path = out_dir / (Path(audio_path).stem + ".pkl")
    with open(out_path, "wb") as f:
        pickle.dump(feats[0][None], f)  # (1, T, 512) like the reference dump
    return out_path


def convert_manifest(
    manifest_path: Union[str, Path],
    out_dir: Union[str, Path],
    model_name: str = "facebook/wav2vec2-large-xlsr-53",
    max_duration: float = 1e9,
) -> None:
    """Offline dump of a whole manifest (``convert_manifestwav2pkl.py:74-88``)."""
    extractor = Wav2Vec2Extractor(model_name)
    entries = read_manifests(manifest_path, max_duration)
    for i, e in enumerate(entries):
        convert(extractor, e.audio_filepath, out_dir)
        if i % 100 == 0:
            logger.info("converted %d/%d", i, len(entries))


def load_feature_pkl(audio_path: Union[str, Path], ssl_folder: Union[str, Path]) -> np.ndarray:
    """Map a wav path to its offline feature pickle and load (T, 512)."""
    pkl = Path(ssl_folder) / (Path(audio_path).stem + ".pkl")
    with open(pkl, "rb") as f:
        feats = pickle.load(f)
    feats = np.asarray(feats, np.float32)
    if feats.ndim == 3:  # stored as (1, T, 512)
        feats = feats[0]
    return feats
