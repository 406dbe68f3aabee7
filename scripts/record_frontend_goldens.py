#!/usr/bin/env python
"""Record log-mel frontend goldens to tests/goldens/frontend_goldens.npz.

North-star (BASELINE.md): log-mels bitwise-close to the reference's
torchaudio-0.8.1 pipeline (``/root/reference/data_module.py:68-71``:
MelSpectrogram(sr=16000, n_fft=512, pad=32, win=320, hop=160, n_mels=64)
-> AmplitudeToDB, after 0.97 preemphasis).

Oracle preference order:
  1. real ``torchaudio`` if importable (run this script once in any
     torchaudio-0.8.1 env and commit the refreshed .npz);
  2. a float64 torch reconstruction of torchaudio's documented formulas
     (torch.stft + HTK mel filterbank, no norm + power-dB) — what this image
     can produce (torchaudio is not installed here).

The .npz records which oracle produced it (``oracle`` field) plus the input
waveforms, so tests are reproducible and the provenance is auditable.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import numpy as np
import torch


def torchaudio_oracle(wave: np.ndarray) -> np.ndarray:
    import torchaudio

    y = torch.from_numpy(wave).float().unsqueeze(0)
    y = torch.cat((y[:, 0].unsqueeze(1), y[:, 1:] - 0.97 * y[:, :-1]), dim=1)
    mel = torchaudio.transforms.MelSpectrogram(
        sample_rate=16000, n_fft=512, pad=32, win_length=320, hop_length=160,
        n_mels=64)(y)
    out = torchaudio.transforms.AmplitudeToDB(stype="power")(mel)
    return out.squeeze(0).numpy().astype(np.float64)


def reconstruction_oracle(wave: np.ndarray) -> np.ndarray:
    """float64 rebuild of torchaudio 0.8.1's formulas (same math as
    tests/test_frontend.py::torch_reference_logmel)."""
    y = torch.from_numpy(wave).double().unsqueeze(0)
    y = torch.cat((y[:, 0].unsqueeze(1), y[:, 1:] - 0.97 * y[:, :-1]), dim=1)
    y = torch.nn.functional.pad(y, (32, 32), mode="constant")
    window = torch.hann_window(320, periodic=True, dtype=torch.float64)
    spec = torch.stft(y, n_fft=512, hop_length=160, win_length=320, window=window,
                      center=True, pad_mode="reflect", normalized=False,
                      onesided=True, return_complex=True)
    power = spec.real ** 2 + spec.imag ** 2

    all_freqs = torch.linspace(0, 8000, 257, dtype=torch.float64)
    m_pts = torch.linspace(0.0, 2595.0 * math.log10(1.0 + 8000.0 / 700.0), 66,
                           dtype=torch.float64)
    f_pts = 700.0 * (10 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = torch.max(torch.zeros(1, dtype=torch.float64), torch.min(down, up))

    mel = torch.matmul(power.transpose(1, 2), fb).transpose(1, 2)
    logmel = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
    return logmel.squeeze(0).numpy()


def reconstruction_oracle_f32(wave: np.ndarray) -> np.ndarray:
    """float32 rebuild of the same formulas — torchaudio 0.8.1's ACTUAL
    compute dtype (its transforms are plain float32 torch ops over
    torch.stft; nothing upcasts).  This arm bounds what real torchaudio
    would produce much tighter than the float64 truth arm: any device
    delta within the fp32-vs-fp64 oracle spread is inside torchaudio's own
    numeric noise (VERDICT r3 #3)."""
    y = torch.from_numpy(wave).float().unsqueeze(0)
    y = torch.cat((y[:, 0].unsqueeze(1), y[:, 1:] - 0.97 * y[:, :-1]), dim=1)
    y = torch.nn.functional.pad(y, (32, 32), mode="constant")
    window = torch.hann_window(320, periodic=True, dtype=torch.float32)
    spec = torch.stft(y, n_fft=512, hop_length=160, win_length=320, window=window,
                      center=True, pad_mode="reflect", normalized=False,
                      onesided=True, return_complex=True)
    power = spec.real ** 2 + spec.imag ** 2

    # torchaudio.functional.create_fb_matrix defaults: float32 linspace/math
    all_freqs = torch.linspace(0, 8000, 257, dtype=torch.float32)
    m_pts = torch.linspace(0.0, 2595.0 * math.log10(1.0 + 8000.0 / 700.0), 66,
                           dtype=torch.float32)
    f_pts = 700.0 * (10 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = torch.max(torch.zeros(1, dtype=torch.float32), torch.min(down, up))

    mel = torch.matmul(power.transpose(1, 2), fb).transpose(1, 2)
    logmel = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
    return logmel.squeeze(0).numpy().astype(np.float32)


def make_waves() -> dict[str, np.ndarray]:
    """10 varied test signals: tones, sweeps, noise, AM speech-like, silence,
    clipping, odd lengths, short and long."""
    sr = 16000
    rng = np.random.default_rng(7)
    t = lambda n: np.arange(n) / sr
    waves = {
        "noise_1s": (rng.standard_normal(sr) * 0.1),
        "tone_440": 0.5 * np.sin(2 * np.pi * 440 * t(sr)),
        "sweep": 0.3 * np.sin(2 * np.pi * (100 + 3000 * t(2 * sr) / 2) * t(2 * sr)),
        "am_speechlike": (0.4 * np.sin(2 * np.pi * 180 * t(sr * 3))
                          * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t(sr * 3)))
                          + 0.02 * rng.standard_normal(sr * 3)),
        "silence": np.zeros(sr // 2),
        "clipped": np.clip(2.0 * np.sin(2 * np.pi * 300 * t(sr)), -1, 1),
        "odd_len": rng.standard_normal(16001) * 0.05,
        "short_80ms": 0.2 * np.sin(2 * np.pi * 523 * t(1280)),
        "long_10s": (0.1 * rng.standard_normal(sr * 10)
                     + 0.2 * np.sin(2 * np.pi * 250 * t(sr * 10))),
        "dc_offset": 0.1 + 0.1 * np.sin(2 * np.pi * 620 * t(sr)),
    }
    return {k: v.astype(np.float32) for k, v in waves.items()}


def main() -> None:
    try:
        import torchaudio  # noqa: F401

        oracle, name = torchaudio_oracle, "torchaudio-" + torchaudio.__version__
    except ImportError:
        oracle, name = reconstruction_oracle, "float64-torch-reconstruction"
    waves = make_waves()
    data = {"oracle": np.asarray(name),
            "oracle_f32": np.asarray("float32-torch-reconstruction")}
    for k, w in waves.items():
        data[f"wave/{k}"] = w
        data[f"logmel/{k}"] = oracle(w)
        # always record the float32 arm alongside (torchaudio's actual
        # compute dtype); with real torchaudio available the primary arm IS
        # ground truth and this one documents the fp32 noise band
        data[f"logmel_f32/{k}"] = reconstruction_oracle_f32(w)
    out = Path(__file__).resolve().parents[1] / "tests" / "goldens" / "frontend_goldens.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **data)
    print(f"recorded {len(waves)} goldens with oracle={name} (+float32 arm) -> {out}")


if __name__ == "__main__":
    sys.exit(main())
