"""Log-mel frontend parity vs the reference's torchaudio-0.8.1 pipeline.

torchaudio itself is not installed; the golden pipeline is rebuilt here in
torch from its documented formulas (torch.stft + HTK mel filterbank +
power-dB), which is exactly what torchaudio.transforms.MelSpectrogram /
AmplitudeToDB compute (``/root/reference/data_module.py:68-71,150-174``).
"""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lightning_asr_tpu.ops.frontend import (
    MelFrontendConfig,
    log_mel_spectrogram,
    mel_filterbank,
    mel_num_frames,
    normalize_features,
)

CFG = MelFrontendConfig(dither=0.0)


def torch_mel_filterbank(n_freqs=257, f_min=0.0, f_max=8000.0, n_mels=64, sr=16000):
    """torchaudio.functional.create_fb_matrix (0.8.1): HTK scale, no norm."""
    all_freqs = torch.linspace(0, sr // 2, n_freqs, dtype=torch.float64)
    m_min = 2595.0 * math.log10(1.0 + (f_min / 700.0))
    m_max = 2595.0 * math.log10(1.0 + (f_max / 700.0))
    m_pts = torch.linspace(m_min, m_max, n_mels + 2, dtype=torch.float64)
    f_pts = 700.0 * (10 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    return torch.max(torch.zeros(1, dtype=torch.float64), torch.min(down_slopes, up_slopes))


def torch_reference_logmel(wave: np.ndarray) -> np.ndarray:
    """The reference AudioParser's mel path (dither off, no augmentation,
    no normalization): preemph -> MelSpectrogram -> AmplitudeToDB."""
    y = torch.from_numpy(wave).double().unsqueeze(0)
    y = torch.cat((y[:, 0].unsqueeze(1), y[:, 1:] - 0.97 * y[:, :-1]), dim=1)
    # Spectrogram pad=32 (constant), then torch.stft center reflect pad
    y = torch.nn.functional.pad(y, (32, 32), mode="constant")
    window = torch.hann_window(320, periodic=True, dtype=torch.float64)
    spec = torch.stft(
        y, n_fft=512, hop_length=160, win_length=320, window=window,
        center=True, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    )
    power = spec.real ** 2 + spec.imag ** 2  # (1, 257, T)
    fb = torch_mel_filterbank()
    mel = torch.matmul(power.transpose(1, 2), fb).transpose(1, 2)  # (1, 64, T)
    logmel = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
    return logmel.squeeze(0).numpy()  # (64, T)


@pytest.mark.parametrize("n_samples", [16000, 44800, 16001])
def test_logmel_matches_torch_single(n_samples):
    rng = np.random.default_rng(42)
    wave = (rng.standard_normal(n_samples) * 0.1).astype(np.float32)

    golden = torch_reference_logmel(wave)  # (64, T)
    T_expected = golden.shape[1]
    assert mel_num_frames(n_samples, CFG) == T_expected

    mels, mel_lens = log_mel_spectrogram(
        jnp.asarray(wave)[None, :], jnp.asarray([n_samples], jnp.int32), CFG
    )
    assert int(mel_lens[0]) == T_expected
    ours = np.asarray(mels[0]).T  # (64, T)

    np.testing.assert_allclose(ours, golden, rtol=0, atol=2e-3)
    # dB-domain closeness: overwhelming majority of cells essentially exact
    assert np.percentile(np.abs(ours - golden), 99) < 2e-4


def test_logmel_batched_padding_invariance():
    """Frames of a short utterance inside a padded batch must equal its
    stand-alone frames — the per-sample reflect-pad gather is exact."""
    rng = np.random.default_rng(7)
    n1, n2 = 9600, 16000
    w1 = (rng.standard_normal(n1) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal(n2) * 0.1).astype(np.float32)

    batch = np.zeros((2, n2), np.float32)
    batch[0, :n1] = w1
    batch[1] = w2
    mels, mel_lens = log_mel_spectrogram(
        jnp.asarray(batch), jnp.asarray([n1, n2], jnp.int32), CFG
    )

    solo, solo_lens = log_mel_spectrogram(
        jnp.asarray(w1)[None, :], jnp.asarray([n1], jnp.int32), CFG
    )
    T1 = int(solo_lens[0])
    assert int(mel_lens[0]) == T1
    np.testing.assert_allclose(
        np.asarray(mels[0, :T1]), np.asarray(solo[0, :T1]), rtol=0, atol=2e-3
    )


def test_normalize_matches_torch_std_mean():
    """Per-utterance normalization must use torch's unbiased std."""
    rng = np.random.default_rng(3)
    T, F = 101, 64
    feats = rng.standard_normal((1, T, F)).astype(np.float32) * 5 + 2

    t = torch.from_numpy(feats[0].T.copy())  # (64, T) like the reference
    std, mean = torch.std_mean(t)
    golden = ((t - mean) / std).numpy().T

    ours = np.asarray(normalize_features(jnp.asarray(feats), jnp.asarray([T], jnp.int32))[0])
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)


def test_normalize_ignores_padding():
    rng = np.random.default_rng(4)
    T_true, T_pad, F = 50, 80, 64
    feats = np.zeros((1, T_pad, F), np.float32)
    feats[0, :T_true] = rng.standard_normal((T_true, F)).astype(np.float32)

    padded = np.asarray(normalize_features(jnp.asarray(feats), jnp.asarray([T_true], jnp.int32))[0])
    solo = np.asarray(
        normalize_features(jnp.asarray(feats[:, :T_true]), jnp.asarray([T_true], jnp.int32))[0]
    )
    np.testing.assert_allclose(padded[:T_true], solo, rtol=1e-5, atol=1e-6)
    assert np.all(padded[T_true:] == 0)


def test_preemphasis_prev_sample():
    """prev_samples stitches a crop boundary exactly like preemph-then-crop."""
    rng = np.random.default_rng(5)
    wave = rng.standard_normal(3200).astype(np.float32)
    offset, crop_len = 100, 3000

    full = torch_reference_logmel(wave)  # unused directly; just sanity torch import
    del full

    # reference order: preemph on the full waveform, then crop
    pre = np.concatenate([wave[:1], wave[1:] - 0.97 * wave[:-1]])
    ref_crop = pre[offset : offset + crop_len]

    from lightning_asr_tpu.ops.frontend import _preemphasis

    crop = wave[offset : offset + crop_len]
    ours = np.asarray(
        _preemphasis(jnp.asarray(crop)[None], jnp.asarray([wave[offset - 1]]), 0.97)[0]
    )
    np.testing.assert_allclose(ours, ref_crop, rtol=1e-6, atol=1e-7)


def test_logmel_dual_config_matches_torch():
    """The dual-stream mel config (win 400 / hop 320 / pad 0,
    ssl_data_module_double.py:93-97) must also match torch exactly."""
    from lightning_asr_tpu.models.dual_stream import DUAL_MEL_CONFIG

    cfg = MelFrontendConfig(win_length=400, hop_length=320, pad=0, dither=0.0)
    assert DUAL_MEL_CONFIG.win_length == 400 and DUAL_MEL_CONFIG.pad == 0

    rng = np.random.default_rng(11)
    n = 16000
    wave = (rng.standard_normal(n) * 0.1).astype(np.float32)

    y = torch.from_numpy(wave).double().unsqueeze(0)
    y = torch.cat((y[:, 0].unsqueeze(1), y[:, 1:] - 0.97 * y[:, :-1]), dim=1)
    window = torch.hann_window(400, periodic=True, dtype=torch.float64)
    spec = torch.stft(y, n_fft=512, hop_length=320, win_length=400, window=window,
                      center=True, pad_mode="reflect", normalized=False,
                      onesided=True, return_complex=True)
    power = spec.real ** 2 + spec.imag ** 2
    fb = torch_mel_filterbank()
    mel = torch.matmul(power.transpose(1, 2), fb).transpose(1, 2)
    golden = (10.0 * torch.log10(torch.clamp(mel, min=1e-10))).squeeze(0).numpy()

    mels, mel_lens = log_mel_spectrogram(
        jnp.asarray(wave)[None], jnp.asarray([n], jnp.int32), cfg)
    assert int(mel_lens[0]) == golden.shape[1]
    np.testing.assert_allclose(np.asarray(mels[0]).T, golden, rtol=0, atol=2e-3)


def test_filterbank_matches_torchaudio():
    ours = mel_filterbank(CFG)
    golden = torch_mel_filterbank().numpy()
    np.testing.assert_allclose(ours, golden, rtol=0, atol=1e-6)


def test_logmel_matches_recorded_goldens():
    """Committed .npz goldens (scripts/record_frontend_goldens.py): 10 varied
    signals (tones, sweep, AM, silence, clipping, odd/short/long lengths, DC
    offset).  The archive records its oracle — real torchaudio when the
    recording env has it, else the float64 formula reconstruction — so the
    parity chain no longer depends on rebuilding the oracle at test time."""
    import pathlib

    path = pathlib.Path(__file__).parent / "goldens" / "frontend_goldens.npz"
    data = np.load(path)
    names = sorted(k.split("/", 1)[1] for k in data.files if k.startswith("wave/"))
    assert len(names) == 10, names
    for name in names:
        wave = data[f"wave/{name}"]
        golden = data[f"logmel/{name}"]  # (64, T)
        n = wave.shape[0]
        mels, mel_lens = log_mel_spectrogram(
            jnp.asarray(wave)[None, :], jnp.asarray([n], jnp.int32), CFG)
        assert int(mel_lens[0]) == golden.shape[1], name
        ours = np.asarray(mels[0, : golden.shape[1]]).T
        err = np.abs(ours - golden)
        # Audible cells (> -60 dB) are essentially exact; cells at the
        # spectral-null floor differ only by fp32-vs-fp64 leakage (harmless
        # after the per-utterance normalization that always follows).
        loud = golden > -50.0
        assert err[loud].max() < 2e-3 if loud.any() else True, name
        # spectral-null cells (< -50 dB) may differ by ~1 dB from fp32
        # summation-order effects; they are zero-information after the
        # per-utterance normalization that always follows
        assert err.max() < 2.0, name


def test_logmel_within_float32_oracle_band():
    """VERDICT r3 #3: the goldens carry a SECOND arm — the same torchaudio
    0.8.1 formulas in float32, torchaudio's ACTUAL compute dtype (its
    transforms are plain float32 torch ops over torch.stft; nothing
    upcasts).  Our device output must sit inside that arm's own numeric
    noise: per golden, device-vs-fp32 error on audible cells is bounded by
    max(2e-3 dB, 4x the fp32-vs-fp64 oracle spread).  Measured bands at
    recording time (dB, loud cells > -50): fp32-vs-fp64 <= 1.4e-3; see
    scripts/record_frontend_goldens.py.  Reference pipeline:
    /root/reference/data_module.py:68-71."""
    import pathlib

    path = pathlib.Path(__file__).parent / "goldens" / "frontend_goldens.npz"
    data = np.load(path)
    assert str(data["oracle_f32"]) == "float32-torch-reconstruction"
    names = sorted(k.split("/", 1)[1] for k in data.files if k.startswith("wave/"))
    deltas = {}
    for name in names:
        wave = data[f"wave/{name}"]
        truth64 = data[f"logmel/{name}"]
        oracle32 = data[f"logmel_f32/{name}"]
        mels, mel_lens = log_mel_spectrogram(
            jnp.asarray(wave)[None, :], jnp.asarray([int(wave.shape[0])], jnp.int32), CFG)
        ours = np.asarray(mels[0, : oracle32.shape[1]]).T
        loud = truth64 > -50.0
        if not loud.any():
            continue
        dev_err = np.abs(ours - oracle32)[loud].max()
        oracle_band = np.abs(oracle32 - truth64)[loud].max()
        deltas[name] = {"device_vs_fp32_db": float(dev_err),
                        "fp32_vs_fp64_db": float(oracle_band)}
        assert dev_err < max(2e-3, 4.0 * oracle_band), (name, deltas[name])
        # everywhere (incl. spectral nulls): same 2 dB cap as the truth arm
        assert np.abs(ours - oracle32).max() < 2.0, name
    # record the measured deltas for the artifact trail
    print("device-vs-fp32 oracle deltas (dB):", deltas)
