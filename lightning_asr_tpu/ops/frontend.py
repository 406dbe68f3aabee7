"""On-device log-mel frontend — GEMM-native STFT, exact torchaudio semantics.

The reference computes per-utterance log-mels on CPU in dataloader workers
(``/root/reference/data_module.py:150-174``):

    1. dither: ``y += 1e-5 * randn``
    2. preemphasis 0.97: ``cat(y[0], y[1:] - 0.97*y[:-1])``
    3. MelSpectrogram(sr=16000, n_fft=512, pad=32, win_length=320,
       hop_length=160, n_mels=64)  — torchaudio 0.8.1 defaults: center=True
       reflect pad, periodic Hann window (zero-padded to n_fft centered),
       power=2, HTK mel scale, no filterbank norm, f_min=0, f_max=sr/2
       (``data_module.py:68-70``)
    4. AmplitudeToDB(stype="power"): ``10*log10(clamp(x, 1e-10))``
       (``data_module.py:71,161``)
    5. per-utterance normalization ``(y-mean)/std`` with torch's unbiased std
       (``data_module.py:171-172``)

Here the whole pipeline runs batched on the TPU under jit.  Design:

  * the (zero-pad 32 | reflect-pad 256) signal extension is a vectorized
    gather driven by *per-sample true lengths*, so every valid frame matches
    the reference exactly even inside a padded batch;
  * the windowed DFT is a strided conv1d against 2*(n_fft//2+1) fixed
    cos/sin filters (window folded in) — an implicit GEMM that XLA maps onto
    the MXU, instead of an FFT;
  * mel projection is one more matmul; log/normalize fuse into it.

Kernel-design note: an explicit Pallas "framing" kernel (materialize
(frames, n_fft) windows then pl.dot) was evaluated and rejected — the hop
stride (160) is not lane-aligned (128), so explicit frame extraction costs a
relayout per frame, while XLA's strided-conv lowering handles the overlap as
an implicit GEMM natively.  The fused-kernel budget went to CTC
(ops/ctc_pallas.py) where XLA's scan scheduling actually loses time.

Output layout is (B, T, n_mels) — time-major NTC, the natural layout for
the NWC conv encoder that follows.
"""

from __future__ import annotations

import dataclasses
import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclass(frozen=True)
class MelFrontendConfig:
    sample_rate: int = 16000
    n_fft: int = 512
    win_length: int = 320        # 0.02 s at 16 kHz
    hop_length: int = 160        # win // 2
    n_mels: int = 64
    pad: int = 32                # constant zero pad (Spectrogram `pad=`)
    preemph: float = 0.97
    dither: float = 1e-5
    f_min: float = 0.0
    f_max: Optional[float] = None  # defaults to sr/2
    amin: float = 1e-10
    # HIGHEST keeps fp32 MXU passes for bitwise-close parity with torchaudio;
    # set to "default" to trade parity for speed.
    precision: str = "highest"

    @property
    def fmax(self) -> float:
        return self.f_max if self.f_max is not None else self.sample_rate / 2.0

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def total_pad(self) -> int:
        # zero pad both sides + center reflect pad both sides
        return self.pad + self.n_fft // 2

    @classmethod
    def from_dict(cls, d: dict) -> "MelFrontendConfig":
        """Rebuild from a checkpoint-hparams dict (unknown keys ignored, so
        old checkpoints and future fields stay loadable)."""
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def lax_precision(self) -> lax.Precision:
        return {
            "highest": lax.Precision.HIGHEST,  # fp32 (6-pass) — bitwise parity
            "high": lax.Precision.HIGH,        # 3-pass bf16 — ~1e-3 dB error
            "default": lax.Precision.DEFAULT,  # 1-pass bf16 — fastest
        }[self.precision]


_FRONTEND_PALLAS = os.environ.get("LASR_FRONTEND_PALLAS", "0") == "1"
_MEL_PALLAS = os.environ.get("LASR_MEL_PALLAS", "1") == "1"


def mel_pallas_enabled() -> bool:
    """Fused DFT+power+mel Pallas kernel for the TRAINING ("default"
    precision) tier (``ops/frontend_pallas.py::mel_from_extended``).
    Default on; disable with LASR_MEL_PALLAS=0.  The "highest"/"high"
    parity tiers always use the XLA path."""
    return _MEL_PALLAS


def set_mel_pallas(on: bool) -> None:
    global _MEL_PALLAS
    _MEL_PALLAS = bool(on)


def frontend_pallas_enabled() -> bool:
    """Route preemph+extend through the fused Pallas kernel
    (``ops/frontend_pallas.py``).  Default off; enable with
    ``set_frontend_pallas(True)`` or LASR_FRONTEND_PALLAS=1."""
    return _FRONTEND_PALLAS


def set_frontend_pallas(on: bool) -> None:
    global _FRONTEND_PALLAS
    _FRONTEND_PALLAS = bool(on)


def mel_num_frames(num_samples, cfg: MelFrontendConfig = MelFrontendConfig()):
    """Frame count for a signal of `num_samples` samples (python int or array):
    1 + (num_samples + 2*pad + 2*(n_fft//2) - n_fft) // hop."""
    return 1 + (num_samples + 2 * cfg.pad + 2 * (cfg.n_fft // 2) - cfg.n_fft) // cfg.hop_length


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window, torch.hann_window(periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * math.pi * n / win_length))).astype(np.float64)


def mel_filterbank(cfg: MelFrontendConfig) -> np.ndarray:
    """HTK-scale triangular filterbank, no norm — torchaudio
    ``create_fb_matrix`` semantics. Shape (n_freqs, n_mels)."""
    all_freqs = np.linspace(0.0, cfg.sample_rate // 2, cfg.n_freqs, dtype=np.float64)

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    m_min = hz_to_mel(cfg.f_min)
    m_max = hz_to_mel(cfg.fmax)
    m_pts = np.linspace(m_min, m_max, cfg.n_mels + 2)
    f_pts = mel_to_hz(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]                      # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]         # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def dft_filters(cfg: MelFrontendConfig) -> np.ndarray:
    """Windowed DFT as conv filters: (2*n_freqs, n_fft) float32.
    Rows [0, n_freqs) are cos (real part), [n_freqs, 2*n_freqs) are -sin
    (imag part).  The win_length window is centered in the n_fft frame the
    way torch.stft pads it."""
    n_fft, win, n_freqs = cfg.n_fft, cfg.win_length, cfg.n_freqs
    w = np.zeros(n_fft, dtype=np.float64)
    left = (n_fft - win) // 2
    w[left : left + win] = hann_window(win)
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freqs, dtype=np.float64)
    ang = 2.0 * math.pi * k[:, None] * n[None, :] / n_fft
    cos_f = np.cos(ang) * w[None, :]
    sin_f = -np.sin(ang) * w[None, :]
    return np.concatenate([cos_f, sin_f], axis=0).astype(np.float32)


def _extend_signal(waves: jnp.ndarray, wave_lens: jnp.ndarray, cfg: MelFrontendConfig) -> jnp.ndarray:
    """Per-sample (zero-pad `pad` | reflect-pad n_fft//2) extension of a
    padded batch — WITHOUT a large gather (gathers run on the TPU's scalar
    path, ~100x slower per element than vector work).

    For a sample of true length L, with z = [pad zeros | y[:L] | pad zeros]
    (length L' = L + 2*pad) and q[j] = z[mirror(j - half, L')]:

      * head (j < half): mirror at 0 -> q[j] = y[half - pad - 2 - j + 1]
        for j <= half - pad - 1, else 0 — a STATIC flip of the first
        samples, identical layout for every sample in the batch;
      * body: [pad zeros | y (masked beyond L) | zeros];
      * tail (j >= L' + half): mirror at L' -> a flipped window of the last
        samples, written per sample with a vmapped dynamic slice+update
        (tiny: half+pad samples per sample).

    Assumes padded positions of `waves` may be non-zero (dither) — masked
    here; and L > half + pad (utterances shorter than ~18 ms unsupported).
    """
    B, S = waves.shape
    half = cfg.n_fft // 2          # 256
    pad = cfg.pad                  # 32
    out_len = S + 2 * pad + cfg.n_fft

    idx = lax.broadcasted_iota(jnp.int32, (1, S), 1)
    y = jnp.where(idx < wave_lens[:, None], waves, 0.0)

    # head: q[j] = y[half - pad - j] where the mirror lands inside the
    # signal (j <= half - pad and mirror index m = half - j > pad); zeros
    # where it lands in the zero-pad region.  pad=0 shifts the window by one
    # (reflect excludes the boundary sample).
    n_head = min(half - pad + 1, half)
    head_start = (half - pad + 1) - n_head  # 0 for pad>0, 1 for pad=0
    head = jnp.flip(y[:, head_start : half - pad + 1], axis=1)
    head_zeros = jnp.zeros((B, half - n_head), waves.dtype)

    base = jnp.concatenate(
        [head, head_zeros,
         jnp.zeros((B, pad), waves.dtype), y,
         jnp.zeros((B, out_len - half - pad - S), waves.dtype)],
        axis=1,
    )

    # tail: at j = L' + half + w (w in [0, half)) the end-mirror gives
    #   src = 2L' - 2 - (j - half) - pad = L + pad - 2 - w,
    # valid iff 0 <= src < L i.e. w >= pad - 1; smaller w land in the zero
    # pad.  So the window is [max(pad-1,0) zeros | y[L-1], y[L-2], ...]
    # (starting at y[L-2] when pad == 0 — reflect excludes the edge sample).
    tail_zeros = max(pad - 1, 0)
    n_tail = half - tail_zeros
    def fixup(row, base_row, L):
        start = jnp.maximum(L + pad - 1 - half, 0)
        window = lax.dynamic_slice(row, (start,), (n_tail,))
        tail_vals = jnp.flip(window)  # y[L+pad-2-w] descending
        tail = jnp.concatenate([jnp.zeros((tail_zeros,), row.dtype), tail_vals])
        return lax.dynamic_update_slice(base_row, tail, (L + 2 * pad + half,))

    return jax.vmap(fixup)(y, base, wave_lens)


def _preemphasis(waves: jnp.ndarray, prev_samples: Optional[jnp.ndarray], coeff: float) -> jnp.ndarray:
    """y'[t] = y[t] - c*y[t-1]; the first sample subtracts `prev_samples`
    (the raw sample preceding a training-time crop) or nothing, matching the
    reference where preemphasis runs before cropping."""
    prev = jnp.concatenate([jnp.zeros_like(waves[:, :1]), waves[:, :-1]], axis=1)
    if prev_samples is not None:
        prev = prev.at[:, 0].set(prev_samples)
    return waves - coeff * prev


def expand_wire(waves: jax.Array) -> jax.Array:
    """Expand a host wire format to float32 waveforms in-graph.

    int16 PCM (exact, sample/32768 moves on-device) and uint8 mu-law
    (quarter of float32; closed-form G.711 inverse, elementwise on the VPU)
    — the host encode LUT + this expansion are parity-locked by
    tests/test_pipeline.py (``data/pipeline.py`` mulaw_encode/decode_host).
    """
    if waves.dtype == jnp.int16:
        return waves.astype(jnp.float32) * (1.0 / 32768.0)
    if waves.dtype == jnp.uint8:
        y = (waves.astype(jnp.float32) - 128.0) * (1.0 / 127.0)
        return jnp.sign(y) * (jnp.exp(jnp.abs(y) * jnp.float32(np.log(256.0)))
                              - 1.0) * (1.0 / 255.0)
    return waves.astype(jnp.float32)


def log_mel_spectrogram(
    waves: jnp.ndarray,
    wave_lens: jnp.ndarray,
    cfg: MelFrontendConfig = MelFrontendConfig(),
    rng: Optional[jax.Array] = None,
    prev_samples: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched log-mel frontend (resolves the Pallas-kernel gates into the
    jit cache key — a flipped gate must not hit a stale executable)."""
    return _log_mel_impl(waves, wave_lens, cfg, rng, prev_samples,
                         _mel_pallas_now(cfg))


def _mel_pallas_now(cfg: MelFrontendConfig) -> bool:
    return mel_pallas_enabled() and cfg.precision == "default"


@partial(jax.jit, static_argnames=("cfg", "use_mel_pallas"))
def _log_mel_impl(
    waves: jnp.ndarray,
    wave_lens: jnp.ndarray,
    cfg: MelFrontendConfig = MelFrontendConfig(),
    rng: Optional[jax.Array] = None,
    prev_samples: Optional[jnp.ndarray] = None,
    use_mel_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched log-mel frontend.

    Args:
      waves: (B, S) float32 padded waveforms.
      wave_lens: (B,) int32 true sample counts.
      rng: optional PRNG key enabling dithering (training).
      prev_samples: optional (B,) raw sample preceding each crop window.

    Returns:
      mels: (B, T, n_mels) float32 log-mel (dB), un-normalized.
      mel_lens: (B,) int32 valid frame counts.
    """
    waves = expand_wire(waves)
    if rng is not None and cfg.dither > 0:
        waves = waves + cfg.dither * jax.random.normal(rng, waves.shape, jnp.float32)

    # frame geometry from the TRUE extension length (the Pallas path may
    # over-allocate q with zero fill, which must not add frames)
    hop, n_fft = cfg.hop_length, cfg.n_fft
    B = waves.shape[0]
    S_ext = waves.shape[1] + 2 * cfg.pad + n_fft
    T = (S_ext - n_fft) // hop + 1
    n_chunks = -(-n_fft // hop)                        # 4 for 512/160
    needed = (T + n_chunks) * hop

    if frontend_pallas_enabled():
        # fused preemph+extend Pallas kernel: one read of the waveforms, one
        # write of the extended signal, DFT chunk padding included
        from .frontend_pallas import extend_preemph

        q = extend_preemph(waves, wave_lens, prev_samples, cfg,
                           out_total=max(needed, S_ext + 128))
    else:
        waves = _preemphasis(waves, prev_samples, cfg.preemph)
        q = _extend_signal(waves, wave_lens, cfg)      # (B, S + 2*pad + n_fft)
        if needed > S_ext:
            q = jnp.concatenate(
                [q, jnp.zeros((B, needed - S_ext), q.dtype)], axis=1)

    if use_mel_pallas:
        # fused DFT+power+mel+dB Pallas kernel (training tier): spectrum
        # tiles stay in VMEM instead of materializing (B, T, 2F) fp32
        # spectra in HBM — roofline win, see ops/frontend_pallas.py
        from .frontend_pallas import mel_from_extended

        log_mel = mel_from_extended(q, cfg, T)
        mel_lens = (1 + (wave_lens + 2 * cfg.pad + 2 * (cfg.n_fft // 2)
                         - cfg.n_fft) // cfg.hop_length).astype(jnp.int32)
        return log_mel, mel_lens

    # fp32 storage throughout; cfg.precision only selects the MXU pass count
    # ("default" = 1-pass bf16 multiplies).  An all-bf16-storage variant was
    # A/B-measured slightly SLOWER in the full train step (33.2 vs 31.9 ms).
    #
    # The DFT runs as hop-aligned FRAME MATMULS instead of a strided conv:
    # window t covers hop-frames t..t+3, so spec[t] = sum_j frames[t+j] @
    # filters[:, j*hop:(j+1)*hop]^T — four (B*T,hop)x(hop,2F) MXU matmuls on
    # natural (B,T,·) layout, no im2col and no NCH transposes (the
    # lax.conv_general_dilated formulation measured ~5 ms slower here).
    filters = jnp.asarray(dft_filters(cfg))            # (2F, n_fft)
    qf = q[:, :needed].reshape(B, T + n_chunks, hop)
    spec = None
    for j in range(n_chunks):
        w = filters[:, j * hop : min((j + 1) * hop, n_fft)]  # (2F, <=hop)
        xj = qf[:, j : j + T, : w.shape[1]]
        part = jnp.einsum("bth,fh->btf", xj, w, precision=cfg.lax_precision())
        spec = part if spec is None else spec + part   # (B, T, 2F)
    F = cfg.n_freqs
    power = spec[..., :F] ** 2 + spec[..., F:] ** 2    # (B, T, F)

    fb = jnp.asarray(mel_filterbank(cfg))              # (F, n_mels)
    mel = jnp.einsum("btf,fm->btm", power, fb, precision=cfg.lax_precision())

    log_mel = 10.0 * jnp.log10(jnp.maximum(mel, cfg.amin))

    mel_lens = (1 + (wave_lens + 2 * cfg.pad + 2 * (cfg.n_fft // 2) - cfg.n_fft) // cfg.hop_length).astype(jnp.int32)
    return log_mel, mel_lens


def normalize_features(feats: jnp.ndarray, feat_lens: jnp.ndarray) -> jnp.ndarray:
    """Per-utterance (x - mean)/std over *valid* frames with torch's unbiased
    (N-1) std (``data_module.py:171-172``), zeroing padded frames afterwards
    like the reference collate (``data_module.py:230``)."""
    B, T, F = feats.shape
    mask = (lax.broadcasted_iota(jnp.int32, (B, T), 1) < feat_lens[:, None]).astype(feats.dtype)
    n = (feat_lens.astype(feats.dtype) * F)[:, None, None]
    m3 = mask[:, :, None]
    mean = jnp.sum(feats * m3, axis=(1, 2), keepdims=True) / n
    var = jnp.sum(((feats - mean) * m3) ** 2, axis=(1, 2), keepdims=True) / jnp.maximum(n - 1.0, 1.0)
    out = (feats - mean) / jnp.sqrt(jnp.maximum(var, 1e-20))
    return out * m3
