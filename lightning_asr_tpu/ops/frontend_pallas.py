"""Fused preemphasis + torchaudio-style signal extension as one Pallas pass.

The mel frontend's host-of-concats — preemphasis shift
(``ops/frontend.py::_preemphasis``) followed by the per-sample
(zero-pad | reflect-pad) extension (``_extend_signal``) — costs several
full-size (B, ~270k-sample) materializations under XLA: the shifted copy,
the 5-way base concatenate, and the vmapped tail fixup each stream ~34 MB
through HBM at the bench shapes.  This kernel writes the extended output
EXACTLY ONCE, reading the padded waveforms exactly once:

  * the preemphasized body lands via two stores (sample 0 against
    ``prev_samples``, samples 1.. as a shifted-slice subtract) — no
    materialized shift;
  * the head mirror + the L-dependent tail mirror are tiny (n_fft//2
    samples per row); they are precomputed outside on small slices and the
    kernel stores them at their (static / per-row dynamic) offsets;
  * the trailing zero region is stored directly, covering the frame-matmul
    DFT's chunk padding too, so ``log_mel_spectrogram``'s extra concat
    disappears as well.

Semantics match ``_preemphasis`` + ``_extend_signal`` bit-for-bit for
L > n_fft//2 + pad (the same support constraint the XLA path documents);
reference numerics per ``/root/reference/data_module.py:155-161`` (dither →
preemphasis 0.97 → MelSpectrogram(center=True, reflect, pad=32)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .frontend import MelFrontendConfig


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(waves_ref, lens_ref, prev_ref, head_ref, tail_ref, out_ref,
            *, coeff: float, S: int, half: int, pad: int, out_total: int):
    # refs are (1, 1, X) blocks; [0] views them as (1, X) 2-D rows
    L = lens_ref[0, 0, 0]
    r = waves_ref[0]                                   # (1, S)
    idx = lax.broadcasted_iota(jnp.int32, (1, S), 1)

    # body: y'[j] = (r[j] - c*r[j-1]) masked to j < L, at offset half+pad
    main = jnp.where(idx[:, 1:] < L, r[:, 1:] - coeff * r[:, :-1], 0.0)
    first = (r[:, 0] - coeff * prev_ref[0, 0, 0]).reshape(1, 1)
    out_ref[0, :, half + pad : half + pad + 1] = first
    out_ref[0, :, half + pad + 1 : half + pad + S] = main

    # head mirror (precomputed, static offset 0) and the pad-gap zeros
    out_ref[0, :, 0:half] = head_ref[0]
    out_ref[0, :, half : half + pad] = jnp.zeros((1, pad), out_ref.dtype)

    # static trailing zeros from the end of the body region onward
    out_ref[0, :, half + pad + S : out_total] = jnp.zeros(
        (1, out_total - half - pad - S), out_ref.dtype)

    # tail mirror at its L-dependent offset.  Mosaic only allows dynamic
    # lane offsets that are provably 128-aligned, so: snap to the aligned
    # window containing [off, off+half), rotate the tail into lane position,
    # and blend with what's already there (the window prefix can hold real
    # body samples when pad < 128).
    off = L + 2 * pad + half
    astart = pl.multiple_of((off // 128) * 128, 128)
    shift = off - astart                               # 0..127
    W = half + 128
    old = out_ref[0, :, pl.ds(astart, W)]              # (1, W)
    tailw = jnp.concatenate(
        [tail_ref[0], jnp.zeros((1, 128), out_ref.dtype)], axis=1)
    rolled = pltpu.roll(tailw, shift, axis=1)
    pos = lax.broadcasted_iota(jnp.int32, (1, W), 1)
    keep_tail = (pos >= shift) & (pos < shift + half)
    out_ref[0, :, pl.ds(astart, W)] = jnp.where(keep_tail, rolled, old)


@functools.partial(jax.jit, static_argnames=("cfg", "out_total", "interpret"))
def extend_preemph(
    waves: jnp.ndarray,
    wave_lens: jnp.ndarray,
    prev_samples: jnp.ndarray | None,
    cfg: MelFrontendConfig = MelFrontendConfig(),
    out_total: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused ``_preemphasis`` + ``_extend_signal``.

    Args:
      waves: (B, S) float32 padded waveforms (post-dither, pre-preemphasis).
      wave_lens: (B,) int32 true sample counts (each > n_fft//2 + pad).
      prev_samples: optional (B,) raw sample preceding each crop window.
      out_total: optional output length ≥ S + 2*pad + n_fft; the surplus is
        zero-filled (lets the DFT's chunk padding ride along for free).

    Returns:
      (B, out_total) float32; [:, :S + 2*pad + n_fft] equals
      ``_extend_signal(_preemphasis(waves, prev), lens)`` and the rest is 0.
    """
    B, S = waves.shape
    half = cfg.n_fft // 2
    pad = cfg.pad
    coeff = cfg.preemph
    out_len = S + 2 * pad + cfg.n_fft
    if out_total is None:
        out_total = _round_up(out_len + 128, 128)
    # the aligned tail read-modify-write can touch up to 128 lanes past
    # out_len (when the tail offset is already aligned)
    assert out_total >= out_len + 128, (out_total, out_len)
    if interpret is None:
        interpret = _interpret_default()

    waves = waves.astype(jnp.float32)
    lens = wave_lens.astype(jnp.int32)
    prev = (jnp.zeros((B,), jnp.float32) if prev_samples is None
            else prev_samples.astype(jnp.float32))

    # ---- tiny mirrors, precomputed on small slices ----------------------
    # head: q[j] = y'[half - pad - j] for j ≤ half-pad (pad>0); the mirror
    # region is far below L so no masking is needed.
    n_head = min(half - pad + 1, half)
    head_start = (half - pad + 1) - n_head
    hsl = waves[:, : half - pad + 1]                     # (B, ≤225)
    hprev = jnp.concatenate([prev[:, None], hsl[:, :-1]], axis=1)
    hp = hsl - coeff * hprev
    head = jnp.flip(hp[:, head_start:], axis=1)
    head = jnp.concatenate(
        [head, jnp.zeros((B, half - n_head), jnp.float32)], axis=1)  # (B, half)

    # tail: y'[L+pad-2-w] descending, w ∈ [max(pad-1,0), half); indices all
    # < L.  Slice n_tail+1 raw samples so the local preemphasis sees its
    # predecessor.
    tail_zeros = max(pad - 1, 0)
    n_tail = half - tail_zeros

    def tail_row(row, L):
        start = jnp.maximum(L + pad - 1 - half, 0)
        seg = lax.dynamic_slice(row, (start - 1,), (n_tail + 1,))
        vals = seg[1:] - coeff * seg[:-1]
        return jnp.concatenate(
            [jnp.zeros((tail_zeros,), jnp.float32), jnp.flip(vals)])

    tail = jax.vmap(tail_row)(waves, lens)               # (B, half)

    # Mosaic needs the last two block dims ∈ {multiple of (8,128), full dim};
    # a dummy middle axis makes every per-row block (1, 1, X) with its last
    # two dims equal to the array's.
    blk = lambda X: pl.BlockSpec((1, 1, X), lambda b: (b, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, coeff=coeff, S=S, half=half, pad=pad,
                          out_total=out_total),
        grid=(B,),
        in_specs=[blk(S), blk(1), blk(1), blk(half), blk(half)],
        out_specs=blk(out_total),
        out_shape=jax.ShapeDtypeStruct((B, 1, out_total), jnp.float32),
        interpret=interpret,
    )(waves[:, None, :], lens[:, None, None], prev[:, None, None],
      head[:, None, :], tail[:, None, :])
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# Fused DFT + power + mel + dB kernel (the frontend's heavy half).
#
# The XLA path materializes the full (B, T, 2F) fp32 spectrum (110 MB at the
# bench shapes) plus the power tensor before the tiny mel projection — the
# roofline trace attributes ~2.2 ms/step to the frontend, ~5x its bandwidth
# bound (ROOFLINE.json).  This kernel tiles T and keeps the spectrum tile in
# VMEM: per (batch-row, 256-frame) tile it builds the overlapping frames
# from a (260, hop) view via static sublane slices, runs the windowed-DFT
# matmuls (bf16 multiplies, fp32 accumulation — the "default" training
# tier's exact semantics), squares into power, projects through the mel
# filterbank, and writes ONLY the (256, n_mels) log-mel tile.  HBM traffic
# drops from ~3 full spectra to waves-in + mels-out.
#
# Numerics: identical operation order to the XLA default tier up to the
# chunked-vs-single contraction split (both bf16-multiply/fp32-accumulate);
# parity is gated on the real chip by scripts/pallas_parity.py and in
# tests (interpret mode) against the XLA tier.
# ---------------------------------------------------------------------------

_MEL_TT = 256  # frames per tile


def _mel_kernel(q_ref, filt_ref, fb_ref, out_ref, *, n_chunks: int,
                hop: int, amin: float):
    v = q_ref[0]                                        # (TT + n_chunks, hop)
    # frame i = q[i*hop : i*hop + n_chunks*hop][: n_fft]: n_chunks
    # accumulating hop-wide dots over static sublane-shifted slices — the
    # SAME chunked contraction order as the XLA default tier (Mosaic cannot
    # lane-concat slices whose layouts carry different sublane offsets)
    spec = None
    for j in range(n_chunks):
        xj = v[j : j + _MEL_TT].astype(jnp.bfloat16)    # (TT, hop)
        wj = filt_ref[j * hop : (j + 1) * hop]          # (hop, 2*FPAD)
        d = jnp.dot(xj, wj, preferred_element_type=jnp.float32)
        spec = d if spec is None else spec + d          # (TT, 2*FPAD)
    half = filt_ref.shape[1] // 2
    power = spec[:, :half] ** 2 + spec[:, half:] ** 2   # (TT, FPAD)
    mel = jnp.dot(power.astype(jnp.bfloat16), fb_ref[...],
                  preferred_element_type=jnp.float32)   # (TT, 128)
    out_ref[0] = 10.0 * jnp.log10(jnp.maximum(mel, amin))


@functools.partial(jax.jit, static_argnames=("cfg", "T", "interpret"))
def mel_from_extended(q: jnp.ndarray, cfg: MelFrontendConfig, T: int,
                      interpret: bool | None = None) -> jnp.ndarray:
    """(B, >=needed) extended/preemphasized signal -> (B, T, n_mels) log-mel
    dB, fused in VMEM.  Training ("default" precision) tier only."""
    from .frontend import dft_filters, mel_filterbank

    if interpret is None:
        interpret = _interpret_default()
    B, _ = q.shape
    hop, n_fft, n_mels = cfg.hop_length, cfg.n_fft, cfg.n_mels
    n_chunks = -(-n_fft // hop)
    n_tiles = -(-T // _MEL_TT)
    rows_per_tile = _MEL_TT + n_chunks
    need = n_tiles * _MEL_TT * hop + n_chunks * hop
    if q.shape[1] < need:
        q = jnp.concatenate(
            [q, jnp.zeros((B, need - q.shape[1]), q.dtype)], axis=1)

    # overlapping (260, hop) tile views; the copy is ~1.25x the waveform
    # bytes — negligible next to the spectra the XLA path materializes
    tiles = jnp.stack(
        [q[:, i * _MEL_TT * hop : i * _MEL_TT * hop + rows_per_tile * hop]
         for i in range(n_tiles)], axis=1)              # (B, n_tiles, rows*hop)
    tiles = tiles.reshape(B * n_tiles, rows_per_tile, hop)

    # filters, transposed + lane-padded so the power split lands on
    # 128-multiples: FPAD = round_up(n_freqs, 128); cols [0:F) cos,
    # [FPAD:FPAD+F) -sin, zero elsewhere.  Rows padded to n_chunks*hop so
    # the kernel's per-chunk row slices stay in range (rows past n_fft are
    # zero — the final partial chunk contributes nothing there).
    F = cfg.n_freqs
    FPAD = _round_up(F, 128)
    f = dft_filters(cfg)                                # (2F, n_fft) f32
    filt = jnp.zeros((n_chunks * hop, 2 * FPAD), jnp.float32)
    filt = filt.at[:n_fft, :F].set(f[:F].T).at[:n_fft, FPAD : FPAD + F].set(f[F:].T)
    filt = filt.astype(jnp.bfloat16)

    # n_mels (64) lanes exactly: a block whose last dim EQUALS the array dim
    # is legal below 128, and writing 64 lanes directly spares the padded
    # 128-lane output + the post-slice copy XLA would otherwise insert
    fbp = jnp.zeros((FPAD, n_mels), jnp.float32)
    fbp = fbp.at[:F, :n_mels].set(jnp.asarray(mel_filterbank(cfg)))
    fbp = fbp.astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_mel_kernel, n_chunks=n_chunks, hop=hop,
                          amin=float(cfg.amin)),
        grid=(B * n_tiles,),
        in_specs=[
            pl.BlockSpec((1, rows_per_tile, hop), lambda i: (i, 0, 0)),
            pl.BlockSpec((n_chunks * hop, 2 * FPAD), lambda i: (0, 0)),
            pl.BlockSpec((FPAD, n_mels), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _MEL_TT, n_mels), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (B * n_tiles, _MEL_TT, n_mels), jnp.float32),
        interpret=interpret,
    )(tiles, filt, fbp)
    out = out.reshape(B, n_tiles * _MEL_TT, n_mels)
    return out[:, :T, :]
