"""Parity: fused preemph+extend Pallas kernel vs the XLA composition
(``_preemphasis`` + ``_extend_signal``) it replaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_asr_tpu.ops.frontend import (
    MelFrontendConfig, _extend_signal, _preemphasis)
from lightning_asr_tpu.ops.frontend_pallas import extend_preemph


def _ref(waves, lens, prev, cfg):
    return _extend_signal(_preemphasis(waves, prev, cfg.preemph), lens, cfg)


@pytest.mark.parametrize("pad", [32, 0])
def test_matches_xla_composition(pad):
    cfg = MelFrontendConfig(pad=pad)
    rng = np.random.default_rng(0)
    B, S = 4, 4096
    waves = rng.standard_normal((B, S)).astype(np.float32)
    lens = np.array([4096, 3991, 1200, 801], np.int32)
    got = extend_preemph(jnp.asarray(waves), jnp.asarray(lens), None, cfg)
    want = _ref(jnp.asarray(waves), jnp.asarray(lens), None, cfg)
    out_len = S + 2 * cfg.pad + cfg.n_fft
    # ulp-level tolerance: the jitted kernel FMA-contracts a*b-c where the
    # eager composition rounds the product first
    np.testing.assert_allclose(np.asarray(got)[:, :out_len],
                               np.asarray(want), rtol=2e-6, atol=2e-6)
    # surplus (DFT chunk padding ride-along) must be exactly zero
    np.testing.assert_array_equal(np.asarray(got)[:, out_len:], 0.0)


def test_prev_samples_and_out_total():
    cfg = MelFrontendConfig()
    rng = np.random.default_rng(1)
    B, S = 3, 2048
    waves = rng.standard_normal((B, S)).astype(np.float32)
    lens = np.array([2048, 1700, 900], np.int32)
    prev = rng.standard_normal((B,)).astype(np.float32)
    out_total = ((S + 2 * cfg.pad + cfg.n_fft) // 160 + 5) * 160
    got = extend_preemph(jnp.asarray(waves), jnp.asarray(lens),
                         jnp.asarray(prev), cfg, out_total=out_total)
    want = _ref(jnp.asarray(waves), jnp.asarray(lens), jnp.asarray(prev), cfg)
    assert got.shape == (B, out_total)
    np.testing.assert_allclose(
        np.asarray(got)[:, : want.shape[1]], np.asarray(want),
        rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(got)[:, want.shape[1]:], 0.0)


def test_log_mel_end_to_end_flag_on_vs_off():
    """Whole-frontend equivalence: log_mel_spectrogram with the fused kernel
    vs the XLA composition, including frame count and lengths."""
    from lightning_asr_tpu.ops import frontend as fe

    cfg = MelFrontendConfig()
    rng = np.random.default_rng(3)
    B, S = 3, 56000
    waves = (0.1 * rng.standard_normal((B, S))).astype(np.float32)
    lens = np.array([56000, 43210, 20000], np.int32)
    try:
        fe.set_frontend_pallas(False)
        want, want_lens = fe.log_mel_spectrogram(
            jnp.asarray(waves), jnp.asarray(lens), cfg)
        fe.set_frontend_pallas(True)
        # the jit cache keys on static cfg (not the extend gate), so reuse
        # would return the stale trace — call the unjitted impl directly
        got, got_lens = fe._log_mel_impl.__wrapped__(
            jnp.asarray(waves), jnp.asarray(lens), cfg, None, None,
            fe._mel_pallas_now(cfg))
    finally:
        fe.set_frontend_pallas(False)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got_lens), np.asarray(want_lens))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_grad_flows_like_xla():
    """dither → preemph+extend is on the (non-differentiated) data path, but
    keep the kernel usable under jit-of-grad contexts: it must at least not
    break tracing inside a jitted function that also computes grads w.r.t.
    other inputs."""
    cfg = MelFrontendConfig()
    waves = jnp.asarray(np.random.default_rng(2)
                        .standard_normal((2, 1024)).astype(np.float32))
    lens = jnp.array([1024, 700], jnp.int32)

    @jax.jit
    def f(scale):
        q = extend_preemph(waves * 1.0, lens, None, cfg)
        return (scale * q).sum()

    g = jax.grad(f)(jnp.float32(2.0))
    q = extend_preemph(waves, lens, None, cfg)
    np.testing.assert_allclose(float(g), float(q.sum()), rtol=1e-6)


def test_mel_kernel_matches_bf16_emulated_tier():
    """ops/frontend_pallas.py::mel_from_extended vs a reference that
    emulates the TPU "default" tier's exact semantics (bf16 multiplies,
    fp32 accumulation, same hop-chunk contraction order) built from the
    same extended signal.  On CPU the plain XLA einsum runs full fp32, so
    the emulation — not the XLA path — is the apples-to-apples oracle;
    the on-chip XLA-vs-Pallas gate lives in scripts/pallas_parity.py."""
    from lightning_asr_tpu.ops.frontend import (
        MelFrontendConfig, _extend_signal, _preemphasis, dft_filters,
        mel_filterbank, mel_num_frames)
    from lightning_asr_tpu.ops.frontend_pallas import mel_from_extended

    cfg = MelFrontendConfig(dither=0.0, precision="default")
    rng = np.random.default_rng(3)
    B, S = 3, 53000
    waves = jnp.asarray((rng.standard_normal((B, S)) * 0.2).astype(np.float32))
    lens = jnp.asarray(np.array([S, 40001, 21000], np.int32))

    q = _extend_signal(_preemphasis(waves, None, cfg.preemph), lens, cfg)
    hop, n_fft = cfg.hop_length, cfg.n_fft
    S_ext = q.shape[1]
    T = (S_ext - n_fft) // hop + 1
    n_chunks = -(-n_fft // hop)
    needed = (T + n_chunks) * hop
    qp = jnp.concatenate([q, jnp.zeros((B, needed - S_ext), q.dtype)], axis=1)

    # bf16-emulated default tier, chunk order identical to the kernel
    filters = jnp.asarray(dft_filters(cfg))
    qf = qp.reshape(B, T + n_chunks, hop)
    spec = None
    for j in range(n_chunks):
        w = filters[:, j * hop : min((j + 1) * hop, n_fft)].astype(jnp.bfloat16)
        xj = qf[:, j : j + T, : w.shape[1]].astype(jnp.bfloat16)
        part = jnp.einsum("bth,fh->btf", xj, w,
                          preferred_element_type=jnp.float32)
        spec = part if spec is None else spec + part
    F = cfg.n_freqs
    power = spec[..., :F] ** 2 + spec[..., F:] ** 2
    fb = jnp.asarray(mel_filterbank(cfg)).astype(jnp.bfloat16)
    mel = jnp.einsum("btf,fm->btm", power.astype(jnp.bfloat16), fb,
                     preferred_element_type=jnp.float32)
    want = np.asarray(10.0 * jnp.log10(jnp.maximum(mel, cfg.amin)))

    got = np.asarray(mel_from_extended(q, cfg, T))
    assert got.shape == (B, T, cfg.n_mels) == want.shape
    assert int(mel_num_frames(S, cfg)) == T
    # identical op order + dtypes -> residual is sub-bf16-ulp dB noise from
    # fusion-dependent rounding (padded filter lanes contribute exact zeros)
    err = np.abs(got - want)
    assert err.max() < 5e-3, err.max()


def test_mel_kernel_gate_respects_precision_tier():
    """The fused kernel must serve ONLY the "default" (training) tier; the
    "highest" parity tier keeps the XLA path bitwise intact."""
    from lightning_asr_tpu.ops.frontend import (
        MelFrontendConfig, log_mel_spectrogram, set_mel_pallas)

    rng = np.random.default_rng(0)
    waves = jnp.asarray((rng.standard_normal((1, 16000)) * 0.2).astype(np.float32))
    lens = jnp.asarray(np.array([16000], np.int32))
    cfg_hi = MelFrontendConfig(dither=0.0, precision="highest")
    set_mel_pallas(False)
    a, _ = log_mel_spectrogram(waves, lens, cfg_hi)
    set_mel_pallas(True)
    b, _ = log_mel_spectrogram(waves, lens, cfg_hi)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
