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
        # the jit cache keys on static cfg only, so reuse would return the
        # stale trace — call the unjitted wrapped fn directly
        got, got_lens = fe.log_mel_spectrogram.__wrapped__(
            jnp.asarray(waves), jnp.asarray(lens), cfg)
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
