"""Flax wav2vec2 feature encoder vs HF's torch implementation (locally
constructed, random weights — no downloads): outputs, both norm variants,
output-length formula, gradient flow (the retrain mode's requirement)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
from transformers import Wav2Vec2Config  # noqa: E402
from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2FeatureEncoder  # noqa: E402

from lightning_asr_tpu.ssl_codec.wav2vec_flax import (  # noqa: E402
    Wav2Vec2FeatureEncoderFlax,
    convert_hf_feature_encoder,
)


@pytest.mark.parametrize("norm,bias", [("group", False), ("layer", True)])
def test_feature_encoder_matches_hf(norm, bias):
    cfg = Wav2Vec2Config(feat_extract_norm=norm, conv_bias=bias)
    torch.manual_seed(0)
    hf = Wav2Vec2FeatureEncoder(cfg)
    hf.eval()

    rng = np.random.default_rng(0)
    B, S = 2, 16000
    waves = rng.standard_normal((B, S)).astype(np.float32) * 0.1
    with torch.no_grad():
        golden = hf(torch.from_numpy(waves)).transpose(1, 2).numpy()  # (B, T, 512)

    model = Wav2Vec2FeatureEncoderFlax(feat_extract_norm=norm, conv_bias=bias)
    params = convert_hf_feature_encoder(hf.state_dict(), norm=norm)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(waves)))

    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-4)


def test_output_lengths_match_hf_formula():
    cfg = Wav2Vec2Config()
    import torch as _t

    for n in [16000, 12345, 3200]:
        hf_len = int(_t.tensor(n))
        for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
            hf_len = (hf_len - k) // s + 1
        ours = int(Wav2Vec2FeatureEncoderFlax.output_lengths(np.asarray([n]))[0])
        assert ours == hf_len


def test_gradients_flow():
    model = Wav2Vec2FeatureEncoderFlax()
    rng = jax.random.PRNGKey(0)
    waves = jax.random.normal(rng, (1, 4000)) * 0.1
    params = model.init(rng, waves)["params"]

    def loss(p, w):
        return jnp.sum(model.apply({"params": p}, w) ** 2)

    g = jax.grad(loss)(params, waves)
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_feature_encoder_matches_real_xlsr():
    """Parity vs REAL pretrained weights — opt-in, network/cache required.

    ``LASR_WAV2VEC_REAL`` names the HF model id or a local checkpoint dir
    (e.g. ``facebook/wav2vec2-large-xlsr-53``, the reference's extractor
    default, ``/root/reference/ssl_codec/convert_manifestwav2pkl.py:24-34``).
    Skipped in the build image (no network); docs/REAL_DATA_RUNBOOK.md §3."""
    import os

    target = os.environ.get("LASR_WAV2VEC_REAL")
    if not target:
        pytest.skip("set LASR_WAV2VEC_REAL=<model-id-or-path> to run")
    from transformers import Wav2Vec2Model

    hf_full = Wav2Vec2Model.from_pretrained(target)
    hf_full.eval()
    enc = hf_full.feature_extractor
    norm = hf_full.config.feat_extract_norm

    rng = np.random.default_rng(0)
    waves = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    with torch.no_grad():
        golden = enc(torch.from_numpy(waves)).transpose(1, 2).numpy()

    model = Wav2Vec2FeatureEncoderFlax(
        feat_extract_norm=norm, conv_bias=hf_full.config.conv_bias)
    params = convert_hf_feature_encoder(enc.state_dict(), norm=norm)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(waves)))
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-4)
