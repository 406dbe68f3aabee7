"""SSL retrain mode — wav2vec2 extractor trained jointly, fully on TPU.

The reference's ``ssl.retrain`` option backprops through the wav2vec2
extractor inside the training loop (``ssl_data_module.py:302-304`` computes
grad-carrying features in the collate).  Here the flax feature encoder
(``wav2vec_flax.py``) lives INSIDE the model, so the whole path — raw
waveform -> conv feature encoder -> features_cutout -> feature_mapping
512->64 -> QuartNet12-context -> CTC — is one jitted TPU graph with
gradients end to end.

Initialize the encoder from a HF checkpoint state_dict via
``convert_hf_feature_encoder`` + ``AsrTrainState`` surgery, or train from
scratch.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.layers import _lengths_from_percents, torch_uniform_init
from ..models.quartznet import _ENCODERS
from ..ops.augment import cutout
from .wav2vec_flax import Wav2Vec2FeatureEncoderFlax


class SSLRetrainAsrModel(nn.Module):
    """Raw waves in, CTC log-probs out, wav2vec2 encoder trainable."""

    num_classes: int
    encoder_name: str = "quartznet12_context"
    drop_rate: float = 0.0
    mask: bool = False
    feat_extract_norm: str = "layer"   # xlsr-53 style
    conv_bias: bool = True
    augment_cutout: bool = True

    @nn.compact
    def __call__(
        self, waves: jnp.ndarray, wave_lens: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feats = Wav2Vec2FeatureEncoderFlax(
            feat_extract_norm=self.feat_extract_norm, conv_bias=self.conv_bias,
            name="wav2vec")(waves)                              # (B, T', 512)
        feat_lens = Wav2Vec2FeatureEncoderFlax.output_lengths(wave_lens)

        if train and self.augment_cutout:
            rng = self.make_rng("augment")
            feats = cutout(feats, rng, rect_masks=5, rect_freq=150, rect_time=100)

        x = nn.Dense(64, kernel_init=torch_uniform_init(512),
                     bias_init=torch_uniform_init(512), name="feature_mapping")(feats)
        percents = feat_lens.astype(jnp.float32) / jnp.float32(x.shape[1])

        enc_cls, enc_kwargs = _ENCODERS[self.encoder_name]
        x = enc_cls(in_c=64, drop_rate=self.drop_rate, mask=self.mask,
                    name="encoder", **enc_kwargs)(x, percents, train)
        x = x.astype(jnp.float32)
        x = nn.Conv(self.num_classes, (1,), use_bias=True,
                    kernel_init=torch_uniform_init(1024),
                    bias_init=torch_uniform_init(1024), name="decoder")(x)
        log_probs = nn.log_softmax(x, axis=-1)
        out_lengths = _lengths_from_percents(log_probs.shape[1], percents)
        return log_probs, out_lengths


def load_hf_encoder_into_params(params: dict, hf_state_dict, norm: str = "layer") -> dict:
    """Replace params['wav2vec'] with converted HF feature-encoder weights."""
    from .wav2vec_flax import convert_hf_feature_encoder

    prefix = ""
    if any(k.startswith("wav2vec2.feature_extractor.") for k in hf_state_dict):
        prefix = "wav2vec2.feature_extractor."
    elif any(k.startswith("feature_extractor.") for k in hf_state_dict):
        prefix = "feature_extractor."
    converted = convert_hf_feature_encoder(hf_state_dict, norm=norm, prefix=prefix)
    new = dict(params)
    new["wav2vec"] = converted
    return new
