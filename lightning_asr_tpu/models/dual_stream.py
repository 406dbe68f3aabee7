"""Dual-stream SSL model: wav2vec2 features + mel, concatenated.

The reference variant (``/root/reference/train_ssl_double.py:30-49,315-316``)
maps wav2vec2 features 512->64 with a Linear, truncates both streams to the
common minimum length, concatenates along the feature axis (128 channels)
and feeds QuartNet12-context with ``in_c=128``.  Its mel stream uses win
0.025 s / hop 0.02 s / pad 0 (``ssl_data_module_double.py:57,93-97``) so
both streams tick at the wav2vec2 20 ms rate.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.frontend import MelFrontendConfig
from .layers import _lengths_from_percents, torch_uniform_init
from .quartznet import _ENCODERS

# Mel config for the dual path: 20 ms hop aligned with wav2vec2 frames.
DUAL_MEL_CONFIG = MelFrontendConfig(win_length=400, hop_length=320, pad=0)


class DualStreamAsrModel(nn.Module):
    """(wav2vec feats (B,T1,512), mel (B,T2,64)) -> CTC log-probs."""

    num_classes: int
    encoder_name: str = "quartznet12_context"
    drop_rate: float = 0.0
    mask: bool = False
    feature_in: int = 512
    in_c: int = 128  # 64 (mapped wav2vec) + 64 (mel)

    @nn.compact
    def __call__(
        self,
        w2v_feats: jnp.ndarray,
        mel_feats: jnp.ndarray,
        percents: jnp.ndarray,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w2v = nn.Dense(64, kernel_init=torch_uniform_init(self.feature_in),
                       bias_init=torch_uniform_init(self.feature_in),
                       name="feature_mapping")(w2v_feats)
        T = min(w2v.shape[1], mel_feats.shape[1])
        x = jnp.concatenate([w2v[:, :T], mel_feats[:, :T]], axis=-1)  # (B, T, 128)

        enc_cls, enc_kwargs = _ENCODERS[self.encoder_name]
        x = enc_cls(in_c=self.in_c, drop_rate=self.drop_rate, mask=self.mask,
                    name="encoder", **enc_kwargs)(x, percents, train)
        x = nn.Conv(self.num_classes, (1,), use_bias=True,
                    kernel_init=torch_uniform_init(1024),
                    bias_init=torch_uniform_init(1024), name="decoder")(x)
        log_probs = nn.log_softmax(x, axis=-1)
        out_lengths = _lengths_from_percents(log_probs.shape[1], percents)
        return log_probs, out_lengths
