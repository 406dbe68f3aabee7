"""wav2vec2 feature encoder in flax — SSL extractor INSIDE the TPU graph.

The reference's on-the-fly SSL mode can optionally retrain the wav2vec2
extractor jointly with the ASR model (``/root/reference/ssl_codec/
ssl_data_module.py:302-304``).  The torch extractor cannot live inside a JAX
graph, so this module re-implements the part the reference consumes —
``Wav2Vec2Model(...).extract_features``, i.e. the 7-layer convolutional
feature encoder producing (B, T/320, 512) — natively in flax:

  * "group" norm variant (wav2vec2-base): conv -> GroupNorm(512 groups) ->
    GELU on layer 0 only;
  * "layer" norm variant (wav2vec2-large / xlsr-53): conv(+bias) ->
    LayerNorm -> GELU on every layer;
  * strides (5,2,2,2,2,2,2), kernels (10,3,3,3,3,2,2), VALID padding —
    exactly HF's Wav2Vec2FeatureEncoder; weights convert from a HF torch
    state_dict via ``convert_hf_feature_encoder``.

Convs run on the MXU (they are dense, not grouped); output frame rate is the
usual 20 ms.  Gradients flow, enabling the retrain mode end to end on TPU.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Wav2Vec2FeatureEncoderFlax(nn.Module):
    conv_dim: Sequence[int] = (512,) * 7
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    feat_extract_norm: str = "group"   # "group" (base) | "layer" (large/xlsr)
    conv_bias: bool = False            # True for large/xlsr

    @nn.compact
    def __call__(self, waves: jnp.ndarray) -> jnp.ndarray:
        """(B, S) float32 -> (B, T', conv_dim[-1]) extract_features."""
        x = waves[:, :, None]  # (B, S, 1) NWC
        for i, (dim, stride, kernel) in enumerate(
            zip(self.conv_dim, self.conv_stride, self.conv_kernel)
        ):
            x = nn.Conv(dim, (kernel,), strides=(stride,), padding="VALID",
                        use_bias=self.conv_bias, name=f"conv{i}")(x)
            if self.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=1e-5, name=f"ln{i}")(x)
            elif self.feat_extract_norm == "group" and i == 0:
                # HF: GroupNorm(num_groups=dim, channels=dim) == per-channel
                # instance norm over time
                x = nn.GroupNorm(num_groups=dim, epsilon=1e-5, name="gn0")(x)
            x = jax.nn.gelu(x, approximate=False)
        return x

    @staticmethod
    def output_lengths(input_lengths, conv_stride=(5, 2, 2, 2, 2, 2, 2),
                       conv_kernel=(10, 3, 3, 3, 3, 2, 2)):
        """Valid output frames for given sample counts (HF formula)."""
        lens = input_lengths
        for k, s in zip(conv_kernel, conv_stride):
            lens = (lens - k) // s + 1
        return lens


def convert_hf_feature_encoder(state_dict, norm: str = "group", prefix: str = "") -> dict:
    """HF Wav2Vec2FeatureEncoder state_dict -> flax params for
    Wav2Vec2FeatureEncoderFlax.  ``norm`` is the model's feat_extract_norm;
    ``prefix`` strips e.g. 'wav2vec2.feature_extractor.'."""

    def asnp(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    params: dict = {}
    for key, value in state_dict.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        parts = key.split(".")
        if parts[0] != "conv_layers":
            continue
        i = int(parts[1])
        mod, leaf = parts[2], parts[3]
        w = asnp(value)
        if mod == "conv":
            if leaf == "weight":  # (out, in, k) -> (k, in, out)
                params.setdefault(f"conv{i}", {})["kernel"] = np.transpose(w, (2, 1, 0))
            else:
                params.setdefault(f"conv{i}", {})["bias"] = w
        elif mod == "layer_norm":
            name = "gn0" if norm == "group" else f"ln{i}"
            target = params.setdefault(name, {})
            target["scale" if leaf == "weight" else "bias"] = w
    return params
