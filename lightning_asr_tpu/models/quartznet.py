"""QuartzNet model zoo (flax linen, NWC) — the reference's three encoder
families plus CTC heads.

  * ``QuartNet12Context`` — the DEFAULT trained model
    (``/root/reference/models/QuartNetContext.py:125-184``, selected at
    ``train.py:14``): SepConv stem 64->256 k33 stride 2; 3 blocks k33 and 3
    blocks k39 at 256ch; a BiLSTM(256->2x40) context branch concatenated onto
    the 256ch stream (336ch); 3 blocks k51 (336->512), 3 blocks k63, one k75,
    one k87; epilog 1x1 conv 512->1024 + BN + ReLU + dropout.  ``use_se``
    turns every SepConv into the squeeze-excite variant
    (``QuartNetContextSE.py``).
  * ``QuartNet15x5`` — the legacy repeat-5 stack (``QuartNet.py:81-117``).
  * ``QuartNet105`` — 10 blocks x repeat 5 (``QuartNet.py:175-224``).
  * ``AsrModel`` — encoder + 1x1-conv decoder to (vocab+1) classes +
    log-softmax, the reference's ``MyModel2`` (``QuartNetContext.py:202-229``)
    with an ``in_c`` parameter for the SSL feature path.

All models take (B, T, C) features and `percents` (true length / padded T),
and return (B, T', num_classes) log-probs plus output lengths
``int(T' * percents)`` (the reference's CTC length formula, ``train.py:76``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (
    BatchLSTM,
    MaskedBatchNorm,
    QuartNetBlock,
    SepConv,
    SepConvSE,
    _lengths_from_percents,
    torch_uniform_init,
)


class QuartNet12Context(nn.Module):
    """QuartzNet 12x1 with BiLSTM context branch (the default encoder)."""

    in_c: int = 64
    drop_rate: float = 0.0
    mask: bool = False
    use_se: bool = False
    lstm_hidden: int = 40
    dtype: object = None  # conv compute dtype (bf16 training policy)
    # Pad the 336-channel context concat (256 + 2x40) up to a 128-lane
    # multiple (384) with mathematically inert zero channels.  A/B-measured
    # neutral on v5e (XLA handles the 336 lanes fine), so off by default;
    # kept as an option for other TPU generations.
    pad_context: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, percents: jnp.ndarray, train: bool) -> jnp.ndarray:
        conv_cls = SepConvSE if self.use_se else SepConv

        def block(in_ch, out_ch, k, name):
            return QuartNetBlock(
                repeat=1, in_ch=in_ch, out_ch=out_ch, k=k, mask=self.mask,
                drop_rate=self.drop_rate, use_se=self.use_se, dtype=self.dtype,
                name=name,
            )

        x = conv_cls(self.in_c, 256, k=33, stride=2, mask=self.mask,
                     drop_rate=self.drop_rate, dtype=self.dtype,
                     name="first_cnn")(x, percents, train)
        for i, name in enumerate(["block1", "block12", "block13"]):
            x = block(256, 256, 33, name)(x, percents, train)
        for name in ["block2", "block22", "block23"]:
            x = block(256, 256, 39, name)(x, percents, train)

        # context branch: BiLSTM over true lengths, concat on channels
        # (runs in fp32; its Pallas kernel and stats stay full precision)
        lengths = _lengths_from_percents(x.shape[1], percents)
        c = BatchLSTM(256, self.lstm_hidden, name="context_rnn")(
            x.astype(jnp.float32), lengths)
        x = jnp.concatenate([x, c.astype(x.dtype)], axis=-1)  # (B, T, 336)
        ctx_ch = 256 + 2 * self.lstm_hidden
        if self.pad_context and ctx_ch % 128 != 0:
            pad_ch = (-ctx_ch) % 128
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_ch)))
            ctx_ch += pad_ch
        # Materialize the concat: without this barrier XLA fuses the LSTM
        # outputs + reverse + concat INTO block3's depthwise-conv loops (fwd
        # and wgrad), recomputing the context tensor per kernel tap — traced
        # at +4.1 ms/step on v5e (31.3 -> 27.2 ms with the barrier).
        x = jax.lax.optimization_barrier(x)

        x = block(ctx_ch, 512, 51, "block3")(x, percents, train)
        x = block(512, 512, 51, "block32")(x, percents, train)
        x = block(512, 512, 51, "block33")(x, percents, train)
        for name in ["block4", "block42", "block43"]:
            x = block(512, 512, 63, name)(x, percents, train)
        x = block(512, 512, 75, "block5")(x, percents, train)
        x = block(512, 512, 87, "block6")(x, percents, train)

        x = nn.Conv(1024, (1,), use_bias=False, dtype=self.dtype,
                    kernel_init=torch_uniform_init(512), name="last_conv")(x)
        x = MaskedBatchNorm(1024, name="last_bn")(x, train)
        x = nn.relu(x)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return x


class QuartNet15x5(nn.Module):
    """Legacy repeat-5 QuartzNet (``QuartNet.py:81-117``): plain conv stem
    (with bias) + 5 blocks repeat=5 + k87 SepConv + 1x1 conv to 1024."""

    in_c: int = 64
    drop_rate: float = 0.0
    mask: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, percents: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Conv(256, (33,), strides=(2,), padding=((16, 16),), use_bias=True, dtype=self.dtype,
                    kernel_init=torch_uniform_init(64 * 33),
                    bias_init=torch_uniform_init(64 * 33), name="first_cnn")(x)
        x = MaskedBatchNorm(256, name="first_bn")(x, train)
        x = nn.relu(x)

        plan = [(256, 256, 33), (256, 256, 39), (256, 512, 51), (512, 512, 63), (512, 512, 75)]
        for i, (cin, cout, k) in enumerate(plan):
            x = QuartNetBlock(repeat=5, in_ch=cin, out_ch=cout, k=k, mask=self.mask,
                              drop_rate=self.drop_rate, dtype=self.dtype,
                              name=f"block{i + 1}")(x, percents, train)
        x = SepConv(512, 512, k=87, last=False, mask=self.mask, dtype=self.dtype,
                    drop_rate=self.drop_rate, name="last_cnn")(x, percents, train)
        x = nn.Conv(1024, (1,), use_bias=True, dtype=self.dtype,
                    kernel_init=torch_uniform_init(512),
                    bias_init=torch_uniform_init(512), name="last_conv")(x)
        x = MaskedBatchNorm(1024, name="last_bn")(x, train)
        x = nn.relu(x)
        return x


class QuartNet105(nn.Module):
    """QuartzNet 10x5 (``QuartNet.py:175-224``): SepConv stem stride 2 +
    10 repeat-5 blocks + k87 SepConv + 1x1 conv to 1024."""

    in_c: int = 64
    drop_rate: float = 0.0
    mask: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, percents: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = SepConv(self.in_c, 256, k=33, stride=2, mask=self.mask, dtype=self.dtype,
                    drop_rate=self.drop_rate, name="first_cnn")(x, percents, train)
        plan = [(256, 256, 33)] * 2 + [(256, 256, 39)] * 2 + [(256, 512, 51)] \
            + [(512, 512, 51)] + [(512, 512, 63)] * 2 + [(512, 512, 75)] * 2
        for i, (cin, cout, k) in enumerate(plan):
            x = QuartNetBlock(repeat=5, in_ch=cin, out_ch=cout, k=k, mask=self.mask,
                              drop_rate=self.drop_rate, dtype=self.dtype,
                              name=f"block{i + 1}")(x, percents, train)
        x = SepConv(512, 512, k=87, last=False, mask=self.mask, dtype=self.dtype,
                    drop_rate=self.drop_rate, name="last_cnn")(x, percents, train)
        x = nn.Conv(1024, (1,), use_bias=True, dtype=self.dtype,
                    kernel_init=torch_uniform_init(512),
                    bias_init=torch_uniform_init(512), name="last_conv")(x)
        x = MaskedBatchNorm(1024, name="last_bn")(x, train)
        x = nn.relu(x)
        return x


_ENCODERS = {
    "quartznet12_context": (QuartNet12Context, {}),
    "quartznet12_context_se": (QuartNet12Context, {"use_se": True}),
    "quartznet15x5": (QuartNet15x5, {}),
    "quartznet10x5": (QuartNet105, {}),
}

MODEL_REGISTRY = tuple(_ENCODERS)


class AsrModel(nn.Module):
    """Encoder + CTC head (the reference's ``MyModel2``).

    Returns (log_probs (B, T', V+1), out_lengths (B,)).
    """

    num_classes: int  # vocab + 1 (blank is last)
    encoder_name: str = "quartznet12_context"
    in_c: int = 64
    drop_rate: float = 0.0
    mask: bool = False
    # feature_mapping: project SSL features (e.g. wav2vec2's 512) down to
    # in_c before the encoder, like ``train_ssl.py:42,316``.
    feature_in: int | None = None
    # lstm_head: the legacy ``MyModel`` head (``QuartNet.py:242-261``):
    # encoder -> BiLSTM -> BatchNorm -> Dense instead of the 1x1-conv decoder.
    lstm_head: bool = False
    lstm_head_hidden: int = 128
    # conv compute dtype: jnp.bfloat16 for training throughput (params and
    # the CTC head stay fp32); None keeps full fp32 (parity mode).
    dtype: object = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, percents: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.feature_in is not None:
            x = nn.Dense(self.in_c, kernel_init=torch_uniform_init(self.feature_in),
                         bias_init=torch_uniform_init(self.feature_in),
                         name="feature_mapping")(x)
        enc_cls, enc_kwargs = _ENCODERS[self.encoder_name]
        x = enc_cls(in_c=self.in_c, drop_rate=self.drop_rate, mask=self.mask,
                    dtype=self.dtype, name="encoder", **enc_kwargs)(x, percents, train)
        x = x.astype(jnp.float32)  # CTC head in full precision
        if self.lstm_head:
            lengths = _lengths_from_percents(x.shape[1], percents)
            x = BatchLSTM(x.shape[-1], self.lstm_head_hidden, name="head_rnn")(x, lengths)
            x = MaskedBatchNorm(2 * self.lstm_head_hidden, name="head_bn")(x, train)
            x = nn.Dense(self.num_classes,
                         kernel_init=torch_uniform_init(2 * self.lstm_head_hidden),
                         bias_init=torch_uniform_init(2 * self.lstm_head_hidden),
                         name="head_fc")(x)
        else:
            x = nn.Conv(self.num_classes, (1,), use_bias=True,
                        kernel_init=torch_uniform_init(1024),
                        bias_init=torch_uniform_init(1024), name="decoder")(x)
        log_probs = nn.log_softmax(x, axis=-1)
        out_lengths = _lengths_from_percents(log_probs.shape[1], percents)
        return log_probs, out_lengths


def build_model(
    num_classes: int,
    encoder: str = "quartznet12_context",
    in_c: int = 64,
    drop_rate: float = 0.0,
    mask: bool = False,
    feature_in: int | None = None,
    **kwargs,
) -> AsrModel:
    if encoder not in _ENCODERS:
        raise ValueError(f"unknown encoder {encoder!r}; choose from {sorted(_ENCODERS)}")
    return AsrModel(
        num_classes=num_classes, encoder_name=encoder, in_c=in_c,
        drop_rate=drop_rate, mask=mask, feature_in=feature_in, **kwargs,
    )
