"""Building blocks of the QuartzNet zoo — flax linen, NWC layout.

Semantics mirrored from the reference (``/root/reference/models/
QuartNetContext.py``), re-designed for TPU:

  * all tensors are (B, T, C) — XLA's native 1-D conv layout (NWC), so
    depthwise+pointwise convs compile straight onto the MXU without
    transposes;
  * ``SepConv`` = depthwise conv -> pointwise conv -> [length mask] ->
    BatchNorm -> ReLU (skipped when ``last``) -> dropout.  The reference's
    ``channel_shuffle(groups=1)`` is a no-op reshape and is omitted.  The
    mask runs BEFORE BatchNorm, so batch statistics see zeroed pad frames —
    intentional reference behavior that affects training dynamics, preserved
    (``QuartNetContext.py:30-41``);
  * masking recovers frame counts with the reference's ``int(T * percent)``
    formula at every application point (``QuartNetContext.py:249``);
  * ``MaskedBatchNorm`` reproduces torch BatchNorm1d: eps 1e-3, momentum
    0.1, biased variance for normalization but unbiased for the running
    estimate;
  * initializers match torch defaults (kaiming_uniform(a=sqrt(5)) ==
    U(+-1/sqrt(fan_in)) for convs, U(+-1/sqrt(hidden)) for LSTM) so training
    dynamics start from the same distribution.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.depthwise_pallas import (depthwise_conv1d,
                                    depthwise_wgrad_pallas_enabled)
from ..ops.lstm import LSTMWeights, lstm
from ..ops.sepconv_pallas import sepconv, sepconv_pallas_enabled
from ..parallel.tp import shard_trunk_activations


def torch_uniform_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's conv/linear default
    (kaiming_uniform with a=sqrt(5) reduces to exactly this bound)."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _lengths_from_percents(T: int, percents: jnp.ndarray) -> jnp.ndarray:
    """The reference's ``(T * percents).int()`` recovery."""
    return (jnp.float32(T) * percents.astype(jnp.float32)).astype(jnp.int32)


def mask_by_percents(x: jnp.ndarray, percents: jnp.ndarray) -> jnp.ndarray:
    """Zero frames >= int(T * percent). x: (B, T, C)."""
    lengths = _lengths_from_percents(x.shape[1], percents)
    t = lax.broadcasted_iota(jnp.int32, (1, x.shape[1], 1), 1)
    return x * (t < lengths[:, None, None]).astype(x.dtype)


class MaskedBatchNorm(nn.Module):
    """torch.nn.BatchNorm1d semantics on (B, T, C): normalize per channel
    over (B, T) with biased variance; running stats updated with the
    unbiased variance and momentum 0.1. eps defaults to the reference 1e-3."""

    features: int
    eps: float = 1e-3
    momentum: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32))

        if train:
            xf = x.astype(jnp.float32)
            n = x.shape[0] * x.shape[1]
            mean = jnp.mean(xf, axis=(0, 1))
            var = jnp.mean((xf - mean) ** 2, axis=(0, 1))  # biased, for normalization
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = lax.rsqrt(var + self.eps) * scale
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + bias.astype(x.dtype)
        return y


class _ConvKernel(nn.Module):
    """Bare conv weight holder — creates ``params[<name>]['kernel']`` with
    exactly nn.Conv's naming/shape, so the fused-sepconv path and the XLA
    path share checkpoints interchangeably."""

    shape: tuple
    fan_in: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_uniform_init(self.fan_in), self.shape)


class SepConv(nn.Module):
    """Time-channel separable conv block (``QuartNetContext.py:8-54``)."""

    in_ch: int
    out_ch: int
    k: int = 33
    last: bool = False
    mask: bool = True
    dilation: int = 1
    stride: int = 1
    drop_rate: float = 0.1
    # compute dtype for the convs (params stay fp32; BN math stays fp32).
    # bf16 halves HBM traffic for the bandwidth-bound depthwise convs.
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, percents: jnp.ndarray, train: bool) -> jnp.ndarray:
        # tensor parallelism: pin channel sharding on the grouped conv's
        # input — REQUIRED for a correct weight gradient on >=2-D meshes,
        # not just a perf hint (see parallel/tp.py GSPMD sharp edge);
        # identity when no tp mesh is registered
        x = shard_trunk_activations(x)
        if self.dilation > 1:
            pad = (self.dilation * self.k) // 2 - 1
        else:
            pad = self.k // 2
        if (sepconv_pallas_enabled() and self.stride == 1
                and self.dilation == 1 and self.k % 2 == 1):
            # fused depthwise+pointwise Pallas kernel (same params layout)
            wd = _ConvKernel((self.k, 1, self.in_ch), self.k,
                             name="depthwise_conv")()
            wp = _ConvKernel((1, self.in_ch, self.out_ch), self.in_ch,
                             name="pointwise_conv")()
            xin = x.astype(self.dtype) if self.dtype is not None else x
            x = sepconv(xin, wd[:, 0, :], wp[0], None)
        elif (depthwise_wgrad_pallas_enabled() and self.stride == 1
                and self.dilation == 1 and self.k % 2 == 1):
            # XLA fwd/dgrad + Pallas wgrad hybrid (same params layout as
            # nn.Conv, so checkpoints are interchangeable)
            wd = _ConvKernel((self.k, 1, self.in_ch), self.k,
                             name="depthwise_conv")()
            xin = x.astype(self.dtype) if self.dtype is not None else x
            x = depthwise_conv1d(xin, wd[:, 0, :].astype(xin.dtype))
            x = nn.Conv(
                features=self.out_ch,
                kernel_size=(1,),
                use_bias=False,
                kernel_init=torch_uniform_init(self.in_ch),
                dtype=self.dtype,
                name="pointwise_conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.in_ch,
                kernel_size=(self.k,),
                strides=(self.stride,),
                padding=((pad, pad),),
                feature_group_count=self.in_ch,
                kernel_dilation=(self.dilation,),
                use_bias=False,
                kernel_init=torch_uniform_init(self.k),  # depthwise fan_in = k
                dtype=self.dtype,
                name="depthwise_conv",
            )(x)
            x = nn.Conv(
                features=self.out_ch,
                kernel_size=(1,),
                use_bias=False,
                kernel_init=torch_uniform_init(self.in_ch),
                dtype=self.dtype,
                name="pointwise_conv",
            )(x)
        if self.mask:
            x = mask_by_percents(x, percents)
        x = MaskedBatchNorm(self.out_ch, name="bn")(x, train)
        if not self.last:
            x = nn.relu(x)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return x


class SELayer(nn.Module):
    """Squeeze-excite (``QuartNetContextSE.py:8-23``): global average over
    time -> FC(C -> C/r) -> ReLU -> FC -> sigmoid -> channel rescale."""

    channels: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeezed = jnp.mean(x, axis=1)  # (B, C); adaptive avg pool over time
        hidden = self.channels // self.reduction
        y = nn.Dense(hidden, use_bias=False,
                     kernel_init=torch_uniform_init(self.channels), name="fc1")(squeezed)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False,
                     kernel_init=torch_uniform_init(hidden), name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, :]


class SepConvSE(SepConv):
    """SepConv with a squeeze-excite stage after BN
    (``QuartNetContextSE.py:46,55`` — SE applied post-BN, pre-ReLU)."""

    reduction: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, percents: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = shard_trunk_activations(x)  # see SepConv / parallel/tp.py
        pad = (self.dilation * self.k) // 2 - 1 if self.dilation > 1 else self.k // 2
        x = nn.Conv(self.in_ch, (self.k,), strides=(self.stride,), padding=((pad, pad),),
                    feature_group_count=self.in_ch, kernel_dilation=(self.dilation,),
                    use_bias=False, kernel_init=torch_uniform_init(self.k),
                    dtype=self.dtype, name="depthwise_conv")(x)
        x = nn.Conv(self.out_ch, (1,), use_bias=False, dtype=self.dtype,
                    kernel_init=torch_uniform_init(self.in_ch), name="pointwise_conv")(x)
        if self.mask:
            x = mask_by_percents(x, percents)
        x = MaskedBatchNorm(self.out_ch, name="bn")(x, train)
        x = SELayer(self.out_ch, self.reduction, name="se")(x)
        if not self.last:
            x = nn.relu(x)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return x


class QuartNetBlock(nn.Module):
    """Residual block (``QuartNetContext.py:57-83``): (repeat-1) SepConvs +
    one last SepConv, summed with a 1x1-conv+BN residual branch, then ReLU.
    The residual branch is NOT masked before its BN — reference behavior."""

    repeat: int = 3
    in_ch: int = 1
    out_ch: int = 32
    k: int = 33
    mask: bool = True
    drop_rate: float = 0.0
    use_se: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, percents: jnp.ndarray, train: bool) -> jnp.ndarray:
        conv_cls = SepConvSE if self.use_se else SepConv
        start = x
        for i in range(self.repeat - 1):
            # NOTE: the reference passes `mask` positionally into the k-th
            # positional slot here (`QuartNetContext.py:62`), which lands on
            # `last=`; we reproduce the *intended* architecture (mask kwarg).
            x = conv_cls(self.in_ch, self.in_ch, k=self.k, mask=self.mask,
                         drop_rate=self.drop_rate, dtype=self.dtype,
                         name=f"sep{i}")(x, percents, train)
        x = conv_cls(self.in_ch, self.out_ch, k=self.k, last=True, mask=self.mask,
                     drop_rate=self.drop_rate, dtype=self.dtype,
                     name="sep_last")(x, percents, train)
        res = nn.Conv(self.out_ch, (1,), use_bias=False, dtype=self.dtype,
                      kernel_init=torch_uniform_init(self.in_ch), name="reside_conv")(start)
        res = MaskedBatchNorm(self.out_ch, name="reside_bn")(res, train)
        return nn.relu(x + res)


class BatchLSTM(nn.Module):
    """Bidirectional LSTM with packed-sequence-equivalent masking
    (``QuartNetContext.py:186-199``), torch default init U(+-1/sqrt(H)).

    ``impl='pallas'`` (default) runs the fused Pallas recurrence kernel
    (ops/lstm_pallas.py — interpret mode on CPU); ``impl='scan'`` uses the
    lax.scan reference implementation. Both are numerically equivalent
    (tested)."""

    in_ch: int
    hidden: int
    bidirectional: bool = True
    impl: str = "pallas"

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        H = self.hidden
        init = torch_uniform_init(H)  # torch LSTM: bound 1/sqrt(hidden) for all

        def weights(tag: str) -> LSTMWeights:
            return LSTMWeights(
                w_ih=self.param(f"w_ih_{tag}", init, (4 * H, self.in_ch)),
                w_hh=self.param(f"w_hh_{tag}", init, (4 * H, H)),
                b_ih=self.param(f"b_ih_{tag}", init, (4 * H,)),
                b_hh=self.param(f"b_hh_{tag}", init, (4 * H,)),
            )

        fw = weights("f")
        bw = weights("b") if self.bidirectional else None
        if self.impl == "pallas":
            from ..ops.lstm_pallas import lstm_pallas

            return lstm_pallas(x, lengths, fw, bw)
        return lstm(x, lengths, fw, bw)
