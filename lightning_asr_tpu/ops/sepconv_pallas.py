"""Fused time-channel separable convolution (depthwise k-tap + pointwise
1x1) as a single Pallas kernel pair with a custom VJP.

Why: the sepconv stack is the flagship model's hot path (~14 of 25 ms/step
at B=32 x 16.7 s).  XLA emits the depthwise conv on the VPU and the
pointwise matmul on the MXU as separate fusions, with the (B, T, C)
intermediate round-tripping through HBM in both directions, and lowers the
pointwise weight-gradient to a poorly-tiled reduction.  Fusing them:

  * forward: one HBM read of x, depthwise accumulated in VMEM (k shifted
    fused multiply-adds on the VPU), pointwise straight off the VMEM
    accumulator on the MXU, one HBM write of y;
  * backward: one kernel recomputes everything VMEM-resident — dz = dy@wpT
    (MXU), dx by correlating dz with the flipped taps (VPU), wd_grad by k
    masked reductions, dw recomputed from x for wp_grad = dwT@dy (MXU) —
    so the only HBM traffic is reading x & dy and writing dx, with both
    weight grads accumulated across the batch grid in VMEM.

Semantics match ``nn.Conv(features=C, kernel_size=(k,), padding=k//2,
feature_group_count=C)`` followed by ``nn.Conv(features=Cout,
kernel_size=(1,))`` — the reference's SeprationConv
(``/root/reference/models/QuartNetContext.py:8-54``) — for odd k, stride 1,
dilation 1 (every block conv in the zoo; the stride-2 stem stays on XLA).

Compute dtype: taps/matmuls run in the input dtype (bf16 under the training
policy) with fp32 accumulators, like XLA's conv emitter.

STATUS — measured and shelved (off by default).  On-chip A/B at
(B=32, T=832, Cin=Cout=256, k=33) fwd+bwd:

  * dynamic ``pltpu.roll`` taps: 7.06 ms (a rotate moves the whole array
    per tap);
  * static unrolled taps (current form): 1.33-1.34 ms (f32 and bf16 taps
    measure the same);
  * XLA's depthwise-conv + 1x1-dot pair: 0.92 ms.

XLA's conv emitter wins; the kernel remains as correct, parity-gated
(``scripts/pallas_parity.py``) opt-in infrastructure.  Mosaic constraints
hit along the way, recorded for future kernels: dynamic sublane offsets
must be provably 8-aligned (``pl.multiple_of``); ``tpu.dynamic_rotate``
supports only 32-bit element types and 8-aligned sublane extents.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


_ENABLED = os.environ.get("LASR_SEPCONV_PALLAS", "0") == "1"


def sepconv_pallas_enabled() -> bool:
    """Global toggle for routing eligible SepConv blocks (stride 1,
    dilation 1) through the fused kernel.  Default off; enable with
    ``set_sepconv_pallas(True)`` or LASR_SEPCONV_PALLAS=1."""
    return _ENABLED


def set_sepconv_pallas(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(xp_ref, wd_ref, wp_ref, out_ref, *, k: int, T: int):
    """One batch row: depthwise (VPU) -> pointwise (MXU).

    Mosaic only allows dynamic sublane offsets that are provably 8-aligned,
    so tap j's shifted window is expressed as a dynamic rotation
    (``pltpu.roll``) followed by a static [:T] slice instead of
    ``pl.ds(j, T)``; likewise the per-tap weight row rotates to row 0.
    j ≤ 2·(k//2) < T+2·(k//2), so the rotation never wraps into [:T]."""
    # Mosaic cannot lower dynamic unaligned sublane offsets, and dynamic
    # rotations (pltpu.roll) move the whole array per tap (measured 7x
    # slower than XLA's conv).  Static unrolled taps lower to vreg-shifted
    # FMAs instead.
    x = xp_ref[0]                                     # (T+2P, Cin) in x.dtype
    wd = wd_ref[...]                                  # (kpad, Cin)
    acc = jnp.zeros((T, x.shape[-1]), jnp.float32)
    for j in range(k):                                # static taps
        # bf16 shifted slices halve the vreg-shift traffic; products are
        # accumulated in fp32
        acc = acc + (x[j : j + T] * wd[j : j + 1]).astype(jnp.float32)
    dw = acc.astype(wp_ref.dtype)
    y = jnp.dot(dw, wp_ref[...], preferred_element_type=jnp.float32)
    out_ref[0, :, :] = y.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sepconv(x: jnp.ndarray, wd: jnp.ndarray, wp: jnp.ndarray,
            interpret: bool | None = None) -> jnp.ndarray:
    """Fused separable conv.  x: (B, T, Cin); wd: (k, Cin) depthwise taps;
    wp: (Cin, Cout).  Returns (B, T, Cout) in x.dtype."""
    return _sepconv_fwd_impl(x, wd, wp, interpret)


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _sepconv_fwd_impl(x, wd, wp, interpret):
    B, T, Cin = x.shape
    k = wd.shape[0]
    Cout = wp.shape[1]
    P = k // 2
    kpad = _round8(k)
    if interpret is None:
        interpret = _interpret_default()
    # tpu.dynamic_rotate requires 8-aligned sublane extents — pad the time
    # window and the tap table; padded rows are never read by the [:T] views
    Tp2 = _round8(T + 2 * P)
    xp = jnp.pad(x, ((0, 0), (P, Tp2 - T - P), (0, 0)))
    wdp = jnp.pad(wd, ((0, kpad - k), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, T=T),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Tp2, Cin), lambda b: (b, 0, 0)),
            pl.BlockSpec((kpad, Cin), lambda b: (0, 0)),
            pl.BlockSpec((Cin, Cout), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, Cout), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, Cout), x.dtype),
        interpret=interpret,
    )(xp, wdp.astype(x.dtype), wp.astype(x.dtype))
    return out


# ---------------------------------------------------------------------------
# backward: dx, wd_grad, wp_grad in one kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(xp_ref, dy_ref, wd_ref, wp_ref,
                dx_ref, dwd_ref, dwp_ref, dzp_ref,
                *, k: int, T: int, kpad: int):
    """Static unrolled taps throughout (see ``_fwd_kernel``); weight grads
    accumulate in VMEM output tiles across the sequential batch grid."""
    b = pl.program_id(0)
    Cin = xp_ref.shape[-1]
    P = k // 2
    x = xp_ref[0].astype(jnp.float32)                 # (Tp2, Cin)
    wd = wd_ref[...].astype(jnp.float32)              # (kpad, Cin)

    # dz = dy @ wp^T  (contract Cout)  -> (T, Cin) fp32
    dz = lax.dot_general(
        dy_ref[0, :, :], wp_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # zero-padded dz for the correlation producing dx (static offsets)
    Tp2 = dzp_ref.shape[0]
    dzp_ref[0:P, :] = jnp.zeros((P, Cin), jnp.float32)
    dzp_ref[P : P + T, :] = dz
    dzp_ref[P + T : Tp2, :] = jnp.zeros((Tp2 - P - T, Cin), jnp.float32)
    dzp = dzp_ref[...]

    # dx[t] = sum_j dz_pad[t + j] * wd[k-1-j]  (flipped taps)
    dx = jnp.zeros((T, Cin), jnp.float32)
    for j in range(k):
        dx = dx + dzp[j : j + T] * wd[k - 1 - j : k - j]
    dx_ref[0, :, :] = dx.astype(dx_ref.dtype)

    # weight grads: accumulate across the sequential batch grid
    @pl.when(b == 0)
    def _init():
        dwd_ref[...] = jnp.zeros_like(dwd_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)

    # wd_grad[j] = sum_t x_pad[t + j] * dz[t]; rebuild the depthwise output
    # dw for wp_grad from the same shifted windows
    rows = []
    dw = jnp.zeros((T, Cin), jnp.float32)
    for j in range(k):
        xs = x[j : j + T]
        rows.append(jnp.sum(xs * dz, axis=0, keepdims=True))
        dw = dw + xs * wd[j : j + 1]
    rows.extend([jnp.zeros((1, Cin), jnp.float32)] * (kpad - k))
    dwd_ref[...] += jnp.concatenate(rows, axis=0)

    # wp_grad = dw^T @ dy  (contract T) -> (Cin, Cout)
    dwp_ref[...] += lax.dot_general(
        dw.astype(dy_ref.dtype), dy_ref[0, :, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _sepconv_vjp_fwd(x, wd, wp, interpret):
    return _sepconv_fwd_impl(x, wd, wp, interpret), (x, wd, wp)


def _sepconv_vjp_bwd(interpret, res, dy):
    x, wd, wp = res
    B, T, Cin = x.shape
    k = wd.shape[0]
    Cout = wp.shape[1]
    P = k // 2
    kpad = _round8(k)
    Tp2 = _round8(T + 2 * P)
    if interpret is None:
        interpret = _interpret_default()
    xp = jnp.pad(x, ((0, 0), (P, Tp2 - T - P), (0, 0)))
    wdp = jnp.pad(wd, ((0, kpad - k), (0, 0)))
    dx, dwd, dwp = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, T=T, kpad=kpad),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Tp2, Cin), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, T, Cout), lambda b: (b, 0, 0)),
            pl.BlockSpec((kpad, Cin), lambda b: (0, 0)),
            pl.BlockSpec((Cin, Cout), lambda b: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, Cin), lambda b: (b, 0, 0)),
            pl.BlockSpec((kpad, Cin), lambda b: (0, 0)),
            pl.BlockSpec((Cin, Cout), lambda b: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, Cin), x.dtype),
            jax.ShapeDtypeStruct((kpad, Cin), jnp.float32),
            jax.ShapeDtypeStruct((Cin, Cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Tp2, Cin), jnp.float32)],
        interpret=interpret,
    )(xp, dy, wdp.astype(x.dtype), wp.astype(x.dtype))
    return dx, dwd[:k].astype(wd.dtype), dwp.astype(wp.dtype)


sepconv.defvjp(_sepconv_vjp_fwd, _sepconv_vjp_bwd)


# ---------------------------------------------------------------------------
# reference composition (for tests / fallback)
# ---------------------------------------------------------------------------

def sepconv_reference(x: jnp.ndarray, wd: jnp.ndarray, wp: jnp.ndarray) -> jnp.ndarray:
    """XLA composition with identical semantics: depthwise conv (pad k//2)
    then 1x1 pointwise, both in x.dtype with fp32 accumulation."""
    B, T, Cin = x.shape
    k = wd.shape[0]
    dw = lax.conv_general_dilated(
        x.astype(x.dtype), wd[:, None, :].astype(x.dtype),
        window_strides=(1,), padding=((k // 2, k // 2),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=Cin,
        preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.dot(dw, wp.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
