"""Depthwise conv1d with a hybrid VJP: XLA forward/dgrad + a single-pass
VMEM-resident Pallas weight-gradient kernel.

Why only the wgrad: ROOFLINE.json attributes ~10.7 ms/step of the B=32 x
16.7 s train step to the depthwise class against a 6.4 ms VPU bound, and
trace mining shows the gap concentrated in multiply+reduce fusions — the
depthwise *weight gradient* pattern — while XLA's forward/dgrad conv
emitter is already near its bound (ops/sepconv_pallas.py's fully-fused
kernel measured SLOWER than XLA's fwd pair; don't re-fight that).  XLA
lowers the wgrad reduction ``dw[j,c] = sum_{b,t} x[b,t+j-P,c] * dy[b,t,c]``
as k independent multiply+reduce fusions that re-read x and dy from HBM
per tap; this kernel reads each batch row ONCE into VMEM and produces all
k taps from shifted in-register views (the static-unrolled-slice idiom
that measured fastest in the sepconv experiments), accumulating the
(k, C) result in a VMEM output tile across the sequential batch grid.

Semantics match the depthwise half of the reference's SeprationConv
(``/root/reference/models/QuartNetContext.py:8-29``: ``nn.Conv1d(c, c, k,
stride=1, padding=k//2, groups=c, bias=False)``) for odd k, stride 1,
dilation 1 — every block conv in the zoo; the stride-2 stem stays on XLA.

Gradient math (verified against jax.grad of the XLA conv in
tests/test_depthwise_pallas.py):

  y[t,c]  = sum_j x[t+j-P, c] * w[j, c]          (zero-padded x, P = k//2)
  dx      = depthwise_conv(dy, flip_j(w))         -> XLA conv emitter
  dw[j,c] = sum_{b,t} x[b, t+j-P, c] * dy[b,t,c]  -> Pallas kernel below

Compute dtype: products in the input dtype (bf16 under the training
policy), accumulation in fp32 — the same contract as XLA's conv emitter.

STATUS — MEASURED AND SHELVED (DW_AB.json, real v5e chip, full train step
at B32 x 16.7 s): two reduction strategies both LOSE to XLA's emitter —
per-tap cross-sublane tree reductions 45.2 ms/step, routing each tap's
(bT,) reduce through the MXU as a (1,bT)@(bT,C) ones-matmul 39.3 ms/step,
vs 28.9 ms with XLA's wgrad.  The per-tap reduce cost dominates whatever
HBM re-reads the fusion saves; XLA is apparently NOT re-reading from HBM
per tap (its multiply+reduce fusions tile through VMEM already).  Kept as
correct opt-in infrastructure (LASR_DW_WGRAD_PALLAS=1, parity-gated in
scripts/pallas_parity.py); off by default.  Consistent with the sepconv
finding: the depthwise class sits at ~60% of its analytic VPU bound and
two independent Pallas attacks failed to beat the emitter — treat that
bound as optimistic (it ignores the per-tap reduce latency floor).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


_ENABLED = os.environ.get("LASR_DW_WGRAD_PALLAS", "0") == "1"


def depthwise_wgrad_pallas_enabled() -> bool:
    """Global toggle for routing eligible depthwise convs (stride 1,
    dilation 1, odd k) through the hybrid VJP.  Default decided by the
    on-chip A/B (scripts/bench_depthwise.py --ab); override with
    ``set_depthwise_wgrad_pallas`` or LASR_DW_WGRAD_PALLAS=0/1."""
    return _ENABLED


def set_depthwise_wgrad_pallas(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


# ---------------------------------------------------------------------------
# the wgrad kernel
# ---------------------------------------------------------------------------

_CHUNK_T = 256  # time-chunk per grid cell: bounds Mosaic temp live-ranges
                # (full-T tap temporaries blew the 16 MB scoped-VMEM stack
                # at C=512, k=87: 20.32M requested)


def _wgrad_kernel(xp_ref, dy_ref, dwd_ref, *, k: int, kpad: int, bT: int):
    """One (batch row, time chunk): all k taps from shifted views of one
    VMEM window of x.

    Mosaic constraints (CLAUDE.md): the dynamic sublane offset of the
    window load is provably 8-aligned (i * bT with bT % 8 == 0, asserted
    via ``pl.multiple_of``); the per-tap shifts within the loaded window
    are STATIC unrolled slices — the formulation that beat both pl.ds and
    pltpu.roll in the sepconv experiments."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    t0 = pl.multiple_of(i * bT, 8)
    xw = xp_ref[0, pl.ds(t0, bT + kpad), :]
    dyw = dy_ref[0]                                    # (bT, C) input dtype
    # Per-tap time reduction on the MXU (ones-row matmul): a VPU
    # cross-sublane tree reduce per tap measured 4x slower than XLA's
    # emitter (45 vs 28 ms/step); the MXU contracts the bT sublanes in one
    # pass and is otherwise idle in this kernel.
    ones = jnp.ones((1, bT), dyw.dtype)
    rows = []
    for j in range(k):                                 # static taps
        rows.append(lax.dot_general(
            ones, xw[j : j + bT] * dyw,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    if kpad > k:
        rows.append(jnp.zeros((kpad - k, xw.shape[-1]), jnp.float32))
    acc = jnp.concatenate(rows, axis=0)                # (kpad, C) fp32

    @pl.when((b == 0) & (i == 0))
    def _init():
        dwd_ref[...] = jnp.zeros_like(dwd_ref)

    dwd_ref[...] += acc


def _wgrad_pallas(x: jnp.ndarray, dy: jnp.ndarray, k: int,
                  interpret: bool | None) -> jnp.ndarray:
    """dw[j,c] = sum_{b,t} x_pad[b, t+j, c] * dy[b, t, c] for the stride-1
    same-padded depthwise conv.  x, dy: (B, T, C); returns (k, C) fp32."""
    B, T, C = x.shape
    P = k // 2
    kpad = _round8(k)
    if interpret is None:
        interpret = _interpret_default()
    bT = min(_CHUNK_T, _round8(T))
    T_pad = -(-T // bT) * bT                           # chunk multiple
    # front-pad by P so tap j of chunk t0 reads x[t0 + j - P ...]; back-pad
    # so the last window load (t0 + bT + kpad) stays in bounds.  Padded dy
    # rows are zero, so over-read x rows contribute nothing.
    xp = jnp.pad(x, ((0, 0), (P, T_pad + kpad - T - P), (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (0, T_pad - T), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, k=k, kpad=kpad, bT=bT),
        grid=(B, T_pad // bT),
        in_specs=[
            pl.BlockSpec((1, T_pad + kpad, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, bT, C), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((kpad, C), lambda b, i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((kpad, C), jnp.float32),
        interpret=interpret,
    )(xp, dyp)
    return out[:k]


# ---------------------------------------------------------------------------
# hybrid custom-VJP depthwise conv
# ---------------------------------------------------------------------------

def _dw_conv(x: jnp.ndarray, wd: jnp.ndarray) -> jnp.ndarray:
    """XLA stride-1 same-pad depthwise conv.  x: (B,T,C); wd: (k,C)."""
    k = wd.shape[0]
    return lax.conv_general_dilated(
        x, wd[:, None, :], window_strides=(1,), padding=((k // 2, k // 2),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv1d(x: jnp.ndarray, wd: jnp.ndarray,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Stride-1 same-pad depthwise conv (odd k) whose backward routes the
    weight gradient through the Pallas kernel.  Forward and dgrad stay on
    XLA's conv emitter (already at its roofline bound)."""
    return _dw_conv(x, wd)


def _fwd(x, wd, interpret):
    return _dw_conv(x, wd), (x, wd)


def _bwd(interpret, res, dy):
    x, wd = res
    # dx[t] = sum_j dy[t + P - j] w[j] = depthwise_conv(dy, flip(w))
    dx = _dw_conv(dy, wd[::-1])
    dwd = _wgrad_pallas(x, dy, wd.shape[0], interpret).astype(wd.dtype)
    return dx.astype(x.dtype), dwd


depthwise_conv1d.defvjp(_fwd, _bwd)
