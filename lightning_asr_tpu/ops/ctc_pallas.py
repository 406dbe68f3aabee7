"""CTC loss as a Pallas TPU kernel — fused alpha-beta forward/backward.

The scan-based reference implementation (``ops.ctc``) leaves XLA to schedule
836 tiny loop iterations and to save every alpha for autodiff.  This kernel
computes the same log-space recursions with the state matrix resident in
VMEM and emissions streamed from HBM in time chunks (sequential TPU grid =
software pipeline; scratch persists across grid steps):

  * forward kernel: alpha recursion over (B, S) tiles, per-sample length
    freezing, log-likelihood extraction at each sample's last frame;
    alpha_all streamed back to HBM for the backward pass;
  * backward kernel: beta recursion in reverse time order (reversed grid
    index map), gradient w.r.t. emissions  -g_b * exp(alpha + beta - ll)
    written chunk by chunk.

The label-axis gather/scatter (emissions from log_probs, gradients back to
classes) stays OUTSIDE the kernel as one-hot matmuls on the MXU — gathers
are scalar-path poison on TPU (see ops.ctc).

Semantics identical to ``ops.ctc.ctc_loss`` (torch.nn.CTCLoss parity,
blank = last index): same extended-state construction, same masking.
Exposed via ``ctc_loss_pallas`` with a custom VJP; ``interpret=True`` is
used automatically on CPU so the same tests run on the virtual mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _shift_right(x, fill):
    """(B, S) -> x shifted by +1 along S, fill at s=0."""
    return jnp.concatenate([jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1)


def _shift_left(x, fill):
    return jnp.concatenate([x[:, 1:], jnp.full_like(x[:, :1], fill)], axis=1)


# ---------------------------------------------------------------------------
# forward: alpha recursion
# ---------------------------------------------------------------------------

def _alpha_kernel(emit_ref, skip_ref, lens_ref, final_ref,
                  alpha_out_ref, ll_ref, alpha_scr, ll_scr):
    """Grid step i processes time steps [i*CT, (i+1)*CT).

    emit_ref:  (CT, B, S) emission log-probs chunk
    skip_ref:  (B, S) float 0/1 skip-transition allowance
    lens_ref:  (B, 1) int32 input lengths (SMEM-ish, kept in VMEM 2D)
    final_ref: (B, S) float 0/1 mask of the two final states
    alpha_out_ref: (CT, B, S) alpha chunk out
    ll_ref: (B, 1) final log-likelihood out (written every step; last wins)
    alpha_scr: (B, S) carried alpha; ll_scr: (B, 1) carried ll
    """
    i = pl.program_id(0)
    CT = emit_ref.shape[0]
    B, S = alpha_scr.shape

    skip = skip_ref[:]
    lens = lens_ref[:]                       # (B, 1) int32
    final = final_ref[:]

    @pl.when(i == 0)
    def _():
        # alpha_0: emit[0] at states 0 and 1 (state 1 disabled for empty
        # targets via final/skip masks built outside: emit itself carries
        # -inf at invalid states), -inf elsewhere.
        e0 = emit_ref[0]
        s_idx = lax.broadcasted_iota(jnp.int32, (B, S), 1)
        init = jnp.where(s_idx <= 1, e0, NEG_INF)
        alpha_scr[:] = init
        ll_scr[:] = jnp.full((B, 1), NEG_INF)

    def body(k, _):
        t = i * CT + k
        alpha = alpha_scr[:]

        @pl.when(jnp.logical_or(i > 0, k > 0))
        def _():
            e = emit_ref[k]
            a_m1 = _shift_right(alpha, NEG_INF)
            a_m2 = _shift_right(a_m1, NEG_INF)
            a_m2 = jnp.where(skip > 0, a_m2, NEG_INF)
            new_alpha = _lse3(alpha, a_m1, a_m2) + e
            valid = (t < lens).astype(jnp.float32)          # (B, 1)
            alpha_scr[:] = jnp.where(valid > 0, new_alpha, alpha)

        a = alpha_scr[:]
        alpha_out_ref[k] = a
        # extract ll at each sample's final frame
        at_end = (t == lens - 1)                             # (B, 1)
        masked = jnp.where(final > 0, a, NEG_INF)
        m = jnp.max(masked, axis=1, keepdims=True)
        ll_t = m + jnp.log(jnp.sum(jnp.exp(masked - m), axis=1, keepdims=True))
        ll_scr[:] = jnp.where(at_end, ll_t, ll_scr[:])
        return 0

    lax.fori_loop(0, CT, body, 0)
    ll_ref[:] = ll_scr[:]


# ---------------------------------------------------------------------------
# backward: beta recursion + gradient
# ---------------------------------------------------------------------------

def _beta_kernel(emit_ref, skip_ref, lens_ref, final_ref, alpha_ref,
                 ll_ref, gbar_ref, grad_ref, beta_scr):
    """Reverse grid: step i covers times [T - (i+1)*CT, T - i*CT) descending.

    beta here EXCLUDES the emission at its own step, so
    grad_emit[t, s] = -gbar_b * exp(alpha_t(s) + beta_t(s) - ll_b).
    """
    i = pl.program_id(0)
    CT = emit_ref.shape[0]
    n = pl.num_programs(0)
    B, S = beta_scr.shape

    skip = skip_ref[:]
    lens = lens_ref[:]
    final = final_ref[:]
    ll = ll_ref[:]
    gbar = gbar_ref[:]

    @pl.when(i == 0)
    def _():
        beta_scr[:] = jnp.full((B, S), NEG_INF)

    # allowance for the s -> s+2 transition: skip flag of the TARGET state
    skip_t = skip

    def body(kk, carry):
        k = CT - 1 - kk
        t = (n - 1 - i) * CT + k
        beta = beta_scr[:]

        # at t == len-1: beta initializes to 0 on final states
        at_init = (t == lens - 1)
        init_beta = jnp.where(final > 0, 0.0, NEG_INF)

        # recursion uses u_{t+1}(s) = beta_{t+1}(s) + emit_{t+1}(s);
        # emit_{t+1} belongs to the NEXT chunk for k == CT-1 — handled by
        # carrying u in the scratch: we store u_t = beta_t + emit_t instead.
        # beta_scr holds u_{t+1} entering this step (u at the previous
        # processed, i.e. later, time).
        u_next = beta
        u1 = _shift_left(u_next, NEG_INF)
        u2 = _shift_left(u1, NEG_INF)
        u2 = jnp.where(_shift_left(_shift_left(skip_t, 0.0), 0.0) > 0, u2, NEG_INF)
        beta_t = _lse3(u_next, u1, u2)
        beta_t = jnp.where(at_init, init_beta, beta_t)
        # freeze (keep -inf) beyond the valid range
        beta_t = jnp.where(t < lens, beta_t, NEG_INF)

        e = emit_ref[k]
        a = alpha_ref[k]
        g = -gbar * jnp.exp(a + beta_t - ll)
        grad_ref[k] = jnp.where(t < lens, g, 0.0)

        u_t = beta_t + e
        beta_scr[:] = jnp.where(t < lens, u_t, beta)
        return carry

    lax.fori_loop(0, CT, body, 0)


# ---------------------------------------------------------------------------
# host-side wrapper with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _ctc_from_emit(emit, skip, lens2d, final, valid_b):
    ll, _ = _ctc_forward(emit, skip, lens2d, final)
    return jnp.where(valid_b, -ll[:, 0], 0.0)


_CT = 32  # time steps per grid block; T is padded to a multiple of this
_MAX_B_SPAD = 16384  # B * S_pad ceiling per kernel call (see ctc_loss_pallas)


def _pick_ct(T: int) -> int:
    assert T % _CT == 0, f"T={T} must be padded to a multiple of {_CT}"
    return _CT


def _ctc_forward(emit, skip, lens2d, final):
    Tn, B, S = emit.shape
    CT = _pick_ct(Tn)
    grid = Tn // CT
    alpha_all, ll = pl.pallas_call(
        _alpha_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CT, B, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CT, B, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tn, B, S), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, S), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(emit, skip, lens2d, final)
    return ll, alpha_all


def _ctc_fwd(emit, skip, lens2d, final, valid_b):
    ll, alpha_all = _ctc_forward(emit, skip, lens2d, final)
    loss = jnp.where(valid_b, -ll[:, 0], 0.0)
    return loss, (emit, skip, lens2d, final, valid_b, alpha_all, ll)


def _ctc_bwd(res, g):
    emit, skip, lens2d, final, valid_b, alpha_all, ll = res
    Tn, B, S = emit.shape
    CT = _pick_ct(Tn)
    grid = Tn // CT
    # upstream d loss_b; loss = -ll -> pass gbar = g (sign handled in kernel)
    gbar = jnp.where(valid_b, g, 0.0)[:, None].astype(jnp.float32)

    rev = lambda i: (grid - 1 - i, 0, 0)
    grad_emit = pl.pallas_call(
        _beta_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CT, B, S), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, B, S), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CT, B, S), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tn, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=_interpret(),
    )(emit, skip, lens2d, final, alpha_all, ll, gbar)
    return grad_emit, None, None, None, None


_ctc_from_emit.defvjp(_ctc_fwd, _ctc_bwd)


@functools.partial(jax.jit, static_argnames=("blank_id",))
def ctc_loss_pallas(
    log_probs: jnp.ndarray,
    input_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int,
) -> jnp.ndarray:
    """Drop-in replacement for ``ops.ctc.ctc_loss`` backed by the Pallas
    alpha-beta kernel. Returns (B,) per-sample -log p(y|x)."""
    log_probs = log_probs.astype(jnp.float32)
    B, T, C = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1
    S_pad = _round_up(S, 128)
    if B * S_pad > _MAX_B_SPAD:
        # Batch-tile oversized lattices: alpha-beta grids past this size
        # blow the 16 MB scoped-VMEM stack in the Mosaic AOT compile on
        # v5e (observed at T_pad=864: 42x512 tiles fail, 32x512 compile
        # and run).  Per-sample losses are independent, so slicing the
        # batch is exact; grads flow through the concat.
        size = max(B // -(-B * S_pad // _MAX_B_SPAD), 1)
        if size * S_pad > _MAX_B_SPAD:
            # B == 1 and a single row still blows the VMEM cap (target
            # length >= ~8k labels): tiling cannot shrink it further and
            # recursing would never terminate — fail loudly instead.
            raise ValueError(
                f"CTC label sequence too long for the Pallas kernel: "
                f"S_pad={S_pad} exceeds the per-row VMEM budget "
                f"({_MAX_B_SPAD}); use ops.ctc.ctc_loss (scan) for "
                f"targets this long")
        return jnp.concatenate([
            ctc_loss_pallas(log_probs[i:i + size], input_lengths[i:i + size],
                            targets[i:i + size], target_lengths[i:i + size],
                            blank_id)
            for i in range(0, B, size)], axis=0)

    ext = jnp.full((B, S_pad), blank_id, jnp.int32)
    ext = ext.at[:, 1:S:2].set(targets.astype(jnp.int32))
    s_idx = lax.broadcasted_iota(jnp.int32, (B, S_pad), 1)
    n_states = 2 * target_lengths[:, None] + 1
    state_valid = s_idx < n_states

    is_blank = ext == blank_id
    ext_m2 = jnp.concatenate([jnp.full((B, 2), blank_id, jnp.int32), ext[:, :-2]], axis=1)
    allow_skip = ((~is_blank) & (ext != ext_m2) & state_valid).astype(jnp.float32)

    # emissions via one-hot matmul; invalid states get -inf.  Precision HIGH,
    # not HIGHEST: the 0/1 operand is exact in bf16, so 3-pass reconstructs
    # the selected log-prob to <= 2^-16 relative (see ops/ctc.py) at half the
    # MXU passes — ~3.5 ms/step at the C=4334 AISHELL head.  Matches
    # ops.ctc.ctc_loss's emission precision so scan-vs-Pallas parity is
    # unaffected.
    onehot = (ext[:, :, None] == jnp.arange(C)[None, None, :]).astype(jnp.float32)
    emit = jnp.einsum("btc,bsc->tbs", log_probs, onehot,
                      precision=lax.Precision.HIGH)         # (T, B, S_pad)
    emit = jnp.where(state_valid[None, :, :], emit, NEG_INF)
    # pad T to a chunk multiple; padded steps sit beyond every sample's
    # input length, so they are frozen in the forward and zero-grad in the
    # backward by the t < lens masks.
    T_pad = _round_up(T, _CT)
    if T_pad != T:
        emit = jnp.concatenate(
            [emit, jnp.full((T_pad - T, B, S_pad), NEG_INF, jnp.float32)], axis=0)

    final = ((s_idx == n_states - 1) | ((s_idx == n_states - 2) & (target_lengths[:, None] > 0)))
    final = final.astype(jnp.float32)
    lens2d = input_lengths.astype(jnp.int32)[:, None]
    valid_b = input_lengths > 0

    losses = _ctc_from_emit(emit, allow_skip, lens2d, final, valid_b)
    return losses
