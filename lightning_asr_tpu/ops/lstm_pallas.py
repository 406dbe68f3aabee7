"""LSTM recurrence as a Pallas TPU kernel — fused forward + BPTT backward.

The scan LSTM (``ops.lstm``) is latency-bound: ~1700 sequential loop
iterations of tiny (B, H) work per direction, each paying loop-iteration
overhead, and the same again for the autodiff backward.  This kernel runs
the whole recurrence inside ONE Pallas program per direction:

  * the input projection x @ W_ih^T + biases stays OUTSIDE as a single big
    MXU matmul (as in ops.lstm);
  * the forward kernel carries (h, c) in VMEM scratch, streams xproj chunks
    in and three per-step tensors out: the user-visible masked h, plus the
    PRE-update states h_prev/c_prev — storing pre-update states makes the
    backward chunk-local (no halo at chunk boundaries; h_prev[0] == 0);
  * the backward kernel runs reverse-time BPTT (reversed grid index map):
    gates are recomputed from xproj and h_prev, d_xproj streams out, dW_hh
    accumulates in a VMEM output tile across grid steps;
  * dx / dW_ih / db then fall out of big MXU matmuls outside the kernel;
  * per-sample length masking matches pack_padded_sequence semantics exactly
    (masked state updates; zero outputs at pad frames), same as ops.lstm.

Hidden size is padded to the 128-lane tile (the reference's context LSTM is
H=40); padded rows/cols of W_hh are zero so the math is unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lstm import LSTMWeights


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_CT = 32  # time steps per grid block
_MAX_B = 32  # batch rows per kernel call (BPTT scoped-VMEM cap; see lstm_pallas)


def _gates(xp_row, h, whh):
    # When whh is stored bf16 (model compute policy), the recurrent matmul
    # runs as a single bf16 MXU pass instead of the multi-pass fp32
    # decomposition — the dominant per-step latency. State/h stay fp32.
    gates = xp_row + jnp.dot(h.astype(whh.dtype), whh,
                             preferred_element_type=jnp.float32)
    Hp = h.shape[1]
    i_g = jax.nn.sigmoid(gates[:, 0 * Hp:1 * Hp])
    f_g = jax.nn.sigmoid(gates[:, 1 * Hp:2 * Hp])
    g_g = jnp.tanh(gates[:, 2 * Hp:3 * Hp])
    o_g = jax.nn.sigmoid(gates[:, 3 * Hp:4 * Hp])
    return i_g, f_g, g_g, o_g


def _fwd_kernel(xproj_ref, valid_ref, whh_ref,
                h_out_ref, hprev_out_ref, cprev_out_ref,
                h_scr, c_scr):
    i = pl.program_id(0)
    CT = xproj_ref.shape[0]

    @pl.when(i == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    def body(k, _):
        h, c = h_scr[:], c_scr[:]
        hprev_out_ref[k] = h
        cprev_out_ref[k] = c
        i_g, f_g, g_g, o_g = _gates(xproj_ref[k], h, whh_ref[:])
        c_new = f_g * c + i_g * g_g
        h_new = o_g * jnp.tanh(c_new)
        v = valid_ref[k]                      # (B, 1)
        h_scr[:] = jnp.where(v > 0, h_new, h)
        c_scr[:] = jnp.where(v > 0, c_new, c)
        h_out_ref[k] = jnp.where(v > 0, h_new, 0.0)
        return 0

    lax.fori_loop(0, CT, body, 0)


def _bwd_kernel(xproj_ref, valid_ref, whh_ref, hprev_ref, cprev_ref, g_ref,
                dxproj_ref, dwhh_ref, dh_scr, dc_scr):
    i = pl.program_id(0)
    CT = xproj_ref.shape[0]

    @pl.when(i == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    def body(kk, _):
        k = CT - 1 - kk
        h_prev = hprev_ref[k]
        c_prev = cprev_ref[k]
        i_g, f_g, g_g, o_g = _gates(xproj_ref[k], h_prev, whh_ref[:])
        c_t = f_g * c_prev + i_g * g_g
        tanh_c = jnp.tanh(c_t)

        v = valid_ref[k]                      # (B, 1)
        dh = (g_ref[k] + dh_scr[:]) * v
        dc = dc_scr[:] * v + dh * o_g * (1.0 - tanh_c * tanh_c)

        do = dh * tanh_c * o_g * (1.0 - o_g)
        di = dc * g_g * i_g * (1.0 - i_g)
        df = dc * c_prev * f_g * (1.0 - f_g)
        dg = dc * i_g * (1.0 - g_g * g_g)
        dgates = jnp.concatenate([di, df, dg, do], axis=1)  # (B, 4Hp)

        dxproj_ref[k] = dgates
        mm_t = whh_ref.dtype  # bf16 when the model's compute policy is bf16
        dwhh_ref[:] += jnp.dot(h_prev.T.astype(mm_t), dgates.astype(mm_t),
                               preferred_element_type=jnp.float32)
        dh_prev = jnp.dot(dgates.astype(mm_t), whh_ref[:].T,
                          preferred_element_type=jnp.float32)
        dh_scr[:] = dh_prev + dh_scr[:] * (1.0 - v)
        dc_scr[:] = dc * f_g + dc_scr[:] * (1.0 - v)
        return 0

    lax.fori_loop(0, CT, body, 0)


# ---------------------------------------------------------------------------
# batch-stacked bidirectional kernels: both directions advance in ONE
# sequential loop as extra batch rows (rows [0:B] forward, rows [B:2B] the
# time-flipped backward), with a per-direction recurrent matmul — same total
# MXU FLOPs as two single-direction runs but HALF the sequential depth
# (T steps instead of 2T).  This is the "2x-batch layout" overlap, distinct
# from the lane-packed variant (block-diagonal weights, 4x MXU work) that
# A/B-measured slower.
# ---------------------------------------------------------------------------


def _gates_bidir(xp_row, h, whh_f, whh_b, B):
    mm = lambda hh, ww: jnp.dot(hh.astype(ww.dtype), ww,
                                preferred_element_type=jnp.float32)
    rec = jnp.concatenate([mm(h[:B], whh_f[:]), mm(h[B:], whh_b[:])], axis=0)
    gates = xp_row + rec
    Hp = h.shape[1]
    i_g = jax.nn.sigmoid(gates[:, 0 * Hp:1 * Hp])
    f_g = jax.nn.sigmoid(gates[:, 1 * Hp:2 * Hp])
    g_g = jnp.tanh(gates[:, 2 * Hp:3 * Hp])
    o_g = jax.nn.sigmoid(gates[:, 3 * Hp:4 * Hp])
    return i_g, f_g, g_g, o_g


def _fwd_kernel_bidir(xproj_ref, valid_ref, whh_f_ref, whh_b_ref,
                      h_out_ref, hprev_out_ref, cprev_out_ref,
                      h_scr, c_scr):
    i = pl.program_id(0)
    CT = xproj_ref.shape[0]
    B2 = xproj_ref.shape[1]
    B = B2 // 2

    @pl.when(i == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    def body(k, _):
        h, c = h_scr[:], c_scr[:]
        hprev_out_ref[k] = h
        cprev_out_ref[k] = c
        i_g, f_g, g_g, o_g = _gates_bidir(xproj_ref[k], h, whh_f_ref, whh_b_ref, B)
        c_new = f_g * c + i_g * g_g
        h_new = o_g * jnp.tanh(c_new)
        v = valid_ref[k]                      # (2B, 1)
        h_scr[:] = jnp.where(v > 0, h_new, h)
        c_scr[:] = jnp.where(v > 0, c_new, c)
        h_out_ref[k] = jnp.where(v > 0, h_new, 0.0)
        return 0

    lax.fori_loop(0, CT, body, 0)


def _bwd_kernel_bidir(xproj_ref, valid_ref, whh_f_ref, whh_b_ref,
                      hprev_ref, cprev_ref, g_ref,
                      dxproj_ref, dwhh_f_ref, dwhh_b_ref, dh_scr, dc_scr):
    i = pl.program_id(0)
    CT = xproj_ref.shape[0]
    B = xproj_ref.shape[1] // 2

    @pl.when(i == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwhh_f_ref[:] = jnp.zeros_like(dwhh_f_ref)
        dwhh_b_ref[:] = jnp.zeros_like(dwhh_b_ref)

    def body(kk, _):
        k = CT - 1 - kk
        h_prev = hprev_ref[k]
        c_prev = cprev_ref[k]
        i_g, f_g, g_g, o_g = _gates_bidir(xproj_ref[k], h_prev,
                                          whh_f_ref, whh_b_ref, B)
        c_t = f_g * c_prev + i_g * g_g
        tanh_c = jnp.tanh(c_t)

        v = valid_ref[k]                      # (2B, 1)
        dh = (g_ref[k] + dh_scr[:]) * v
        dc = dc_scr[:] * v + dh * o_g * (1.0 - tanh_c * tanh_c)

        do = dh * tanh_c * o_g * (1.0 - o_g)
        di = dc * g_g * i_g * (1.0 - i_g)
        df = dc * c_prev * f_g * (1.0 - f_g)
        dg = dc * i_g * (1.0 - g_g * g_g)
        dgates = jnp.concatenate([di, df, dg, do], axis=1)  # (2B, 4Hp)

        dxproj_ref[k] = dgates
        mm_t = whh_f_ref.dtype
        dwhh_f_ref[:] += jnp.dot(h_prev[:B].T.astype(mm_t),
                                 dgates[:B].astype(mm_t),
                                 preferred_element_type=jnp.float32)
        dwhh_b_ref[:] += jnp.dot(h_prev[B:].T.astype(mm_t),
                                 dgates[B:].astype(mm_t),
                                 preferred_element_type=jnp.float32)
        dh_prev = jnp.concatenate(
            [jnp.dot(dgates[:B].astype(mm_t), whh_f_ref[:].T,
                     preferred_element_type=jnp.float32),
             jnp.dot(dgates[B:].astype(mm_t), whh_b_ref[:].T,
                     preferred_element_type=jnp.float32)], axis=0)
        dh_scr[:] = dh_prev + dh_scr[:] * (1.0 - v)
        dc_scr[:] = dc * f_g + dc_scr[:] * (1.0 - v)
        return 0

    lax.fori_loop(0, CT, body, 0)


# 2B-row blocks double the streamed bytes per grid step; CT=32 put the
# backward kernel 64 KB over the 16 MB scoped-VMEM limit at the flagship
# shapes, so the bidir kernels stream half-size time blocks (same totals).
_CT_BIDIR = _CT // 2


def _run_fwd_bidir(xproj, valid, whh_f, whh_b):
    Tn, B2, G = xproj.shape
    Hp = G // 4
    grid = Tn // _CT_BIDIR
    blk3 = lambda shape: pl.BlockSpec((_CT_BIDIR,) + shape, lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    fixed = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    h_all, hprev, cprev = pl.pallas_call(
        _fwd_kernel_bidir,
        grid=(grid,),
        in_specs=[blk3((B2, G)), blk3((B2, 1)), fixed((Hp, G)), fixed((Hp, G))],
        out_specs=[blk3((B2, Hp)), blk3((B2, Hp)), blk3((B2, Hp))],
        out_shape=[jax.ShapeDtypeStruct((Tn, B2, Hp), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((B2, Hp), jnp.float32),
                        pltpu.VMEM((B2, Hp), jnp.float32)],
        interpret=_interpret(),
    )(xproj, valid, whh_f, whh_b)
    return h_all, hprev, cprev


@jax.custom_vjp
def _lstm_core_bidir(xproj, valid, whh_f, whh_b):
    h_all, _, _ = _run_fwd_bidir(xproj, valid, whh_f, whh_b)
    return h_all


def _core_bidir_fwd(xproj, valid, whh_f, whh_b):
    h_all, hprev, cprev = _run_fwd_bidir(xproj, valid, whh_f, whh_b)
    return h_all, (xproj, valid, whh_f, whh_b, hprev, cprev)


def _core_bidir_bwd(res, g):
    xproj, valid, whh_f, whh_b, hprev, cprev = res
    Tn, B2, G = xproj.shape
    Hp = G // 4
    grid = Tn // _CT_BIDIR
    rev3 = lambda shape: pl.BlockSpec((_CT_BIDIR,) + shape,
                                      lambda i: (pl.num_programs(0) - 1 - i, 0, 0),
                                      memory_space=pltpu.VMEM)
    fixed = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    dxproj, dwhh_f, dwhh_b = pl.pallas_call(
        _bwd_kernel_bidir,
        grid=(grid,),
        in_specs=[rev3((B2, G)), rev3((B2, 1)), fixed((Hp, G)), fixed((Hp, G)),
                  rev3((B2, Hp)), rev3((B2, Hp)), rev3((B2, Hp))],
        out_specs=[rev3((B2, G)), fixed((Hp, G)), fixed((Hp, G))],
        out_shape=[jax.ShapeDtypeStruct((Tn, B2, G), jnp.float32),
                   jax.ShapeDtypeStruct((Hp, G), jnp.float32),
                   jax.ShapeDtypeStruct((Hp, G), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B2, Hp), jnp.float32),
                        pltpu.VMEM((B2, Hp), jnp.float32)],
        interpret=_interpret(),
    )(xproj, valid, whh_f, whh_b, hprev, cprev, g.astype(jnp.float32))
    return dxproj, None, dwhh_f, dwhh_b


_lstm_core_bidir.defvjp(_core_bidir_fwd, _core_bidir_bwd)


# ---------------------------------------------------------------------------
# wrapper with custom VJP (single direction on padded shapes)
# ---------------------------------------------------------------------------

def _run_fwd(xproj, valid, whh):
    Tn, B, G = xproj.shape
    Hp = G // 4
    grid = Tn // _CT
    blk3 = lambda shape: pl.BlockSpec((_CT,) + shape, lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    fixed = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    h_all, hprev, cprev = pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[blk3((B, G)), blk3((B, 1)), fixed((Hp, G))],
        out_specs=[blk3((B, Hp)), blk3((B, Hp)), blk3((B, Hp))],
        out_shape=[jax.ShapeDtypeStruct((Tn, B, Hp), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((B, Hp), jnp.float32),
                        pltpu.VMEM((B, Hp), jnp.float32)],
        interpret=_interpret(),
    )(xproj, valid, whh)
    return h_all, hprev, cprev


@jax.custom_vjp
def _lstm_core(xproj, valid, whh):
    h_all, _, _ = _run_fwd(xproj, valid, whh)
    return h_all


def _core_fwd(xproj, valid, whh):
    h_all, hprev, cprev = _run_fwd(xproj, valid, whh)
    return h_all, (xproj, valid, whh, hprev, cprev)


def _core_bwd(res, g):
    xproj, valid, whh, hprev, cprev = res
    Tn, B, G = xproj.shape
    Hp = G // 4
    grid = Tn // _CT
    rev3 = lambda shape: pl.BlockSpec((_CT,) + shape,
                                      lambda i: (pl.num_programs(0) - 1 - i, 0, 0),
                                      memory_space=pltpu.VMEM)
    fixed = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    dxproj, dwhh = pl.pallas_call(
        _bwd_kernel,
        grid=(grid,),
        in_specs=[rev3((B, G)), rev3((B, 1)), fixed((Hp, G)),
                  rev3((B, Hp)), rev3((B, Hp)), rev3((B, Hp))],
        out_specs=[rev3((B, G)), fixed((Hp, G))],
        out_shape=[jax.ShapeDtypeStruct((Tn, B, G), jnp.float32),
                   jax.ShapeDtypeStruct((Hp, G), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, Hp), jnp.float32),
                        pltpu.VMEM((B, Hp), jnp.float32)],
        interpret=_interpret(),
    )(xproj, valid, whh, hprev, cprev, g.astype(jnp.float32))
    return dxproj, None, dwhh


_lstm_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# public API: bidirectional, torch weight layout, unpadded shapes
# ---------------------------------------------------------------------------

def _fused_bidir_default() -> bool:
    import os

    return os.environ.get("LASR_LSTM_FUSED_BIDIR", "0") == "1"


def lstm_pallas(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    forward: LSTMWeights,
    backward: LSTMWeights | None = None,
    matmul_dtype: jnp.dtype | None = None,
    fuse_directions: bool | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for ``ops.lstm.lstm`` backed by Pallas kernels.

    Direction-overlap notes (two A/B-measured variants):
      * lane-packed (block-diagonal weights, 4x MXU work per step):
        SLOWER — 5.9 vs 5.2 ms fwd+bwd at B=32, T=835; per-step cost
        scales with in-loop work, so paying 4x the matmul FLOPs loses.
      * batch-stacked ("2x-batch layout": backward rides as extra batch
        rows, per-direction split matmuls — same FLOPs, HALF the
        sequential depth): ALSO SLOWER — 5.9 vs 5.0 ms isolated, 29.4 vs
        29.2 ms full step (scripts/lstm_overlap_ab.py, LSTM_OVERLAP.json);
        per-iteration cost tracks the doubled in-loop row count, and the
        2B blocks force half-size time blocks (VMEM), doubling grid steps.
        Kept as an opt-in (``fuse_directions`` / LASR_LSTM_FUSED_BIDIR=1).
    A bf16 in-loop matmul variant (``matmul_dtype=bf16``) measured neutral
    on v5e."""
    B, T, _ = x.shape
    if B > _MAX_B:
        # Batch-tile oversized calls: the BPTT kernel's scoped-VMEM stack
        # scales with B and blows the 16 MB limit at B=64 (T~836, C=256:
        # 20.06M requested).  Rows are independent, so slicing is exact.
        return jnp.concatenate([
            lstm_pallas(x[i:i + _MAX_B], lengths[i:i + _MAX_B], forward,
                        backward, matmul_dtype, fuse_directions)
            for i in range(0, B, _MAX_B)], axis=0)
    Tn = _round_up(T, _CT)

    def prep(w: LSTMWeights, reverse: bool):
        """(xproj (Tn,B,G), valid (Tn,B,1), whh (Hp,G)) for one direction."""
        H = w.w_hh.shape[1]
        Hp = _round_up(H, 128)
        xproj = jnp.einsum("bti,gi->btg", x, w.w_ih) + w.b_ih + w.b_hh
        xg = xproj.reshape(B, T, 4, H)
        xg = jnp.pad(xg, ((0, 0), (0, Tn - T), (0, 0), (0, Hp - H)))
        xproj_p = jnp.moveaxis(xg.reshape(B, Tn, 4 * Hp), 1, 0)

        t_idx = jnp.arange(Tn)
        if reverse:
            xproj_p = jnp.flip(xproj_p, axis=0)
            valid = (Tn - 1 - t_idx)[:, None] < lengths[None, :]
        else:
            valid = t_idx[:, None] < lengths[None, :]
        valid = valid.astype(jnp.float32)[:, :, None]

        whh = jnp.concatenate(
            [jnp.pad(w.w_hh[i * H:(i + 1) * H].T, ((0, Hp - H), (0, Hp - H)))
             for i in range(4)], axis=1)                              # (Hp,4Hp)
        if matmul_dtype is not None:
            # bf16 W_hh => single-pass MXU recurrent matmuls in both kernels
            whh = whh.astype(matmul_dtype)
        return xproj_p, valid, whh, H, Hp

    def post(h_all, reverse: bool, H: int) -> jnp.ndarray:
        h_all = jnp.moveaxis(h_all, 0, 1)                             # (B,Tn,Hp)
        if reverse:
            # flipped-padded time: original frame t sat at position Tn-1-t;
            # flipping back puts it at index t directly
            h_all = jnp.flip(h_all, axis=1)
        return h_all[:, :T, :H]

    if backward is None:
        xp, valid, whh, H, _ = prep(forward, reverse=False)
        return post(_lstm_core(xp, valid, whh), False, H)

    if fuse_directions is None:
        fuse_directions = _fused_bidir_default()

    if fuse_directions:
        xp_f, v_f, whh_f, H, Hp = prep(forward, reverse=False)
        xp_b, v_b, whh_b, H_b, _ = prep(backward, reverse=True)
        assert H == H_b, "bidirectional hidden sizes must match"
        xp = jnp.concatenate([xp_f, xp_b], axis=1)                    # (Tn,2B,G)
        valid = jnp.concatenate([v_f, v_b], axis=1)
        h_all = _lstm_core_bidir(xp, valid, whh_f, whh_b)             # (Tn,2B,Hp)
        out_f = post(h_all[:, :B], False, H)
        out_b = post(h_all[:, B:], True, H)
        return jnp.concatenate([out_f, out_b], axis=-1)

    xp, valid, whh, H, _ = prep(forward, reverse=False)
    out_f = post(_lstm_core(xp, valid, whh), False, H)
    xp, valid, whh, H, _ = prep(backward, reverse=True)
    out_b = post(_lstm_core(xp, valid, whh), True, H)
    return jnp.concatenate([out_f, out_b], axis=-1)
