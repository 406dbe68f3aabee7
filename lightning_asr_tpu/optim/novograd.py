"""NovoGrad as an optax gradient transformation.

Semantics match the NVIDIA implementation the reference trains with
(``/root/reference/scheduler/novograd.py``; used with betas (0.8, 0.5),
lr 1e-2, wd 1e-3 — ``train.py:46``), including its quirks:

  * the second moment is a **scalar per parameter tensor** (the squared
    grad L2 norm), *initialized to the first step's norm* rather than 0
    (guarded by an ``exp_avg_sq == 0`` check, reproduced exactly);
  * update order: normalize grad by sqrt(second moment)+eps, then add
    weight decay ON THE NORMALIZED grad, optional grad averaging, then
    momentum ``m = beta1*m + g``; step ``p -= lr*m``;
  * optional AMSGrad and LUC trust-ratio clipping.

TPU notes: the transform is elementwise + per-tensor reductions — XLA fuses
it into the backward pass; state is two scalars + one momentum tensor per
parameter.  ``learning_rate`` may be a scalar or an optax schedule; the step
count lives in the optimizer state.

``fused=True`` (the default) runs the whole update on ONE flat parameter
buffer: tensors are padded to 2048-element chunks and concatenated; the
~200 per-tensor norm reductions become a single chunked reduction plus one
small dense segment matmul (chunk sums x 0/1 tensor-membership matrix), and
the moment/step math becomes one fused elementwise pass — a handful of
kernels instead of ~10 per parameter tensor.  Scatter/gather-free by design
(gathers cost ~85 ns/element on TPU): per-tensor scalars are broadcast back
to chunks through the transposed segment matmul.  Numerics are identical up
to fp32 summation order.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax


class NovogradState(NamedTuple):
    count: jnp.ndarray              # scalar int32 step counter
    exp_avg: optax.Updates          # momentum, like params
    exp_avg_sq: optax.Updates       # scalar per tensor
    max_exp_avg_sq: optax.Updates   # scalar per tensor (amsgrad)


class FusedNovogradState(NamedTuple):
    count: jnp.ndarray          # scalar int32 step counter
    exp_avg: jnp.ndarray        # (n_chunks, CHUNK) f32 momentum, flat layout
    exp_avg_sq: jnp.ndarray     # (n_tensors,) f32
    max_exp_avg_sq: jnp.ndarray  # (n_tensors,) f32 (amsgrad)
    # flat-RESIDENT master copy of the params (VERDICT r4 #7): weight decay
    # and LUC read this instead of re-flattening the param tree every step
    # (the tree flatten was ~40 small dynamic-update-slices per step in the
    # trace's diffuse-overhead bucket).  Updated in flat space by the same
    # ``+u`` that apply_updates performs per-tensor, so it stays bit-equal
    # to flatten(params) for fp32 params; the NaN-skip guard keeps params
    # and opt_state together (training/steps.py:60-74), preserving the
    # invariant on skipped steps.
    p_flat: jnp.ndarray         # (n_chunks, CHUNK) f32


_CHUNK = 2048  # flat-buffer chunk; tensors are zero-padded to a multiple


class _FlatLayout:
    """Static chunked layout of a parameter pytree: each leaf occupies whole
    2048-element chunks of one flat buffer; ``seg`` is the dense 0/1
    (n_tensors, n_chunks) membership matrix used to reduce chunk sums to
    per-tensor scalars and to broadcast per-tensor scalars back to chunks."""

    def __init__(self, params):
        leaves, self.treedef = jax.tree.flatten(params)
        self.shapes = [l.shape for l in leaves]
        self.dtypes = [l.dtype for l in leaves]
        self.sizes = [int(np.prod(s)) if s else 1 for s in self.shapes]
        self.chunks = [-(-n // _CHUNK) for n in self.sizes]
        self.n_tensors = len(leaves)
        self.n_chunks = sum(self.chunks)
        seg = np.zeros((self.n_tensors, self.n_chunks), np.float32)
        off = 0
        self.chunk_offsets = []
        for i, c in enumerate(self.chunks):
            seg[i, off:off + c] = 1.0
            self.chunk_offsets.append(off)
            off += c
        self.seg = seg

    def flatten(self, tree) -> jnp.ndarray:
        """-> (n_chunks, CHUNK) f32, zero-padded per tensor."""
        leaves = self.treedef.flatten_up_to(tree)
        parts = []
        for leaf, n, c in zip(leaves, self.sizes, self.chunks):
            flat = jnp.ravel(leaf).astype(jnp.float32)
            if c * _CHUNK != n:
                flat = jnp.concatenate([flat, jnp.zeros(c * _CHUNK - n, jnp.float32)])
            parts.append(flat)
        return jnp.concatenate(parts).reshape(self.n_chunks, _CHUNK)

    def unflatten(self, buf: jnp.ndarray):
        """(n_chunks, CHUNK) -> pytree with original shapes/dtypes."""
        flat = buf.reshape(-1)
        leaves = []
        for shape, dtype, n, off in zip(self.shapes, self.dtypes, self.sizes,
                                        self.chunk_offsets):
            piece = jax.lax.dynamic_slice_in_dim(flat, off * _CHUNK, n)
            leaves.append(piece.reshape(shape).astype(dtype))
        return self.treedef.unflatten(leaves)


def novograd(
    learning_rate: optax.ScalarOrSchedule,
    betas: tuple[float, float] = (0.95, 0.98),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    grad_averaging: bool = False,
    amsgrad: bool = False,
    luc: bool = False,
    luc_trust: float = 1e-3,
    luc_eps: float = 1e-8,
    fused: bool = True,
) -> optax.GradientTransformation:
    beta1, beta2 = betas
    if not (0.0 <= beta1 < 1.0 and 0.0 <= beta2 < 1.0):
        raise ValueError(f"Betas have to be between 0 and 1: {betas}")
    if eps < 0:
        raise ValueError(f"Invalid epsilon value: {eps}")
    if fused:
        return _novograd_fused(learning_rate, beta1, beta2, eps, weight_decay,
                               grad_averaging, amsgrad, luc, luc_trust, luc_eps)

    def init_fn(params):
        return NovogradState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            exp_avg_sq=jax.tree.map(lambda p: jnp.zeros((), jnp.float32), params),
            max_exp_avg_sq=jax.tree.map(lambda p: jnp.zeros((), jnp.float32), params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("novograd requires params (weight decay / LUC)")
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        lr = jnp.asarray(lr, jnp.float32)

        def moments(g, m, v, vmax, p):
            g = g.astype(jnp.float32)
            norm = jnp.sum(g * g)
            v_new = jnp.where(v == 0.0, norm, beta2 * v + (1.0 - beta2) * norm)
            vmax_new = jnp.maximum(vmax, v_new) if amsgrad else vmax
            denom = jnp.sqrt(vmax_new if amsgrad else v_new) + eps
            g = g / denom
            if weight_decay != 0.0:
                g = g + weight_decay * p.astype(jnp.float32)
            if grad_averaging:
                g = g * (1.0 - beta1)
            m_new = beta1 * m + g
            return m_new, v_new, vmax_new

        def step_update(m, p):
            if luc:
                data_norm = jnp.linalg.norm(p.astype(jnp.float32))
                grad_norm = jnp.linalg.norm(m)
                factor = jnp.minimum(luc_trust * data_norm / (grad_norm + luc_eps), lr)
                return (-factor * m).astype(p.dtype)
            return (-lr * m).astype(p.dtype)

        flat_g, treedef = jax.tree.flatten(updates)
        flat_m = treedef.flatten_up_to(state.exp_avg)
        flat_v = treedef.flatten_up_to(state.exp_avg_sq)
        flat_vm = treedef.flatten_up_to(state.max_exp_avg_sq)
        flat_p = treedef.flatten_up_to(params)

        out = [moments(g, m, v, vm, p)
               for g, m, v, vm, p in zip(flat_g, flat_m, flat_v, flat_vm, flat_p)]
        new_m = treedef.unflatten([o[0] for o in out])
        new_v = treedef.unflatten([o[1] for o in out])
        new_vm = treedef.unflatten([o[2] for o in out])

        new_updates = jax.tree.map(step_update, new_m, params)
        return new_updates, NovogradState(state.count + 1, new_m, new_v, new_vm)

    return optax.GradientTransformation(init_fn, update_fn)


def _novograd_fused(learning_rate, beta1, beta2, eps, weight_decay,
                    grad_averaging, amsgrad, luc, luc_trust, luc_eps
                    ) -> optax.GradientTransformation:
    """Flat-buffer NovoGrad (see module docstring). Same update order as the
    reference (``/root/reference/scheduler/novograd.py:113-143``) including
    the init-to-first-norm second-moment quirk."""

    def init_fn(params):
        layout = _FlatLayout(params)
        return FusedNovogradState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=jnp.zeros((layout.n_chunks, _CHUNK), jnp.float32),
            exp_avg_sq=jnp.zeros((layout.n_tensors,), jnp.float32),
            max_exp_avg_sq=jnp.zeros((layout.n_tensors,), jnp.float32),
            p_flat=layout.flatten(params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("novograd requires params (weight decay / LUC)")
        layout = _FlatLayout(params)
        seg = jnp.asarray(layout.seg)                       # (N, C) 0/1
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        lr = jnp.asarray(lr, jnp.float32)

        g = layout.flatten(updates)                         # (C, CHUNK)
        # resident flat params — bit-equal to flatten(params) when every
        # leaf is fp32 (flat `+u` == per-tensor apply_updates); non-fp32
        # leaves would round differently per-tensor, so re-flatten then
        resident = all(np.dtype(d) == np.float32 for d in layout.dtypes)
        p = state.p_flat if resident else layout.flatten(params)

        norms = seg @ jnp.sum(g * g, axis=1)                # (N,) grad L2^2
        v = state.exp_avg_sq
        v_new = jnp.where(v == 0.0, norms, beta2 * v + (1.0 - beta2) * norms)
        vmax_new = jnp.maximum(state.max_exp_avg_sq, v_new) if amsgrad \
            else state.max_exp_avg_sq
        denom_t = jnp.sqrt(vmax_new if amsgrad else v_new) + eps   # (N,)
        denom_c = denom_t @ seg                             # (C,) broadcast back

        gn = g / denom_c[:, None]
        if weight_decay != 0.0:
            gn = gn + weight_decay * p                      # pad rows of p are 0
        if grad_averaging:
            gn = gn * (1.0 - beta1)
        m_new = beta1 * state.exp_avg + gn

        if luc:
            data_norm = jnp.sqrt(seg @ jnp.sum(p * p, axis=1))
            grad_norm = jnp.sqrt(seg @ jnp.sum(m_new * m_new, axis=1))
            factor_t = jnp.minimum(luc_trust * data_norm / (grad_norm + luc_eps), lr)
            u = -(factor_t @ seg)[:, None] * m_new
        else:
            u = -lr * m_new

        new_updates = layout.unflatten(u)
        return new_updates, FusedNovogradState(state.count + 1, m_new, v_new,
                                               vmax_new, p + u)

    return optax.GradientTransformation(init_fn, update_fn)


def migrate_novograd_opt_state(raw_opt, params, target_opt_state):
    """Convert a raw-restored NovoGrad optimizer state (a dict of field
    name -> array/tree, as orbax restores without a template) into the
    structure of ``target_opt_state`` — across the fused/per-tensor variant
    boundary.

    The fused flat layout is DETERMINISTIC from the params tree
    (``_FlatLayout``), so the conversion is exact: the (n_chunks, 2048)
    momentum buffer unflattens to the per-tensor float32 momentum tree and
    the (n_tensors,) second moments map to the tree-ordered per-tensor
    scalars, and vice versa.  This is what makes topology-change restores
    work out of the box: dp checkpoints default to the fused variant while
    tensor parallelism requires per-tensor (``parallel/tp.py`` — the flat
    buffer has no channel structure to shard), so "save on dp8, restore on
    dp4 x tp2" crosses this boundary (VERDICT r3 #5a).
    """
    layout = _FlatLayout(params)
    count = jnp.asarray(raw_opt["count"], jnp.int32)
    raw_m = raw_opt["exp_avg"]
    src_fused = hasattr(raw_m, "shape") and getattr(raw_m, "ndim", 0) == 2

    def _scalars_to_vec(tree) -> jnp.ndarray:
        leaves = layout.treedef.flatten_up_to(tree)
        return jnp.stack([jnp.asarray(l, jnp.float32).reshape(()) for l in leaves])

    def _vec_to_scalars(vec):
        vec = jnp.asarray(vec, jnp.float32)
        return layout.treedef.unflatten([vec[i] for i in range(layout.n_tensors)])

    def _unflatten_f32(buf):
        flat = jnp.asarray(buf, jnp.float32).reshape(-1)
        leaves = []
        for shape, n, off in zip(layout.shapes, layout.sizes, layout.chunk_offsets):
            leaves.append(jax.lax.dynamic_slice_in_dim(
                flat, off * _CHUNK, n).reshape(shape))
        return layout.treedef.unflatten(leaves)

    if isinstance(target_opt_state, FusedNovogradState):
        # p_flat (the flat-resident master copy) is DERIVED state — rebuild
        # it from the restored params when the checkpoint predates the field
        # or crosses the per-tensor boundary
        p_flat = (jnp.asarray(raw_opt["p_flat"], jnp.float32)
                  if isinstance(raw_opt, dict) and raw_opt.get("p_flat") is not None
                  and getattr(raw_opt["p_flat"], "ndim", 0) == 2
                  else layout.flatten(params))
        if src_fused:
            return FusedNovogradState(
                count, jnp.asarray(raw_m, jnp.float32),
                jnp.asarray(raw_opt["exp_avg_sq"], jnp.float32),
                jnp.asarray(raw_opt["max_exp_avg_sq"], jnp.float32), p_flat)
        return FusedNovogradState(
            count, layout.flatten(raw_m),
            _scalars_to_vec(raw_opt["exp_avg_sq"]),
            _scalars_to_vec(raw_opt["max_exp_avg_sq"]), p_flat)
    if isinstance(target_opt_state, NovogradState):
        if src_fused:
            return NovogradState(
                count, _unflatten_f32(raw_m),
                _vec_to_scalars(raw_opt["exp_avg_sq"]),
                _vec_to_scalars(raw_opt["max_exp_avg_sq"]))
        return NovogradState(
            count,
            jax.tree.map(lambda t, v: jnp.asarray(v, jnp.float32),
                         target_opt_state.exp_avg, raw_m),
            _vec_to_scalars(_scalars_to_vec(raw_opt["exp_avg_sq"])),
            _vec_to_scalars(_scalars_to_vec(raw_opt["max_exp_avg_sq"])))
    raise TypeError(
        f"cannot migrate NovoGrad state into {type(target_opt_state).__name__}")


def novograd_with_runtime_lr(learning_rate: float, **kwargs) -> "optax.GradientTransformation":
    """NovoGrad wrapped in ``optax.inject_hyperparams`` with ONLY the
    learning rate dynamic — the ReduceLROnPlateau recipe's requirement
    (the controller rewrites ``opt_state.hyperparams['learning_rate']``
    between epochs, ``/root/reference/train.py:49-52``).

    Every other argument is declared static: a bare
    ``inject_hyperparams(novograd)`` lifts ``eps``/``betas``/... into
    traced hyperparams too, and novograd's python-level validation
    (``if eps < 0``) then raises TracerBoolConversionError the first time
    the update runs under jit — i.e. inside every real train step."""
    static = ("betas", "eps", "weight_decay", "grad_averaging", "amsgrad",
              "luc", "luc_trust", "luc_eps", "fused")
    return optax.inject_hyperparams(novograd, static_args=static)(
        learning_rate=learning_rate, **kwargs)
