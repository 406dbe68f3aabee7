"""Tensor-parallel sharding rules for the QuartzNet zoo (GSPMD).

The reference has no model parallelism at all — it trains one ~19M-param
model under pytorch-lightning DDP (``/root/reference/conf/conf.yaml:30``),
so every chip holds the full model.  This module is the beyond-reference
TPU scaling surface: a second ``model`` mesh axis shards the wide conv
trunk across chips the idiomatic JAX way — *annotate parameter shardings
and let XLA insert the collectives* (GSPMD / "computation follows
sharding"), rather than hand-writing all-gathers.

What gets sharded over ``model`` (channel-wise):

  * pointwise/residual/stem/epilog conv kernels ``(k, C_in, C_out)`` on the
    OUTPUT channel (Megatron "column parallel");
  * depthwise conv kernels ``(k, 1, C)`` on their only channel axis —
    depthwise convs have no cross-channel term, so this is embarrassingly
    parallel;
  * BatchNorm scale/bias and running mean/var ``(C,)`` — BN is per-channel,
    so its statistics shard with the activations.

What stays replicated: the BiLSTM context branch (hidden 40 — far too
small to shard; its Pallas kernel is a custom call GSPMD treats as an
opaque unit), the SE bottleneck, ``feature_mapping``, and the CTC head
(``decoder`` / ``head_*`` — the vocab axis is ragged and the head is
<2% of step FLOPs).  GSPMD inserts the boundary all-gathers
automatically.

Optimizer note: use ``novograd(..., fused=False)`` under tensor
parallelism — the per-tensor variant's momentum tree mirrors the params
tree, so these same rules shard it leaf-for-leaf.  The fused flat-buffer
variant concatenates every tensor into one (n_chunks, 2048) buffer, which
has no channel structure to shard (it would still be *correct* via GSPMD
resharding, just wasteful).  The cost is KNOWN and bounded: on the real
v5e chip (dp-only, B32 x 16.7 s) the per-tensor update measures 4.50 ms
vs the fused 2.44 ms — a +2.06 ms/step ceiling on the tp optimizer
penalty (under tp the per-tensor moments shard with their params, so the
per-chip update shrinks with 1/tp while the fused buffer would not).
Checkpoints cross the variant boundary losslessly:
``optim.novograd.migrate_novograd_opt_state`` converts fused <->
per-tensor exactly (the flat layout is deterministic), and
``CheckpointManager.restore`` applies it automatically, so "save on dp8
(fused default), restore on dp4 x tp2 (per-tensor)" just works —
``tests/test_tensor_parallel.py::test_topology_change_restore_dp_to_tp``.

Numerics: channel-sharded BN and psum'd gradients change float summation
order, so dp x tp results match dp-only results to ~1e-5 (tested in
``tests/test_tensor_parallel.py``), not bitwise.

GSPMD sharp edge (found empirically, tests/test_tensor_parallel.py::
test_grouped_conv_wgrad_needs_channel_sharding): on a 2-D mesh, XLA's SPMD
partitioner computes the WEIGHT gradient of a grouped convolution
(``feature_group_count == C``, i.e. every depthwise conv in the zoo)
incorrectly — off by O(1), not noise — whenever the conv's input
activations are replicated over the ``model`` axis, regardless of how the
kernel itself is sharded.  Channel-sharding the activations to match the
kernel avoids the bad partitioning path entirely (and is the layout tensor
parallelism wants anyway).  ``set_tp_mesh``/``shard_trunk_activations``
below pin that layout inside the model: SepConv constrains its input to
``P("data", None, "model")`` while a tp mesh is registered.  With no mesh
registered (single chip, dp-only) the helper is an identity — zero cost.
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# immediate-parent module names whose conv kernels shard on the last
# (output-channel) axis; 'decoder' (vocab head) and 'feature_mapping' are
# deliberately absent
_CONV_PARENTS = frozenset({
    "pointwise_conv", "depthwise_conv", "reside_conv", "last_conv",
    "first_cnn",  # QuartNet15x5's plain stem conv (models/quartznet.py:120)
})
# BatchNorm modules whose (C,) scale/bias/mean/var shard with the trunk;
# 'head_bn' is excluded (fed by the replicated head BiLSTM)
_BN_PARENTS = frozenset({"bn", "reside_bn", "last_bn", "first_bn"})


def _path_keys(path) -> list[str]:
    keys = []
    for p in path:
        if hasattr(p, "key"):
            keys.append(str(p.key))
        elif hasattr(p, "name"):
            keys.append(str(p.name))
        elif hasattr(p, "idx"):
            keys.append(str(p.idx))
    return keys


def tp_spec(path, leaf, tp: int) -> P:
    """PartitionSpec for one state leaf under ``tp``-way model parallelism.

    Works on any pytree whose paths contain the flax param names — the
    params tree itself, ``batch_stats``, and the non-fused NovoGrad
    ``exp_avg`` momentum tree (optax preserves the params structure).
    Leaves whose sharded axis would not divide evenly stay replicated
    (e.g. the vocab head), as do scalars (NovoGrad per-tensor moments).
    """
    keys = _path_keys(path)
    if not keys:
        return P()
    parent = keys[-2] if len(keys) >= 2 else ""
    ndim = getattr(leaf, "ndim", None)
    shape = getattr(leaf, "shape", ())
    if parent in _CONV_PARENTS and ndim == 3 and shape[-1] % tp == 0:
        return P(None, None, "model")  # (k, C_in, C_out) -> shard C_out
    if parent in _CONV_PARENTS and ndim == 1 and shape[0] % tp == 0:
        return P("model")  # conv bias
    if parent in _BN_PARENTS and ndim == 1 and shape[0] % tp == 0:
        return P("model")  # BN scale/bias/mean/var
    return P()


def tp_state_sharding(state: Any, mesh: Mesh) -> Any:
    """Per-leaf NamedShardings for a train state (or any state pytree)
    under the mesh's ``model`` axis; everything un-matched is replicated.

    With ``model`` absent or size 1 this degenerates to fully-replicated —
    the dp-only behavior — so callers can use it unconditionally.
    """
    tp = mesh.shape.get("model", 1)
    if tp <= 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), state)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, tp_spec(path, leaf, tp)), state)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """device_put a train state with tensor-parallel (or replicated)
    per-leaf shardings."""
    return jax.tree.map(jax.device_put, state, tp_state_sharding(state, mesh))


# ----------------------------------------------------------------------
# Activation layout pinning (see the GSPMD sharp edge in the module
# docstring).  Process-global so the flax modules stay mesh-agnostic; set
# by the Trainer / dryrun / tests before tracing tp train steps.
_TP_MESH: Optional[Mesh] = None


def set_tp_mesh(mesh: Optional[Mesh]) -> None:
    """Register (or clear, with None) the dp x tp mesh whose ``model`` axis
    trunk activations should be channel-sharded over.  Must be set before
    the train step is traced; meshes without a >1 ``model`` axis are
    treated as None."""
    global _TP_MESH
    if mesh is not None and mesh.shape.get("model", 1) <= 1:
        mesh = None
    _TP_MESH = mesh


def get_tp_mesh() -> Optional[Mesh]:
    return _TP_MESH


@contextlib.contextmanager
def tp_mesh_scope(mesh: Optional[Mesh]):
    """Scope the activation-layout pin to a block instead of leaking it
    process-wide: registers ``mesh`` for the duration and restores the
    previous registration on exit.  The Trainer wraps every call that can
    trace a step in this scope, so a tp Trainer no longer poisons later
    dp-only tracing (or inference) in the same process."""
    global _TP_MESH
    prev = _TP_MESH
    set_tp_mesh(mesh)
    try:
        yield
    finally:
        _TP_MESH = prev


def shard_trunk_activations(x: jax.Array) -> jax.Array:
    """Constrain a (B, T, C) trunk activation's CHANNEL axis to the
    ``model`` mesh axis when a tp mesh is registered and C divides evenly;
    identity otherwise.  Batch/time stay UNCONSTRAINED so GSPMD keeps the
    data sharding it propagated from the batch inputs (and so batch-1 init
    traces don't demand divisibility).  Called by SepConv on its input so
    every grouped conv sees channel-sharded operands (correct wgrad
    partitioning + the layout tp wants)."""
    mesh = _TP_MESH
    if mesh is None:
        return x
    tp = mesh.shape["model"]
    if x.ndim != 3 or x.shape[-1] % tp != 0:
        return x
    U = P.UNCONSTRAINED
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(U, U, "model")))
