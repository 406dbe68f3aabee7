"""Gradient accumulation + gradient clipping — the two Lightning Trainer
knobs the reference exposes but pins off (``/root/reference/train.py:244``
``accumulate_grad_batches=1``, ``:249-250`` ``gradient_clip_val=0``,
``gradient_clip_algorithm='value'``).

Accumulation here is TPU-inverted (see ``training/steps.py``): one k×
device batch is split into k in-graph micro-batches under ``lax.scan``.
With the two halves of the batch identical (so per-micro-batch BN stats
equal full-batch stats) and dropout off, the accumulated step must
reproduce the plain step's loss and updated params exactly up to
reduction-order float error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lightning_asr_tpu.models import build_model
from lightning_asr_tpu.ops.frontend import MelFrontendConfig
from lightning_asr_tpu.optim import (
    novograd,
    novograd_with_runtime_lr,
    with_gradient_clipping,
)
from lightning_asr_tpu.training.steps import create_train_state, make_train_step
from lightning_asr_tpu.training.trainer import _find_hyperparams_state

BLANK = 28


def _batch(n_rows: int, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    S = 4800  # 0.3 s -> 31 mel frames -> 16 encoder frames
    return {
        "waves": (rng.standard_normal((n_rows, S)) * 0.1).astype(np.float32),
        "wave_lens": np.full((n_rows,), S, np.int32),
        "prev_samples": np.zeros((n_rows,), np.float32),
        "targets": rng.integers(0, 28, size=(n_rows, 16)).astype(np.int32),
        "target_lens": np.full((n_rows,), 6, np.int32),
    }


def _duplicated_batch() -> dict:
    """4 rows where rows 2:4 are copies of rows 0:2 — each half of an
    accum_steps=2 split sees the same data, so micro-batch BN statistics
    equal the full-batch ones and grads must match the unsplit step."""
    half = _batch(2)
    return {k: np.concatenate([v, v], axis=0) for k, v in half.items()}


@pytest.fixture(scope="module")
def setup():
    model = build_model(num_classes=29, encoder="quartznet12_context",
                        mask=True, drop_rate=0.0)
    opt = novograd(1e-2, betas=(0.8, 0.5), weight_decay=1e-3, fused=False)
    state = create_train_state(model, opt, jax.random.PRNGKey(0),
                               feature_shape=(1, 128, 64))
    return model, opt, state


def test_accum_matches_plain_step_on_duplicated_halves(setup):
    model, opt, state = setup
    batch = _duplicated_batch()
    rng = jax.random.PRNGKey(42)
    # dither uses a full-batch RNG draw BEFORE the micro-batch split, so it
    # cannot be made half-symmetric — disable it for the equivalence check
    fe = MelFrontendConfig(dither=0.0)

    plain = make_train_step(model, opt, blank_id=BLANK, frontend=fe,
                            augment=False)
    accum = make_train_step(model, opt, blank_id=BLANK, frontend=fe,
                            augment=False, accum_steps=2)

    s1, m1 = jax.jit(plain)(state, batch, rng)
    s2, m2 = jax.jit(accum)(state, batch, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    # metrics keep full-batch shapes (preds reassembled from micro-batches)
    assert m2["preds"].shape[0] == 4
    assert m2["pred_lens"].shape == (4,)
    assert int(s2.step) == int(state.step) + 1


def test_accum_requires_divisible_batch(setup):
    model, opt, state = setup
    step = make_train_step(model, opt, blank_id=BLANK,
                           frontend=MelFrontendConfig(dither=0.0),
                           augment=False, accum_steps=2)
    with pytest.raises(ValueError, match="divide"):
        step(state, _batch(3), jax.random.PRNGKey(0))


def test_clip_value_clamps_elementwise():
    tx = with_gradient_clipping(optax.scale(1.0), 1.0, "value")
    params = {"w": jnp.zeros(3)}
    st = tx.init(params)
    grads = {"w": jnp.array([-5.0, 0.5, 3.0])}
    updates, _ = tx.update(grads, st, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), [-1.0, 0.5, 1.0])


def test_clip_norm_rescales_global_norm():
    tx = with_gradient_clipping(optax.scale(1.0), 2.0, "norm")
    params = {"a": jnp.zeros(2), "b": jnp.zeros(1)}
    st = tx.init(params)
    grads = {"a": jnp.array([6.0, 8.0]), "b": jnp.array([0.0])}  # norm 10
    updates, _ = tx.update(grads, st, params)
    np.testing.assert_allclose(np.asarray(updates["a"]), [1.2, 1.6], rtol=1e-6)
    total = float(optax.global_norm(updates))
    assert abs(total - 2.0) < 1e-5


def test_clip_preserves_nan_for_skip_guard():
    """NaN grads must stay non-finite through both algorithms so the
    in-graph NaN-skip guard (steps.py::_guarded_update) still fires."""
    params = {"w": jnp.zeros(2)}
    for algo in ("value", "norm"):
        tx = with_gradient_clipping(optax.scale(1.0), 1.0, algo)
        st = tx.init(params)
        updates, _ = tx.update({"w": jnp.array([jnp.nan, 0.1])}, st, params)
        assert not bool(jnp.isfinite(updates["w"]).all()), algo


def test_clip_disabled_and_bad_algorithm():
    inner = optax.scale(1.0)
    assert with_gradient_clipping(inner, 0.0, "value") is inner
    with pytest.raises(ValueError, match="gradient_clip_algorithm"):
        with_gradient_clipping(inner, 1.0, "banana")


def test_hyperparams_found_through_clip_chain():
    """The plateau controller rewrites opt_state.hyperparams['learning_rate'];
    clipping wraps the optimizer in optax.chain, nesting that state one
    tuple deep — _find_hyperparams_state must still locate it."""
    opt = with_gradient_clipping(novograd_with_runtime_lr(1e-2), 1.0, "norm")
    st = opt.init({"w": jnp.ones(3)})
    found = _find_hyperparams_state(st)
    assert found is not None
    assert "learning_rate" in found.hyperparams
    np.testing.assert_allclose(float(found.hyperparams["learning_rate"]), 1e-2)
    # bare (unchained) state still resolves
    bare = novograd_with_runtime_lr(1e-2).init({"w": jnp.ones(3)})
    assert _find_hyperparams_state(bare) is not None
