"""ReduceLROnPlateau integration: lr inside an inject_hyperparams optimizer
state is a runtime value updated between epochs (not a compiled constant)."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from lightning_asr_tpu.optim import ReduceLROnPlateau, novograd


def test_inject_hyperparams_lr_update():
    opt = optax.inject_hyperparams(novograd)(learning_rate=1e-2, betas=(0.0, 0.5))
    p = {"w": jnp.ones((4,))}
    state = opt.init(p)
    g = {"w": jnp.full((4,), 2.0)}

    updates1, state = opt.update(g, state, p)
    # beta1=0 -> update = -lr * g/||g||
    base = float(np.abs(np.asarray(updates1["w"])[0]))

    # plateau fires -> set new lr in the state, same compiled update fn
    state.hyperparams["learning_rate"] = jnp.asarray(1e-3, jnp.float32)
    updates2, state = opt.update(g, state, p)
    np.testing.assert_allclose(float(np.abs(np.asarray(updates2["w"])[0])), base / 10, rtol=1e-5)


def test_plateau_controller_with_trainer_hook():
    from lightning_asr_tpu.training.trainer import Trainer

    plateau = ReduceLROnPlateau(init_lr=1e-2, patience=0, factor=0.1, cooldown=0)
    opt = optax.inject_hyperparams(novograd)(learning_rate=1e-2, betas=(0.8, 0.5))
    p = {"w": jnp.ones((4,))}
    opt_state = opt.init(p)

    # emulate Trainer._set_lr without building a full Trainer
    class Dummy:
        _set_lr = Trainer._set_lr

    from lightning_asr_tpu.training.steps import AsrTrainState

    state = AsrTrainState(step=jnp.zeros((), jnp.int32), params=p,
                          batch_stats={}, opt_state=opt_state,
                          nan_count=jnp.zeros((), jnp.int32))
    plateau.step(1.0)
    lr = plateau.step(1.0)  # no improvement, patience 0 -> drop
    assert lr == 1e-3
    state = Dummy()._set_lr(state, lr)
    np.testing.assert_allclose(
        float(state.opt_state.hyperparams["learning_rate"]), 1e-3, rtol=1e-6)


def test_runtime_lr_optimizer_updates_under_jit():
    """Regression (round 3): a bare inject_hyperparams(novograd) lifts eps/
    betas into tracers, and novograd's validation raises
    TracerBoolConversionError the first time the update runs under jit —
    the path every real train step takes.  novograd_with_runtime_lr keeps
    only learning_rate dynamic."""
    from lightning_asr_tpu.optim import novograd_with_runtime_lr

    opt = novograd_with_runtime_lr(1e-2, betas=(0.0, 0.5), weight_decay=1e-3)
    p = {"w": jnp.ones((4,))}
    state = opt.init(p)
    g = {"w": jnp.full((4,), 2.0)}

    @jax.jit
    def step(g, state, p):
        return opt.update(g, state, p)

    updates1, state = step(g, state, p)  # must trace without error
    base = float(np.abs(np.asarray(updates1["w"])[0]))
    assert np.isfinite(base) and base > 0

    # plateau drop -> same compiled fn, new lr as a runtime value
    state.hyperparams["learning_rate"] = jnp.asarray(1e-3, jnp.float32)
    updates2, _ = step(g, state, p)
    scaled = float(np.abs(np.asarray(updates2["w"])[0]))
    np.testing.assert_allclose(scaled, base / 10, rtol=1e-4)


def test_plateau_state_checkpoint_roundtrip(tmp_path):
    """Resume must not reset the plateau schedule (round 4): the controller's
    lr/best/patience ride in checkpoint metadata (the reference delegates this
    to Lightning's lr_schedulers state-dict checkpointing,
    /root/reference/train.py:210-212)."""
    from lightning_asr_tpu.training.checkpoint import CheckpointManager
    from lightning_asr_tpu.training.steps import AsrTrainState

    plateau = ReduceLROnPlateau(init_lr=1e-2, patience=0, factor=0.1, cooldown=0)
    plateau.step(1.0)
    plateau.step(1.0)  # -> 1e-3
    plateau.step(0.5)  # improvement: best=0.5, bad=0
    assert plateau.lr == 1e-3

    state = AsrTrainState(step=jnp.asarray(7, jnp.int32), params={"w": jnp.ones((4,))},
                          batch_stats={}, opt_state=optax.EmptyState(),
                          nan_count=jnp.zeros((), jnp.int32))
    mgr = CheckpointManager(tmp_path / "ckpts", top_k=1)
    mgr.save(state, epoch=3, metrics={"val_wer": 0.5, "val_loss": 0.5},
             trainer_meta={"plateau": plateau.state_dict()})

    restored, meta = mgr.restore(state, "last")
    fresh = ReduceLROnPlateau(init_lr=1e-2, patience=0, factor=0.1, cooldown=0)
    fresh.load_state_dict(meta["trainer"]["plateau"])
    assert fresh.lr == plateau.lr
    assert fresh.best == plateau.best
    assert fresh.num_bad_epochs == plateau.num_bad_epochs
    assert fresh.cooldown_counter == plateau.cooldown_counter
    # next step behaves as if never interrupted: no improvement -> 1e-4
    assert fresh.step(0.6) == 1e-4
