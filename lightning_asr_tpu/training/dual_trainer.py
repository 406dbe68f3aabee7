"""Trainer for the dual-stream SSL model (``train_ssl_double.py``): swaps in
the dual train/eval steps (wav2vec2 features + on-device 20 ms mel) while
inheriting the SSL pseudo-labeling loop."""

from __future__ import annotations

import jax

from ..models.dual_stream import DUAL_MEL_CONFIG
from .ssl_trainer import SSLTrainer
from .steps import create_train_state, make_dual_eval_step, make_dual_train_step


class DualSSLTrainer(SSLTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._train_step = jax.jit(
            make_dual_train_step(
                self.model, self.optimizer, self.vocab.blank_id, DUAL_MEL_CONFIG),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            make_dual_eval_step(self.model, self.vocab.blank_id, DUAL_MEL_CONFIG))

    def init_state(self):
        from ..parallel.mesh import replicated_sharding

        rng = self.rng
        dummy_w2v = jax.numpy.zeros((1, 100, 512))
        dummy_mel = jax.numpy.zeros((1, 100, 64))
        percents = jax.numpy.ones((1,))
        variables = self.model.init({"params": rng, "dropout": rng},
                                    dummy_w2v, dummy_mel, percents, False)
        from .steps import AsrTrainState
        import jax.numpy as jnp

        state = AsrTrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.optimizer.init(variables["params"]),
            nan_count=jnp.zeros((), jnp.int32),
        )
        return jax.device_put(state, replicated_sharding(self.mesh))
