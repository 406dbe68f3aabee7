"""Trainer for the SSL retrain mode: raw waveform batches (AsrDataModule),
the wav2vec2 encoder trained inside the graph, pseudo-labeling inherited."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ssl_trainer import SSLTrainer
from .steps import AsrTrainState, make_raw_ssl_eval_step, make_raw_ssl_train_step


class SSLRetrainTrainer(SSLTrainer):
    def __init__(self, *args, **kwargs):
        kwargs.setdefault("from_features", True)  # skip mel-frontend wiring
        super().__init__(*args, **kwargs)
        self._train_step = jax.jit(
            make_raw_ssl_train_step(self.model, self.optimizer, self.vocab.blank_id),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            make_raw_ssl_eval_step(self.model, self.vocab.blank_id))

    def init_state(self):
        from ..parallel.mesh import replicated_sharding

        rng = self.rng
        waves = jnp.zeros((1, 3200), jnp.float32)
        lens = jnp.full((1,), 3200, jnp.int32)
        variables = self.model.init(
            {"params": rng, "dropout": rng, "augment": rng}, waves, lens, False)
        state = AsrTrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.optimizer.init(variables["params"]),
            nan_count=jnp.zeros((), jnp.int32),
        )
        return jax.device_put(state, replicated_sharding(self.mesh))
