#!/usr/bin/env python
"""Supervised CTC training entry — the reference's ``train.py`` CLI surface:

    python train.py train.learning_rate=1e-2 data.train_manifest='["a.json"]'

Builds datamodule, model, NovoGrad + cosine-warmup-restarts, and runs
Trainer.fit + test (``/root/reference/train.py:201-253``).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

from lightning_asr_tpu.data import AsrDataModule
from lightning_asr_tpu.models import build_model
from lightning_asr_tpu.ops.frontend import MelFrontendConfig
from lightning_asr_tpu.optim import (
    ReduceLROnPlateau,
    cosine_annealing_warmup_restarts,
    novograd,
)
from lightning_asr_tpu.parallel import init_distributed, make_mesh
from lightning_asr_tpu.training import Trainer, init_loggers
from lightning_asr_tpu.utils import get_logger, load_config, seed_everything, setup_run_dir

logger = get_logger("train")
logging.getLogger("lightning_asr_tpu").setLevel(logging.INFO)


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    config_path = Path(__file__).parent / "conf" / "conf.yaml"
    overrides = [a for a in argv if "=" in a]
    cfg = load_config(config_path, overrides)
    print(cfg.to_yaml())

    seed = cfg.get("train.seed", 0)
    seed_everything(seed)
    from lightning_asr_tpu.utils import enable_compile_cache
    enable_compile_cache()

    data_cfg, train_cfg, model_cfg = cfg.data, cfg.train, cfg.model
    init_distributed(train_cfg.get("num_nodes", 1))

    dm = AsrDataModule(
        train_manifest=data_cfg.get("train_manifest"),
        dev_manifest=data_cfg.get("val_manifest"),
        test_manifest=data_cfg.get("test_manifest"),
        labels=data_cfg.get("labels"),
        train_bs=train_cfg.get("train_batch_size", 32),
        dev_bs=train_cfg.get("dev_batch_size", 32),
        train_max_duration=data_cfg.get("train_max_duration", 16.7),
        dev_max_duration=data_cfg.get("dev_max_duration", 40),
        seed=seed,
        bucket_seconds=data_cfg.get("bucket_seconds"),
        prefetch_depth=data_cfg.get("prefetch_depth", 2),
        cache=data_cfg.get("cache"),
        cache_dir=data_cfg.get("cache_dir"),
        wire=data_cfg.get("wire", "int16"),
    )

    import jax.numpy as jnp

    compute_dtype = {"bf16": jnp.bfloat16, "f32": None}[model_cfg.get("compute_dtype", "bf16")]
    model = build_model(
        num_classes=dm.vocab.num_classes,
        encoder=model_cfg.get("encoder", "quartznet12_context"),
        drop_rate=model_cfg.get("drop_rate", 0.0),
        mask=model_cfg.get("mask", True),
        dtype=compute_dtype,
    )

    total_epoch = train_cfg.get("total_epoch", 100)
    lr = float(train_cfg.get("learning_rate", 1e-2))
    steps_per_epoch = dm.steps_per_epoch()
    logger.info("steps per epoch: %d", steps_per_epoch)

    plateau = None
    betas = tuple(train_cfg.get("novograd_betas", (0.8, 0.5)))
    wd = float(train_cfg.get("weight_decay", 1e-3))
    # tensor parallelism (train.tp): shard the conv trunk over a 'model'
    # mesh axis (parallel/tp.py).  The per-tensor NovoGrad variant is
    # required there — the fused flat-buffer layout has no channel
    # structure to shard (see parallel/tp.py docstring).
    tp = int(train_cfg.get("tp", 1))
    fused_opt = tp <= 1
    if train_cfg.get("scheduler", "cosine_warmup_restarts") == "cosine_warmup_restarts":
        schedule = cosine_annealing_warmup_restarts(
            first_cycle_steps=max(total_epoch * steps_per_epoch, 2),
            cycle_mult=train_cfg.get("cycle_mult", 2),
            max_lr=lr,
            min_lr=float(train_cfg.get("min_lr", 1e-4)),
            warmup_steps=train_cfg.get("warmup_steps", 1000),
            gamma=train_cfg.get("lr_gamma", 0.5),
        )
        optimizer = novograd(schedule, betas=betas, weight_decay=wd, fused=fused_opt)
    else:  # reduce_on_plateau recipe (the 16.4% train-100 run)
        from lightning_asr_tpu.optim import novograd_with_runtime_lr

        plateau = ReduceLROnPlateau(init_lr=lr)
        optimizer = novograd_with_runtime_lr(lr, betas=betas, weight_decay=wd,
                                             fused=fused_opt)
        schedule = None

    # Lightning Trainer knobs the reference pins to off/1
    # (/root/reference/train.py:244,249-250): gradient clipping chains an
    # optax transform ahead of NovoGrad; accumulation splits each device
    # batch into k in-graph micro-batches (raise train_batch_size k× to
    # grow the effective batch — see training/steps.py).
    clip_val = float(train_cfg.get("gradient_clip_val", 0) or 0)
    if clip_val:
        from lightning_asr_tpu.optim import with_gradient_clipping

        optimizer = with_gradient_clipping(
            optimizer, clip_val,
            train_cfg.get("gradient_clip_algorithm", "value"))

    run_dir = setup_run_dir(cfg, default="outputs/run")
    logger.info("run dir: %s", run_dir)
    import jax

    is_primary = jax.process_index() == 0  # loggers write from process 0 only
    trainer = Trainer(
        model=model,
        optimizer=optimizer,
        datamodule=dm,
        total_epochs=total_epoch,
        check_val_every_n_epoch=train_cfg.get("check_val_every_n_epoch", 1),
        log_every_n_steps=train_cfg.get("log_every_n_steps", 10),
        run_dir=run_dir,
        loggers=init_loggers(cfg.get("loggers"), run_dir) if is_primary else None,
        lr_schedule=schedule,
        frontend=MelFrontendConfig(precision=data_cfg.get("frontend_precision", "default")),
        augment=data_cfg.get("augment", True),
        freq_mask=data_cfg.get("freq_mask", 27),
        time_mask=data_cfg.get("time_mask", 0.07),
        mesh=(make_mesh(train_cfg.get("n_devices"))
              if tp <= 1 else
              make_mesh(train_cfg.get("n_devices"),
                        axis_names=("data", "model"),
                        shape=(-1, tp) if train_cfg.get("n_devices") is None
                        else (train_cfg["n_devices"] // tp, tp))),
        seed=seed,
        plateau=plateau,
        device_cache=train_cfg.get("device_cache", False),
        accumulate_grad_batches=int(train_cfg.get("accumulate_grad_batches", 1)),
        limit_train_batches=train_cfg.get("limit_train_batches", 1.0),
        limit_val_batches=train_cfg.get("limit_val_batches", 1.0),
        hparams={
            "labels": dm.vocab.labels,
            "use_cer": dm.vocab.use_cer,
            "encoder": model_cfg.get("encoder", "quartznet12_context"),
            "drop_rate": model_cfg.get("drop_rate", 0.0),
            "mask": model_cfg.get("mask", True),
            "learning_rate": lr,
            "weight_decay": float(train_cfg.get("weight_decay", 1e-3)),
            "total_epoch": total_epoch,
        },
    )

    state = trainer.fit(resume=train_cfg.get("checkpoint"))
    trainer.test(state)


if __name__ == "__main__":
    main()
