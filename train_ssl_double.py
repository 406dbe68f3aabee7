#!/usr/bin/env python
"""Dual-stream SSL training (wav2vec2 + mel) — the reference's
``train_ssl_double.py`` CLI: wav2vec2 512->64 mapping concatenated with a
20 ms-hop mel stream into QuartNet12-context (in_c=128), with the same
pseudo-labeling loop as train_ssl."""

from __future__ import annotations

import logging
import sys
from pathlib import Path

from lightning_asr_tpu.models.dual_stream import DualStreamAsrModel
from lightning_asr_tpu.optim import cosine_annealing_warmup_restarts, novograd
from lightning_asr_tpu.parallel import make_mesh
from lightning_asr_tpu.ssl_codec.dual_datamodule import DualSSLDataModule
from lightning_asr_tpu.training import init_loggers
from lightning_asr_tpu.training.dual_trainer import DualSSLTrainer
from lightning_asr_tpu.utils import get_logger, load_config, seed_everything, setup_run_dir

logger = get_logger("train_ssl_double")
logging.getLogger("lightning_asr_tpu").setLevel(logging.INFO)


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    cfg = load_config(Path(__file__).parent / "conf" / "ssl-conf.yaml",
                      [a for a in argv if "=" in a])
    print(cfg.to_yaml())
    seed = cfg.get("train.seed", 0)
    seed_everything(seed)

    data_cfg, train_cfg, model_cfg, ssl_cfg = cfg.data, cfg.train, cfg.model, cfg.ssl

    dm = DualSSLDataModule(
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
        ssl_folder=None if ssl_cfg.get("on_the_flying") else ssl_cfg.get("feature_folder"),
        on_the_fly=bool(ssl_cfg.get("on_the_flying")),
        ssl_model_name=ssl_cfg.get("model_name", "facebook/wav2vec2-large-xlsr-53"),
        pseudo_manifest=data_cfg.get("pseudo_manifest"),
    )

    model = DualStreamAsrModel(
        num_classes=dm.vocab.num_classes,
        encoder_name=model_cfg.get("encoder", "quartznet12_context"),
        drop_rate=model_cfg.get("drop_rate", 0.0),
        mask=model_cfg.get("mask", True),
    )

    total_epoch = train_cfg.get("total_epoch", 400)
    lr = float(train_cfg.get("learning_rate", 1e-2))
    schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=max(total_epoch * dm.steps_per_epoch(), 2),
        cycle_mult=train_cfg.get("cycle_mult", 1),
        max_lr=lr,
        min_lr=float(train_cfg.get("min_lr", 1e-4)),
        warmup_steps=train_cfg.get("warmup_steps", 1000),
        gamma=train_cfg.get("lr_gamma", 0.1),
    )
    optimizer = novograd(schedule, betas=tuple(train_cfg.get("novograd_betas", (0.8, 0.5))),
                         weight_decay=float(train_cfg.get("weight_decay", 1e-3)))

    run_dir = setup_run_dir(cfg, default="outputs/ssl-double-run")
    trainer = DualSSLTrainer(
        model=model,
        optimizer=optimizer,
        datamodule=dm,
        total_epochs=total_epoch,
        check_val_every_n_epoch=train_cfg.get("check_val_every_n_epoch", 1),
        log_every_n_steps=train_cfg.get("log_every_n_steps", 10),
        run_dir=run_dir,
        loggers=init_loggers(cfg.get("loggers"), run_dir),
        lr_schedule=schedule,
        mesh=make_mesh(train_cfg.get("n_devices")),
        seed=seed,
        pseudo_start_epoch=ssl_cfg.get("pseudo_start_epoch", 300),
        pseudo_every_n_epochs=ssl_cfg.get("pseudo_every_n_epochs", 7),
        pseudo_confidence_threshold=ssl_cfg.get("pseudo_confidence_threshold", 0.01),
        hparams={"labels": dm.vocab.labels, "use_cer": dm.vocab.use_cer,
                 "encoder": model_cfg.get("encoder", "quartznet12_context"),
                 "dual_stream": True, "in_c": 128},
    )

    state = trainer.fit(resume=train_cfg.get("checkpoint"))
    trainer.test(state)


if __name__ == "__main__":
    main()
