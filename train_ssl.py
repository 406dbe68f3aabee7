#!/usr/bin/env python
"""SSL-feature CTC training + pseudo-labeling — the reference's
``train_ssl.py`` CLI: wav2vec2 features (offline pkl or on-the-fly frozen
extractor) -> feature_mapping 512->64 -> QuartNet12-context, with the
epoch-gated pseudo-labeling loop (``/root/reference/train_ssl.py``)."""

from __future__ import annotations

import logging
import sys
from pathlib import Path

from lightning_asr_tpu.models import build_model
from lightning_asr_tpu.optim import cosine_annealing_warmup_restarts, novograd
from lightning_asr_tpu.parallel import make_mesh
from lightning_asr_tpu.ssl_codec.ssl_datamodule import SSLDataModule
from lightning_asr_tpu.training import init_loggers
from lightning_asr_tpu.training.ssl_trainer import SSLTrainer
from lightning_asr_tpu.utils import get_logger, load_config, seed_everything, setup_run_dir

logger = get_logger("train_ssl")
logging.getLogger("lightning_asr_tpu").setLevel(logging.INFO)


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    cfg = load_config(Path(__file__).parent / "conf" / "ssl-conf.yaml",
                      [a for a in argv if "=" in a])
    print(cfg.to_yaml())
    seed = cfg.get("train.seed", 0)
    seed_everything(seed)

    data_cfg, train_cfg, model_cfg, ssl_cfg = cfg.data, cfg.train, cfg.model, cfg.ssl

    if ssl_cfg.get("retrain"):
        return _main_retrain(cfg)

    dm = SSLDataModule(
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

    import jax.numpy as jnp

    compute_dtype = {"bf16": jnp.bfloat16, "f32": None}[model_cfg.get("compute_dtype", "bf16")]
    model = build_model(
        num_classes=dm.vocab.num_classes,
        encoder=model_cfg.get("encoder", "quartznet12_context"),
        in_c=64,
        feature_in=512,
        drop_rate=model_cfg.get("drop_rate", 0.0),
        mask=model_cfg.get("mask", True),
        dtype=compute_dtype,
    )

    total_epoch = train_cfg.get("total_epoch", 400)
    lr = float(train_cfg.get("learning_rate", 1e-2))
    steps_per_epoch = dm.steps_per_epoch()
    schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=max(total_epoch * steps_per_epoch, 2),
        cycle_mult=train_cfg.get("cycle_mult", 1),
        max_lr=lr,
        min_lr=float(train_cfg.get("min_lr", 1e-4)),
        warmup_steps=train_cfg.get("warmup_steps", 1000),
        gamma=train_cfg.get("lr_gamma", 0.1),
    )
    optimizer = novograd(schedule, betas=tuple(train_cfg.get("novograd_betas", (0.8, 0.5))),
                         weight_decay=float(train_cfg.get("weight_decay", 1e-3)))

    run_dir = setup_run_dir(cfg, default="outputs/ssl-run")
    trainer = SSLTrainer(
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
        hparams={
            "labels": dm.vocab.labels,
            "use_cer": dm.vocab.use_cer,
            "encoder": model_cfg.get("encoder", "quartznet12_context"),
            "feature_in": 512,
            "in_c": 64,
            "drop_rate": model_cfg.get("drop_rate", 0.0),
            "mask": model_cfg.get("mask", True),
        },
    )

    state = trainer.fit(resume=train_cfg.get("checkpoint"))
    trainer.test(state)


def _main_retrain(cfg) -> None:
    """``ssl.retrain=true``: train the wav2vec2 feature encoder jointly,
    entirely inside the TPU graph (raw-waveform batches; the reference's
    retrain-the-extractor mode, ``ssl_data_module.py:302-304``)."""
    from lightning_asr_tpu.data import AsrDataModule
    from lightning_asr_tpu.ssl_codec.retrain import SSLRetrainAsrModel
    from lightning_asr_tpu.training.retrain_trainer import SSLRetrainTrainer

    data_cfg, train_cfg, model_cfg, ssl_cfg = cfg.data, cfg.train, cfg.model, cfg.ssl
    seed = cfg.get("train.seed", 0)

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
        crop=False,  # crops would desync wav2vec frame counts mid-epoch
        bucket_seconds=data_cfg.get("bucket_seconds"),
        pseudo_manifest=data_cfg.get("pseudo_manifest"),
    )
    model = SSLRetrainAsrModel(
        num_classes=dm.vocab.num_classes,
        encoder_name=model_cfg.get("encoder", "quartznet12_context"),
        drop_rate=model_cfg.get("drop_rate", 0.0),
        mask=model_cfg.get("mask", True),
        feat_extract_norm=ssl_cfg.get("feat_extract_norm", "layer"),
        conv_bias=ssl_cfg.get("conv_bias", True),
    )
    total_epoch = train_cfg.get("total_epoch", 400)
    lr = float(train_cfg.get("learning_rate", 1e-2))
    schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=max(total_epoch * dm.steps_per_epoch(), 2),
        cycle_mult=train_cfg.get("cycle_mult", 1),
        max_lr=lr, min_lr=float(train_cfg.get("min_lr", 1e-4)),
        warmup_steps=train_cfg.get("warmup_steps", 1000),
        gamma=train_cfg.get("lr_gamma", 0.1))
    optimizer = novograd(schedule, betas=tuple(train_cfg.get("novograd_betas", (0.8, 0.5))),
                         weight_decay=float(train_cfg.get("weight_decay", 1e-3)))

    run_dir = setup_run_dir(cfg, default="outputs/ssl-retrain")
    trainer = SSLRetrainTrainer(
        model=model, optimizer=optimizer, datamodule=dm, total_epochs=total_epoch,
        check_val_every_n_epoch=train_cfg.get("check_val_every_n_epoch", 1),
        log_every_n_steps=train_cfg.get("log_every_n_steps", 10),
        run_dir=run_dir, loggers=init_loggers(cfg.get("loggers"), run_dir),
        lr_schedule=schedule, mesh=make_mesh(train_cfg.get("n_devices")), seed=seed,
        pseudo_start_epoch=ssl_cfg.get("pseudo_start_epoch", 300),
        pseudo_every_n_epochs=ssl_cfg.get("pseudo_every_n_epochs", 7),
        pseudo_confidence_threshold=ssl_cfg.get("pseudo_confidence_threshold", 0.01),
        hparams={"labels": dm.vocab.labels, "use_cer": dm.vocab.use_cer,
                 "encoder": model_cfg.get("encoder", "quartznet12_context"),
                 "ssl_retrain": True},
    )
    # optionally warm-start the encoder from a local HF checkpoint state_dict
    init_ckpt = ssl_cfg.get("hf_encoder_state_dict")
    initial_state = None
    if init_ckpt:
        import torch

        from lightning_asr_tpu.ssl_codec.retrain import load_hf_encoder_into_params

        sd = torch.load(init_ckpt, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        initial_state = trainer.init_state()
        initial_state = initial_state.replace(params=load_hf_encoder_into_params(
            initial_state.params, sd, norm=ssl_cfg.get("feat_extract_norm", "layer")))
        logger.info("warm-started wav2vec encoder from %s", init_ckpt)
    state = trainer.fit(resume=train_cfg.get("checkpoint"), initial_state=initial_state)
    trainer.test(state)


if __name__ == "__main__":
    main()
