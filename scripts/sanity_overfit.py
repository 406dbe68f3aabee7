#!/usr/bin/env python
"""End-to-end learning sanity on real hardware: a synthetic tone-language
corpus (each character = a distinct sine tone) through the REAL pipeline —
wav files -> manifests -> bucketed batches -> on-device frontend ->
QuartNet12-context -> Pallas CTC -> NovoGrad -> WER — must reach near-zero
WER.  Validates the whole training system beyond unit parity.

Usage: python scripts/sanity_overfit.py [--epochs 30] [--utts 256]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_corpus(root: Path, n_utts: int, sr=16000) -> Path:
    rng = np.random.default_rng(0)
    chars = list("abcdefghij")
    freqs = {c: 300.0 + 150.0 * i for i, c in enumerate(chars)}
    rows = []
    for i in range(n_utts):
        n_words = rng.integers(2, 5)
        words = ["".join(rng.choice(chars, size=rng.integers(2, 5))) for _ in range(n_words)]
        text = " ".join(words)
        segs = []
        for ch in text:
            dur = 0.08
            t = np.arange(int(sr * dur)) / sr
            if ch == " ":
                segs.append(np.zeros_like(t))
            else:
                segs.append(0.3 * np.sin(2 * np.pi * freqs[ch] * t))
        wave = np.concatenate(segs).astype(np.float32)
        wave += 0.01 * rng.standard_normal(wave.shape).astype(np.float32)
        from lightning_asr_tpu.data.audio import write_wav

        path = root / f"utt{i}.wav"
        write_wav(path, wave[None], sr)
        rows.append({"audio_filepath": str(path), "duration": len(wave) / sr, "text": text})
    manifest = root / "manifest.json"
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return manifest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--utts", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=16)
    args = ap.parse_args()

    import jax.numpy as jnp

    from lightning_asr_tpu.data import AsrDataModule
    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.ops.frontend import MelFrontendConfig
    from lightning_asr_tpu.optim import cosine_annealing_warmup_restarts, novograd
    from lightning_asr_tpu.training import Trainer

    root = Path(tempfile.mkdtemp(prefix="sanity_corpus_"))
    manifest = make_corpus(root, args.utts)
    labels = [" "] + list("abcdefghij")

    dm = AsrDataModule(
        train_manifest=str(manifest), dev_manifest=str(manifest),
        test_manifest=str(manifest), labels=labels,
        train_bs=args.batch_size, dev_bs=args.batch_size,
        bucket_seconds=(2.0,), crop=False,
    )
    model = build_model(num_classes=len(labels) + 1, mask=True, dtype=jnp.bfloat16)
    steps_per_epoch = dm.steps_per_epoch()
    schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=max(args.epochs * steps_per_epoch, 2), cycle_mult=1,
        max_lr=5e-3, min_lr=1e-4, warmup_steps=min(100, steps_per_epoch * 2),
        gamma=1.0)
    opt = novograd(schedule, betas=(0.8, 0.5), weight_decay=1e-3)

    trainer = Trainer(
        model, opt, dm, total_epochs=args.epochs,
        check_val_every_n_epoch=max(args.epochs // 3, 1),
        run_dir=root / "run", lr_schedule=schedule,
        frontend=MelFrontendConfig(precision="default"),
        # augmentation off: each toy character is a single sine tone, so a
        # SpecAugment frequency band can erase an entire character class
        # (verified: default freq_mask=27 stalls at WER 0.93, freq_mask=4
        # learns; real broadband speech does not have this degeneracy)
        augment=False,
        log_every_n_steps=50,
        hparams={"labels": labels, "encoder": "quartznet12_context"},
    )
    state = trainer.fit()
    metrics = trainer.validate(state)
    print(json.dumps({"final_val_wer": metrics["val_wer"],
                      "final_val_wer_corpus": metrics["val_wer_corpus"],
                      "val_loss": metrics["val_loss"],
                      "nan_count": int(state.nan_count)}))
    assert metrics["val_wer_corpus"] < 0.1, "pipeline failed to learn the toy language"
    print("SANITY OK")


if __name__ == "__main__":
    main()
