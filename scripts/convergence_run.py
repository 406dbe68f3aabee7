#!/usr/bin/env python
"""Convergence evidence on real hardware: a HARD synthetic tone language,
held-out dev set, trained with the reference's real recipes at real scale
(VERDICT r2 #4):

  * ``--scheduler cawr`` — the exact 960h recipe: NovoGrad(0.8, 0.5)
    lr 1e-2 wd 1e-3, CosineAnnealingWarmupRestarts (warmup 1000, min_lr
    1e-4, cycle_mult 2, gamma 0.5, first cycle = ``--epochs`` x
    steps/epoch), random crop + length-proportional SpecAugment
    (``/root/reference/README.md:51-59``, ``train.py:46-62``).  With the
    reference's parameterization the first restart lands exactly at
    end-of-training; pass ``--extra_epochs N`` to train through the
    boundary and capture the restart firing in the LR trace.
  * ``--scheduler plateau`` — the train-100 recipe (ReduceLROnPlateau,
    ``README.md:38-48``).

Unlike the overfit sanity (train==dev), this measures GENERALIZATION:
  * 26-character FORMANT alphabet: each character is a harmonic source
    (speaker-random f0) shaped by a char-specific two-formant envelope —
    identity lives in spectral SHAPE, pitch is an orthogonal speaker
    dimension.  (A pure-tone alphabet is degenerate under the recipe's
    27-bin SpecAugment freq mask, which can erase whole character classes —
    see scripts/sanity_overfit.py; formant characters survive it like real
    speech does.)
  * per-utterance f0 ~ U(95, 260) Hz train / U(85, 300) dev — dev speakers
    extend OUTSIDE the train pitch range — plus 3% vibrato;
  * amplitude envelopes, per-char duration jitter, additive noise,
    mixed utterance lengths ~2-9 s; dev texts disjoint from train texts.

Each invocation writes its run under ``runs[tag]`` in CONVERGENCE.json
(curve + per-epoch LR trace), preserving other tags.

Usage:
  python scripts/convergence_run.py --utts 20000 --epochs 100 \
      --extra_epochs 10 --tag cawr_960h_20k
  python scripts/convergence_run.py --utts 5000 --epochs 60 \
      --scheduler plateau --tag plateau_train100
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SR = 16000
CHARS = list("abcdefghijklmnopqrstuvwxyz")
LABELS = [" "] + CHARS
# 26 distinct (F1, F2) formant pairs on a vowel-like grid; any two
# characters differ in at least one formant by >=25% in center frequency
_F1S = [350.0, 500.0, 700.0, 950.0, 1250.0]
_F2S = [1600.0, 2050.0, 2600.0, 3300.0, 4200.0, 5300.0]
FORMANTS = {c: (_F1S[i % 5], _F2S[(i // 5 + i % 5) % 6])
            for i, c in enumerate(CHARS)}


def synth(text: str, f0_base: float, rng: np.random.Generator) -> np.ndarray:
    segs = []
    for ch in text:
        dur = float(rng.uniform(0.07, 0.11))
        n = int(SR * dur)
        t = np.arange(n) / SR
        if ch == " ":
            segs.append(np.zeros(n))
            continue
        f1, f2 = FORMANTS[ch]
        f0 = f0_base * (1.0 + 0.03 * np.sin(2 * np.pi * rng.uniform(3, 6) * t
                                            + rng.uniform(0, 6.28)))
        phase = 2 * np.pi * np.cumsum(f0) / SR
        h = np.arange(1, int(7600.0 / f0_base) + 1)
        hf = h * f0_base
        amp = (np.exp(-((hf - f1) / 220.0) ** 2)
               + 0.7 * np.exp(-((hf - f2) / 320.0) ** 2)
               + 0.08 / h)  # source tilt so no harmonic is exactly zero
        seg = (amp[None, :] * np.sin(phase[:, None] * h[None, :])).sum(axis=1)
        seg /= max(np.abs(seg).max(), 1e-6)
        env = np.minimum(1.0, np.minimum(t / 0.012, (dur - t) / 0.012).clip(min=0.0))
        segs.append(float(rng.uniform(0.15, 0.4)) * env * seg)
    wave = np.concatenate(segs)
    wave = wave + float(rng.uniform(0.004, 0.015)) * rng.standard_normal(wave.shape)
    return wave.astype(np.float32)


def make_split(root: Path, n_utts: int, seed: int, f0_lo: float,
               f0_hi: float, name: str) -> Path:
    from lightning_asr_tpu.data.audio import write_wav

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_utts):
        # mixed durations ~2-9 s (real-corpus-like spread over buckets)
        n_words = int(rng.integers(4, 16))
        words = ["".join(rng.choice(CHARS, size=rng.integers(2, 7)))
                 for _ in range(n_words)]
        text = " ".join(words)
        f0 = float(rng.uniform(f0_lo, f0_hi))
        wave = synth(text, f0, rng)
        path = root / f"{name}{i:05d}.wav"
        write_wav(path, wave[None], SR)
        rows.append({"audio_filepath": str(path), "duration": len(wave) / SR,
                     "text": text})
    manifest = root / f"{name}_manifest.json"
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=20000)
    ap.add_argument("--dev_utts", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--extra_epochs", type=int, default=0,
                    help="train past the first CAWR cycle to capture the restart")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--scheduler", choices=("cawr", "plateau"), default="cawr")
    ap.add_argument("--tag", type=str, default=None)
    ap.add_argument("--corpus", type=str, default="/tmp/convergence_corpus")
    ap.add_argument("--val_every", type=int, default=1)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the run's 'last' checkpoint, seeding "
                         "the curve from the tag's existing CONVERGENCE.json "
                         "entry (an interrupted run picks up mid-schedule; "
                         "state.step restores CAWR phase exactly)")
    ap.add_argument("--device_cache", action="store_true",
                    help="HBM-resident replay mode (train.device_cache): "
                         "epoch-0 batches stay on device, the reference crop "
                         "re-rolls in-graph per replay.  Used for the "
                         "fresh-crop convergence parity A/B vs the host "
                         "pipeline (VERDICT r3 #6).")
    ap.add_argument("--chunk_epochs", type=int, default=0,
                    help="stop (cleanly, after a validated+checkpointed epoch) "
                         "once N epochs have trained in THIS process.  The "
                         "tunneled axon client retains a host copy of every "
                         "host->device transfer (~one batch/step, verified "
                         "leak-free on the CPU backend), so a long run OOMs "
                         "the host around 40 epochs at 20k-utt scale; "
                         "chunked --resume loops bound the RSS.  Rounded up "
                         "to a multiple of --val_every so the stop lands on "
                         "a checkpoint boundary.")
    args = ap.parse_args()
    tag = args.tag or (f"{args.scheduler}_{args.utts}"
                       + ("_devcache" if args.device_cache else ""))

    import jax.numpy as jnp

    from lightning_asr_tpu.data import AsrDataModule
    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.ops.frontend import MelFrontendConfig
    from lightning_asr_tpu.optim import (
        ReduceLROnPlateau,
        cosine_annealing_warmup_restarts,
        novograd,
        novograd_with_runtime_lr,
    )
    from lightning_asr_tpu.training import Trainer
    from lightning_asr_tpu.utils import enable_compile_cache

    enable_compile_cache()
    root = Path(args.corpus)
    train_manifest = root / "train_manifest.json"
    dev_manifest = root / "dev_manifest.json"
    if not train_manifest.exists():
        root.mkdir(parents=True, exist_ok=True)
        t0 = time.monotonic()
        # train f0 95-260 Hz; dev speakers extend outside that range
        train_manifest = make_split(root, args.utts, 0, 95.0, 260.0, "train")
        dev_manifest = make_split(root, args.dev_utts, 1, 85.0, 300.0, "dev")
        print(f"corpus built in {time.monotonic()-t0:.0f}s", flush=True)

    dm = AsrDataModule(
        train_manifest=str(train_manifest), dev_manifest=str(dev_manifest),
        test_manifest=str(dev_manifest), labels=LABELS,
        train_bs=args.batch_size, dev_bs=args.batch_size,
        bucket_seconds=(3.0, 5.0, 7.0, 9.0, 12.0),
        # decode once EVER: the persistent mmap cache survives the
        # chunked-resume restarts this script is driven by (the RAM cache
        # re-decoded the whole corpus every ~16-epoch chunk)
        cache="mmap",
    )
    model = build_model(num_classes=len(LABELS) + 1, mask=True, dtype=jnp.bfloat16)
    steps_per_epoch = dm.steps_per_epoch()
    total_epochs = args.epochs + args.extra_epochs
    # exact 960h recipe at this corpus scale: per-step CAWR, first cycle =
    # --epochs x steps/epoch (the reference's parameterization,
    # train.py:53), warmup 1000, min_lr 1e-4, cycle_mult 2, gamma 0.5
    first_cycle = max(args.epochs * steps_per_epoch, 4)
    plateau = None
    if args.scheduler == "cawr":
        schedule = cosine_annealing_warmup_restarts(
            first_cycle_steps=first_cycle, cycle_mult=2, max_lr=1e-2,
            min_lr=1e-4, warmup_steps=min(1000, first_cycle // 3), gamma=0.5)
        opt = novograd(schedule, betas=(0.8, 0.5), weight_decay=1e-3)
    else:
        # train-100 recipe: fixed lr 1e-2 + ReduceLROnPlateau on val loss
        schedule = None
        plateau = ReduceLROnPlateau(init_lr=1e-2)
        opt = novograd_with_runtime_lr(1e-2, betas=(0.8, 0.5), weight_decay=1e-3)

    curve = []
    run_dir = root / f"run_{tag}"
    resume_from = None
    if args.resume:
        last = run_dir / "checkpoints" / "last"
        if last.exists():
            resume_from = "last"
            report_path = Path(__file__).resolve().parents[1] / "CONVERGENCE.json"
            if report_path.exists():
                prior = json.loads(report_path.read_text())
                curve.extend(prior.get("runs", {}).get(tag, {}).get("curve", []))
            print(f"resuming {tag} from {last} with {len(curve)} prior "
                  f"curve points", flush=True)
            if plateau is not None and curve:
                # Reconstruct the controller exactly by replaying the prior
                # curve's val_loss history (one plateau.step per validated
                # epoch — the same call sequence fit() made).  Newer
                # checkpoints also carry plateau state_dict in metadata and
                # the trainer restores it; the replay covers legacy ones and
                # is idempotent with it (identical resulting state).
                for c in curve:
                    plateau.step(c["val_loss"])
                print(f"plateau controller replayed: lr={plateau.lr:g} "
                      f"best={plateau.best:.4f} bad={plateau.num_bad_epochs} "
                      f"cooldown={plateau.cooldown_counter}", flush=True)
        else:
            print(f"--resume requested but {last} missing; starting fresh",
                  flush=True)

    def current_lr(trainer) -> float:
        if schedule is not None:
            return float(schedule(max(trainer.global_step - 1, 0)))
        # plateau arm: on_validation_end fires AFTER plateau.step() has
        # already applied any reduction, so plateau.lr at that point is the
        # NEXT epoch's lr — report the lr this epoch actually trained with
        # (stashed at train-epoch end, before validation)
        return float(getattr(trainer, "_epoch_train_lr", plateau.lr))

    def write_report() -> None:
        run_report = {
            "task": "synthetic 26-char formant language (two-formant "
                    "characters, speaker-random f0), dev speakers/texts unseen",
            "train_utts": args.utts, "dev_utts": args.dev_utts,
            "epochs": total_epochs, "batch_size": args.batch_size,
            "steps_per_epoch": steps_per_epoch,
            "scheduler": args.scheduler,
            "device_cache": args.device_cache,
            "recipe": ({"optimizer": "novograd", "betas": [0.8, 0.5],
                        "lr": 1e-2, "weight_decay": 1e-3,
                        "schedule": "cosine_warmup_restarts",
                        "first_cycle_steps": first_cycle,
                        "warmup": min(1000, first_cycle // 3), "min_lr": 1e-4,
                        "cycle_mult": 2, "gamma": 0.5,
                        "crop": True,
                        "spec_augment": {"freq_mask": 27, "time_mask": 0.07}}
                       if args.scheduler == "cawr" else
                       {"optimizer": "novograd", "betas": [0.8, 0.5],
                        "lr": 1e-2, "weight_decay": 1e-3,
                        "schedule": "reduce_on_plateau", "crop": True,
                        "spec_augment": {"freq_mask": 27, "time_mask": 0.07}}),
            "curve": curve,
            "final_val_wer": curve[-1]["val_wer"] if curve else None,
            "best_val_wer": min((c["val_wer"] for c in curve), default=None),
            "device": "TPU v5e (1 chip, tunneled)",
        }
        out = Path(__file__).resolve().parents[1] / "CONVERGENCE.json"
        merged = {}
        if out.exists():
            try:
                merged = json.loads(out.read_text())
            except json.JSONDecodeError:
                merged = {}
        if "runs" not in merged:  # migrate the round-2 single-run layout
            merged = {"runs": ({"round2_4k": merged} if merged.get("curve") else {})}
        merged["runs"][tag] = run_report
        out.write_text(json.dumps(merged, indent=2) + "\n")

    chunk = args.chunk_epochs
    if chunk:
        chunk = -(-chunk // args.val_every) * args.val_every

    class CurveTrainer(Trainer):
        epochs_this_process = 0

        def on_validation_end(self, state, epoch, val_metrics):
            curve.append({"epoch": epoch,
                          **{k: float(v) for k, v in val_metrics.items()},
                          "lr": current_lr(self),
                          "step": self.global_step})
            print(f"epoch {epoch}: val_wer={val_metrics['val_wer']:.4f} "
                  f"val_loss={val_metrics['val_loss']:.3f} "
                  f"lr={curve[-1]['lr']:.5f}", flush=True)
            write_report()  # incremental: a partial run is still evidence

        def on_train_epoch_end(self, state, epoch):
            if plateau is not None:
                self._epoch_train_lr = float(plateau.lr)
            self.epochs_this_process += 1
            if chunk and self.epochs_this_process >= chunk:
                # fit() validates + checkpoints this epoch before honoring
                # should_stop, so the next --resume picks up exactly here
                self.should_stop = True

    trainer = CurveTrainer(
        model, opt, dm, total_epochs=total_epochs, run_dir=str(run_dir),
        lr_schedule=schedule, check_val_every_n_epoch=args.val_every,
        log_every_n_steps=100, train_wer_every_n_steps=10**9,
        sample_log_every_n_batches=10**9,
        frontend=MelFrontendConfig(precision="default"),
        augment=True, freq_mask=27, time_mask=0.07,
        plateau=plateau, device_cache=args.device_cache,
        hparams={"labels": LABELS, "recipe": tag},
    )
    trainer.fit(resume=resume_from)

    write_report()
    last_epoch = max((c["epoch"] for c in curve), default=-1)
    print(json.dumps({"tag": tag,
                      "final_val_wer": curve[-1]["val_wer"] if curve else None,
                      "best_val_wer": min((c["val_wer"] for c in curve), default=None),
                      "completed": last_epoch >= total_epochs - 1}))


if __name__ == "__main__":
    main()
