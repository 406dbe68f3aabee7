#!/usr/bin/env python
"""SSL-path smoke on real hardware: offline "wav2vec2" features (pkl) ->
feature_mapping 512->64 -> QuartNet12-context CTC, with the pseudo-labeling
loop exercised end-to-end on the chip — INCLUDING the confidence filter's
rejection branch and a no-injection control (VERDICT r2 #5).

The synthetic features make the task learnable without a real wav2vec2
model: each character of the transcript emits ~5 frames of a char-specific
512-dim pattern + noise, so the 512->64 linear mapping + encoder must
actually learn the pattern->char association (reference semantics:
``/root/reference/train_ssl.py:33-43``, pseudo loop :223-260).

Checks, written to SSL_SMOKE.json:
  * supervised SSL training converges (dev CER ~0 on the toy language);
  * the epoch-gated pseudo-labeling pass decodes a MIXED unlabeled pool —
    half clean (pattern-consistent) and half corrupted (patternless noise)
    — and the confidence gate keeps clean utterances while rejecting the
    corrupted ones (kept_clean >> kept_corrupted: selectivity, the thing
    the reference loop exists for, ``train_ssl.py:243-251``);
  * injected pseudo-labels do not hurt held-out dev CER vs a control arm
    trained identically with injection disabled.

Usage: python scripts/ssl_smoke.py [--utts 192] [--epochs 80]
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LABELS = [" ", "a", "b", "c", "d", "e", "f", "g", "h"]
FPS = 50  # wav2vec2 feature rate
FRAMES_PER_CHAR = 5


def make_corpus(root: Path, n_utts: int, seed: int, name: str,
                patterns) -> Path:
    """``patterns=None`` writes a CORRUPTED corpus: same shapes/durations,
    but the features are patternless noise at the same scale — the model
    cannot be confident on them, so the pseudo filter must reject them."""
    rng = np.random.default_rng(seed)
    feat_dir = root / "feats"
    feat_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    for i in range(n_utts):
        # long enough that the reference's features_cutout (rects up to 100
        # time steps, ``ssl_data_module.py:332-350``) doesn't erase whole
        # utterances
        n_words = int(rng.integers(5, 9))
        words = ["".join(rng.choice(LABELS[1:], size=rng.integers(3, 7)))
                 for _ in range(n_words)]
        text = " ".join(words)
        if patterns is None:
            T = len(text) * FRAMES_PER_CHAR
            feats = (2.0 * rng.standard_normal((T, 512))).astype(np.float32)[None]
        else:
            frames = []
            for ch in text:
                idx = LABELS.index(ch)
                block = patterns[idx][None, :] + 0.3 * rng.standard_normal(
                    (FRAMES_PER_CHAR, patterns.shape[1])).astype(np.float32)
                frames.append(block)
            feats = np.concatenate(frames, axis=0).astype(np.float32)[None]
        stem = f"{name}{i:04d}"
        with open(feat_dir / f"{stem}.pkl", "wb") as f:
            pickle.dump(feats, f)
        dur = feats.shape[1] / FPS
        rows.append({"audio_filepath": str(root / f"{stem}.wav"),
                     "duration": dur, "text": text})
    manifest = root / f"{name}_manifest.json"
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return manifest


def dev_cer(model, state, root: Path, manifest: Path, batch_size: int) -> float:
    """Greedy-decode a feature corpus and return corpus CER."""
    import jax
    import jax.numpy as jnp

    from lightning_asr_tpu.decoding.greedy import greedy_decode_to_strings
    from lightning_asr_tpu.metrics.wer import word_error_rate

    TPAD = 512
    rows = [json.loads(l) for l in open(manifest)]
    feats_b, lens_b, refs = [], [], []
    for r in rows:
        stem = Path(r["audio_filepath"]).stem
        f = pickle.load(open(root / "feats" / f"{stem}.pkl", "rb"))[0]
        T = min(f.shape[0], TPAD)
        buf = np.zeros((TPAD, f.shape[1]), np.float32)
        buf[:T] = f[:T]
        feats_b.append(buf)
        lens_b.append(T)
        refs.append(r["text"])
    fwd = jax.jit(lambda x, p: model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x, p, False))
    hyps = []
    for i in range(0, len(feats_b), batch_size):
        chunk = feats_b[i : i + batch_size]
        pad = batch_size - len(chunk)  # static batch shape; pad rows dropped
        xb = jnp.asarray(np.stack(chunk + [chunk[0]] * pad))
        pc = jnp.asarray(np.array(lens_b[i : i + batch_size] + [TPAD] * pad,
                                  np.float32) / TPAD)
        lp, out_lens = fwd(xb, pc)
        hyps += greedy_decode_to_strings(
            np.argmax(np.asarray(lp), -1), np.asarray(out_lens),
            LABELS, len(LABELS))[: len(chunk)]
    return float(word_error_rate(hyps, refs, use_cer=True))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=768)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=16)
    # threshold calibrated on the chip (confidence = negative mean max
    # log-prob, LOWER = more confident): a converged model scores clean
    # pool median 0.12 / p90 0.155 vs patternless noise median 0.22, so
    # 0.18 keeps most clean and rejects most corrupted.  (The reference's
    # 0.01 is tuned for real wav2vec posteriors, train_ssl.py:233.)
    ap.add_argument("--threshold", type=float, default=0.18)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.optim import cosine_annealing_warmup_restarts, novograd
    from lightning_asr_tpu.ssl_codec.ssl_datamodule import SSLDataModule
    from lightning_asr_tpu.training.ssl_trainer import SSLTrainer
    from lightning_asr_tpu.utils import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    patterns = rng.standard_normal((len(LABELS), 512)).astype(np.float32) * 2.0

    root = Path(tempfile.mkdtemp(prefix="ssl_smoke_"))
    train_manifest = make_corpus(root, args.utts, 1, "train", patterns)
    pool_n = max(args.utts // 3, 8)
    clean_manifest = make_corpus(root, pool_n, 2, "pseudo", patterns)
    corrupt_manifest = make_corpus(root, pool_n, 4, "corrupt", None)
    dev_manifest = make_corpus(root, max(args.utts // 3, 16), 3, "dev", patterns)

    def run_arm(inject: bool):
        dm = SSLDataModule(
            train_manifest=str(train_manifest), dev_manifest=str(dev_manifest),
            test_manifest=str(dev_manifest), labels=LABELS,
            train_bs=args.batch_size, dev_bs=args.batch_size,
            ssl_folder=str(root / "feats"),
            pseudo_manifest=[str(clean_manifest), str(corrupt_manifest)],
            bucket_seconds=(6.0,),
        )
        model = build_model(num_classes=len(LABELS) + 1, mask=True,
                            dtype=jnp.bfloat16, in_c=64, feature_in=512)
        steps = dm.steps_per_epoch()
        first_cycle = max(args.epochs * steps, 2)
        schedule = cosine_annealing_warmup_restarts(
            first_cycle_steps=first_cycle, cycle_mult=1,
            max_lr=5e-3, min_lr=1e-4,
            warmup_steps=min(60, steps * 2, first_cycle - 1), gamma=1.0)
        opt = novograd(schedule, betas=(0.8, 0.5), weight_decay=1e-3)
        trainer = SSLTrainer(
            model, opt, dm, total_epochs=args.epochs, run_dir=root / f"run_{inject}",
            lr_schedule=schedule,
            check_val_every_n_epoch=max(args.epochs // 2, 1),
            log_every_n_steps=50, train_wer_every_n_steps=10**9,
            sample_log_every_n_batches=10**9,
            # like sanity_overfit: augmentation off for the convergence gate
            # (features_cutout wipes large fractions of these short synthetic
            # utterances; its mechanics are covered by tests/test_ssl.py)
            augment=False,
            # exercise the pseudo loop well before the reference's epoch-300
            # gate, but late enough that decodes are confident, with a
            # meaningfully strict threshold (reference: 0.01)
            pseudo_start_epoch=(max(3 * args.epochs // 4, 2)
                                if inject else args.epochs + 1),
            pseudo_every_n_epochs=3,
            pseudo_confidence_threshold=args.threshold,
            hparams={"labels": LABELS, "feature_in": 512, "in_c": 64},
        )
        state = trainer.fit()
        return dm, model, state, trainer

    # --- arm 1: pseudo injection enabled over the mixed clean+corrupt pool
    dm, model, state, trainer = run_arm(inject=True)
    kept_paths = [Path(e.audio_filepath).stem for e in dm.pseudo_entries]
    kept_clean = sum(1 for s in kept_paths if s.startswith("pseudo"))
    kept_corrupt = sum(1 for s in kept_paths if s.startswith("corrupt"))
    cer_train = dev_cer(model, state, root, train_manifest, args.batch_size)
    cer_inject = dev_cer(model, state, root, dev_manifest, args.batch_size)

    # --- arm 2: control, injection disabled, otherwise identical
    _, model_c, state_c, _ = run_arm(inject=False)
    cer_control = dev_cer(model_c, state_c, root, dev_manifest, args.batch_size)

    report = {
        "utts": args.utts, "epochs": args.epochs,
        "confidence_threshold": args.threshold,
        "pseudo_pool_clean": pool_n,
        "pseudo_pool_corrupted": pool_n,
        "kept_clean": int(kept_clean),
        "kept_corrupted": int(kept_corrupt),
        "kept_clean_pct": round(100.0 * kept_clean / pool_n, 1),
        "kept_corrupted_pct": round(100.0 * kept_corrupt / pool_n, 1),
        "train_cer": cer_train,
        "dev_cer_with_pseudo": cer_inject,
        "dev_cer_control": cer_control,
        "pseudo_delta_cer": cer_inject - cer_control,
        "device": str(jax.devices()[0]),
        "note": ("train_cer gates learnability; dev CER measures "
                 "generalization of a model this size on a synthetic toy "
                 "corpus (expect partial memorization) — the control delta "
                 "is the meaningful dev-side signal."),
    }
    # Gates: learnability (train CER), selectivity (clean kept, corrupted
    # mostly rejected — the keep-ratio gate is primary; the absolute cap at
    # 30% bounds confidently-wrong leakage), and "don't hurt" (injection
    # within noise of control).
    gates = {
        "learnability": cer_train < 0.08,
        "clean_mostly_kept": kept_clean >= pool_n // 2,
        "selectivity_ratio": kept_clean >= 2 * max(kept_corrupt, 1),
        "corrupted_mostly_rejected": kept_corrupt <= int(0.3 * pool_n),
        "injection_not_harmful": cer_inject <= cer_control + 0.02,
    }
    report["gates"] = gates
    report["ok"] = all(gates.values())
    out = Path(__file__).resolve().parents[1] / "SSL_SMOKE.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    print("SSL SMOKE OK" if report["ok"] else "SSL SMOKE WEAK", file=sys.stderr)
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
