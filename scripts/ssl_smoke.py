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


def speaker_deltas(n_speakers: int, sigma: float, seed: int = 77) -> np.ndarray:
    """Per-(speaker, char) pattern perturbations — the synthetic "accent".

    Each speaker pronounces every character as ``pattern[c] + delta[s, c]``
    with ``delta ~ sigma * N(0, I_512)``.  A per-speaker BIAS (one delta for
    all chars) would be trivially normalized away by BN; per-char deltas make
    speaker identity change the class-conditional distributions themselves,
    so a model trained on few speakers genuinely overfits their accents and
    unlabeled-speaker coverage genuinely helps — the mechanism real
    pseudo-labeling exploits (``/root/reference/train_ssl.py:223-260``
    exists to harvest exactly this kind of coverage from unlabeled audio).

    One global seed: speaker s is the SAME accent in every corpus, and
    corpora are given disjoint speaker id ranges by the caller."""
    rng = np.random.default_rng(seed)
    return (sigma * rng.standard_normal(
        (n_speakers, len(LABELS), 512))).astype(np.float32)


def make_corpus(root: Path, n_utts: int, seed: int, name: str,
                patterns, noise=(0.3, 0.3), speakers=None) -> Path:
    """``patterns=None`` writes a CORRUPTED corpus: same shapes/durations,
    but the features are patternless noise at the same scale — the model
    cannot be confident on them, so the pseudo filter must reject them.

    ``noise=(lo, hi)`` draws a per-UTTERANCE noise scale from U(lo, hi):
    with hi > lo the pool is SNR-heterogeneous like real unlabeled audio,
    so confidence has per-utterance structure to discriminate on (the
    regime the reference's threshold filter exists for,
    ``/root/reference/train_ssl.py:243-251``) instead of a pool whose
    utterances are all equally hard by construction.

    ``speakers=(deltas, id_lo, id_hi)`` draws a speaker id per utterance
    from [id_lo, id_hi) and adds ``deltas[spk, char]`` to every emitted
    pattern (see speaker_deltas)."""
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
        spk = (int(rng.integers(speakers[1], speakers[2]))
               if speakers is not None else -1)
        if patterns is None:
            # corrupted utterance: patternless noise whose per-element
            # amplitude MATCHES a clean pool utterance drawn at the same
            # noise scale — clean feats are pattern (std 2.0, line ~331)
            # + scale*N(0,1), i.e. per-element std sqrt(2.0^2 + scale^2).
            # Without this the corrupt pool is quieter than clean speech
            # whenever base_noise > 0 and amplitude alone leaks the label
            # (ADVICE r4: the earlier noise= pass-through never reached
            # this branch).
            T = len(text) * FRAMES_PER_CHAR
            scale = float(rng.uniform(noise[0], noise[1]))
            amp = float(np.sqrt(2.0 ** 2 + scale ** 2))
            feats = (amp * rng.standard_normal((T, 512))).astype(np.float32)[None]
        else:
            scale = float(rng.uniform(noise[0], noise[1]))
            frames = []
            for ch in text:
                idx = LABELS.index(ch)
                base = patterns[idx]
                if speakers is not None:
                    base = base + speakers[0][spk, idx]
                block = base[None, :] + scale * rng.standard_normal(
                    (FRAMES_PER_CHAR, patterns.shape[1])).astype(np.float32)
                frames.append(block)
            feats = np.concatenate(frames, axis=0).astype(np.float32)[None]
        stem = f"{name}{i:04d}"
        with open(feat_dir / f"{stem}.pkl", "wb") as f:
            pickle.dump(feats, f)
        dur = feats.shape[1] / FPS
        row = {"audio_filepath": str(root / f"{stem}.wav"),
               "duration": dur, "text": text}
        if spk >= 0:
            row["speaker"] = spk
        rows.append(row)
    manifest = root / f"{name}_manifest.json"
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return manifest


MEASURES = ("ref", "nonblank", "min_maxlp", "entropy")


def decode_corpus(model, state, root: Path, manifest: Path, batch_size: int):
    """Greedy-decode a feature corpus; returns (stems, refs, hyps, confs)
    where confs maps each confidence measure to per-utterance scores
    (lower = more confident).  ``confs['ref']`` is the reference's
    negative-mean-max-log-prob score (``/root/reference/train_ssl.py:
    243-251`` semantics via ssl_codec.confidence)."""
    import jax
    import jax.numpy as jnp

    from lightning_asr_tpu.decoding.greedy import greedy_decode_to_strings
    from lightning_asr_tpu.ssl_codec.confidence import confidence_scores

    TPAD = 512
    rows = [json.loads(l) for l in open(manifest)]
    feats_b, lens_b, refs, stems = [], [], [], []
    for r in rows:
        stem = Path(r["audio_filepath"]).stem
        f = pickle.load(open(root / "feats" / f"{stem}.pkl", "rb"))[0]
        T = min(f.shape[0], TPAD)
        buf = np.zeros((TPAD, f.shape[1]), np.float32)
        buf[:T] = f[:T]
        feats_b.append(buf)
        lens_b.append(T)
        refs.append(r["text"])
        stems.append(stem)
    fwd = jax.jit(lambda x, p: model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x, p, False))
    hyps = []
    confs = {m: [] for m in MEASURES}
    for i in range(0, len(feats_b), batch_size):
        chunk = feats_b[i : i + batch_size]
        pad = batch_size - len(chunk)  # static batch shape; pad rows dropped
        xb = jnp.asarray(np.stack(chunk + [chunk[0]] * pad))
        pc = jnp.asarray(np.array(lens_b[i : i + batch_size] + [TPAD] * pad,
                                  np.float32) / TPAD)
        lp, out_lens = fwd(xb, pc)
        lp_np, lens_np = np.asarray(lp, np.float32), np.asarray(out_lens)
        hyps += greedy_decode_to_strings(
            np.argmax(lp_np, -1), lens_np, LABELS, len(LABELS))[: len(chunk)]
        for m in MEASURES:
            confs[m] += confidence_scores(
                lp_np, lens_np, len(LABELS), m)[: len(chunk)].tolist()
    return stems, refs, hyps, confs


def dev_cer(model, state, root: Path, manifest: Path, batch_size: int) -> float:
    """Greedy-decode a feature corpus and return corpus CER."""
    from lightning_asr_tpu.metrics.wer import word_error_rate

    _, refs, hyps, _ = decode_corpus(model, state, root, manifest, batch_size)
    return float(word_error_rate(hyps, refs, use_cer=True))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=768,
                    help="labeled training utterances")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=16)
    # threshold calibrated on the chip (confidence = negative mean max
    # log-prob, LOWER = more confident): a converged model scores clean
    # pool median 0.12 / p90 0.155 vs patternless noise median 0.22, so
    # 0.18 keeps most clean and rejects most corrupted.  (The reference's
    # 0.01 is tuned for real wav2vec posteriors, train_ssl.py:233.)
    ap.add_argument("--threshold", type=float, default=0.18)
    # Low-label regime (VERDICT r3 #2): few labels + a LARGE clean unlabeled
    # pool — the configuration pseudo-labeling exists for
    # (/root/reference/train_ssl.py:223-260).  --pool_clean defaults to
    # utts//3 (the r2/r3 smoke shape); the low-label run passes e.g.
    # --utts 320 --pool_clean 2560 --pseudo_start_frac 0.3 so injection has
    # both coverage to add and epochs to exploit it.
    ap.add_argument("--pool_clean", type=int, default=0,
                    help="clean unlabeled pool size (0 -> utts//3)")
    ap.add_argument("--pool_corrupt", type=int, default=0,
                    help="corrupted pool size (0 -> utts//3)")
    ap.add_argument("--pool_noise_hi", type=float, default=0.0,
                    help="if > 0, the clean pool's per-utterance noise "
                         "scale is drawn from U(base_noise, pool_noise_hi) "
                         "(SNR-heterogeneous unlabeled audio; labeled/dev "
                         "stay at base_noise)")
    ap.add_argument("--base_noise", type=float, default=0.3,
                    help="per-frame feature noise scale for train/dev (and "
                         "the pool's low end).  The data-QUANTITY regime "
                         "(VERDICT r3 #2 final form) needs this high enough "
                         "(~1.2 vs pattern sigma 2.0) that a few-hundred-"
                         "utterance supervised model is variance-limited on "
                         "dev at convergence — then pseudo-labels with "
                         "RANDOM (noise-realization-driven) errors average "
                         "out across the pool and the student can converge "
                         "BELOW its teacher, unlike systematic speaker-"
                         "accent errors which self-reinforce")
    ap.add_argument("--dev_utts", type=int, default=0, help="0 -> utts//3")
    # Speaker-coverage regime: per-(speaker, char) "accent" perturbations
    # (see speaker_deltas).  Labeled train covers FEW speakers, dev covers
    # UNSEEN speakers, the unlabeled pool covers MANY more — so the
    # supervised baseline has a real generalization gap at convergence and
    # pseudo-labeling's unlabeled coverage has something structural to add
    # (the regime /root/reference/train_ssl.py's loop exists for).  0
    # speakers anywhere = the original speaker-free corpora.
    ap.add_argument("--spk_train", type=int, default=0,
                    help="labeled-train speaker count (ids [0, n))")
    ap.add_argument("--spk_dev", type=int, default=0,
                    help="dev speaker count, DISJOINT from train")
    ap.add_argument("--spk_pool", type=int, default=0,
                    help="unlabeled-pool speaker count, disjoint from both")
    ap.add_argument("--speaker_sigma", type=float, default=0.8,
                    help="per-dim sigma of the accent deltas (patterns are "
                         "sigma 2.0; 0.8 makes accents a large fraction of "
                         "inter-class distance without destroying identity)")
    # A/B fairness: injection multiplies the pseudo arm's optimizer steps
    # (more data per epoch).  --control_epochs 0 keeps the original
    # same-epoch control; the driver can instead pass a step-matched value
    # (epochs * expected_step_ratio) so the control gets AT LEAST as many
    # optimizer steps as the pseudo arm and any win is attributable to the
    # injected DATA, not to extra optimization.
    ap.add_argument("--control_epochs", type=int, default=0,
                    help="override the control arm's epoch budget "
                         "(0 = same as --epochs)")
    ap.add_argument("--schedule_gamma", type=float, default=0.0,
                    help="override the CAWR restart decay for BOTH arms "
                         "(0 = mode default: 0.02 low_label, 1.0 smoke).  "
                         "The reference's SSL recipe uses gamma=0.1 "
                         "(train_ssl.py:62-64) — restarts at 10%% max_lr "
                         "give a converged model the plasticity to absorb "
                         "newly injected data; the flat 0.02 floor was "
                         "measured to make converged-teacher injection a "
                         "no-op (self-labels at ~zero LR are a fixed "
                         "point)")
    ap.add_argument("--first_cycle_epochs", type=int, default=0,
                    help="pin the cosine schedule's first cycle to THIS "
                         "many epochs instead of the arm's total (0 = "
                         "arm total).  Used by the branched converged-"
                         "teacher A/B: both arms resume from a shared "
                         "checkpoint whose cycle ended, and must continue "
                         "at the flat gamma-scaled restart floor — "
                         "deriving the cycle from the arm's LARGER total "
                         "would instead stretch the cosine and revive the "
                         "LR mid-comparison")
    ap.add_argument("--pseudo_start_frac", type=float, default=0.75,
                    help="fraction of training after which injection starts")
    ap.add_argument("--pseudo_every", type=int, default=3)
    ap.add_argument("--measure", choices=MEASURES, default="ref",
                    help="confidence measure for the injection filter "
                         "(diagnose mode reports all of them; pick the one "
                         "whose sweep shows kept-label CER << pool CER)")
    ap.add_argument("--mode", choices=("smoke", "low_label"), default="smoke",
                    help="low_label requires injection to WIN (>=10%% "
                         "relative dev-CER gain), not just not-hurt")
    ap.add_argument("--augment", action="store_true",
                    help="train BOTH arms with the reference's features_"
                         "cutout (ssl_data_module.py:332-350) — the noisy-"
                         "student mechanism pseudo-labeling pairs with: "
                         "decode clean, train augmented")
    ap.add_argument("--skyline", action="store_true",
                    help="train ONE arm on train + clean-pool with their "
                         "TRUE labels (no injection, no filtering) and "
                         "report dev CER — the data-quantity upper bound a "
                         "perfect pseudo-labeler could reach.  Run this "
                         "before paying for the A/B: if the skyline does "
                         "not beat the control there is no win available")
    ap.add_argument("--diagnose", action="store_true",
                    help="train ONLY the control arm, then report the "
                         "confidence->correctness sweep (does a threshold "
                         "exist where kept pseudo-label CER is well below "
                         "the model's overall CER?) — the cheap prerequisite "
                         "check before paying for a double-arm run")
    ap.add_argument("--out", type=str, default="SSL_SMOKE.json")
    # Chunked-resume plumbing: the tunneled axon client leaks ~batch-nbytes
    # of host RAM per host->device transfer (see CLAUDE.md), so long runs
    # must be split over fresh processes.  The driver loop re-invokes this
    # script with --root/--resume/--chunk_epochs until each arm writes its
    # arm_<name>.json marker; the control arm then composes the final report.
    ap.add_argument("--root", type=str, default="",
                    help="persistent corpus/run dir (default: fresh mkdtemp);"
                         " reused if its manifests already exist")
    ap.add_argument("--arm", choices=("both", "pseudo", "control"),
                    default="both",
                    help="run a single arm in this process (chunked runs)")
    ap.add_argument("--resume", action="store_true",
                    help="continue the arm from its run dir's last checkpoint")
    ap.add_argument("--chunk_epochs", type=int, default=0,
                    help="stop cleanly after N epochs this process (0 = run "
                         "to completion); stops only on a validation epoch "
                         "so the resume checkpoint is exact")
    ap.add_argument("--val_every", type=int, default=0,
                    help="validation/checkpoint cadence in epochs "
                         "(0 -> epochs//2, the original smoke behavior)")
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO)  # surface pseudo-pass progress

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

    root = (Path(args.root) if args.root
            else Path(tempfile.mkdtemp(prefix="ssl_smoke_")))
    root.mkdir(parents=True, exist_ok=True)
    pool_clean = args.pool_clean or max(args.utts // 3, 8)
    pool_corrupt = args.pool_corrupt or max(args.utts // 3, 8)
    base = args.base_noise
    pool_noise = ((base, args.pool_noise_hi) if args.pool_noise_hi > 0
                  else (base, base))
    if (root / "dev_manifest.json").exists():
        # resumed run: corpora are seed-deterministic, reuse the files
        train_manifest = root / "train_manifest.json"
        clean_manifest = root / "pseudo_manifest.json"
        corrupt_manifest = root / "corrupt_manifest.json"
        dev_manifest = root / "dev_manifest.json"
    else:
        spk_train = spk_dev = spk_pool = None
        if args.spk_train > 0:
            n_spk = args.spk_train + args.spk_dev + args.spk_pool
            deltas = speaker_deltas(n_spk, args.speaker_sigma)
            spk_train = (deltas, 0, args.spk_train)
            spk_dev = (deltas, args.spk_train, args.spk_train + args.spk_dev)
            spk_pool = (deltas, args.spk_train + args.spk_dev, n_spk)
        train_manifest = make_corpus(root, args.utts, 1, "train", patterns,
                                     noise=(base, base), speakers=spk_train)
        clean_manifest = make_corpus(root, pool_clean, 2, "pseudo", patterns,
                                     noise=pool_noise, speakers=spk_pool)
        # corrupt pool must sit at the SAME amplitude as the clean pool
        # (make_corpus docstring: "patternless noise at the same scale") —
        # leaving it at the 0.3 default while base_noise is 1.2 makes the
        # corrupted utterances QUIETER than clean speech, and a trained
        # student hallucinates confident transcripts on low-amplitude
        # garbage: observed 98.8% of the whole pool kept (>=284 corrupt)
        # in the first v4 quantity run, poisoning the injected set and
        # failing the selectivity gates by construction.
        corrupt_manifest = make_corpus(root, pool_corrupt, 4, "corrupt", None,
                                       noise=pool_noise)
        dev_manifest = make_corpus(
            root, args.dev_utts or max(args.utts // 3, 16), 3, "dev", patterns,
            noise=(base, base), speakers=spk_dev)
    val_every = args.val_every or max(args.epochs // 2, 1)
    chunk = args.chunk_epochs

    def run_arm(inject: bool, train_m=None, run_name=None):
        epochs = (args.control_epochs if (not inject and args.control_epochs)
                  else args.epochs)
        dm = SSLDataModule(
            train_manifest=str(train_m or train_manifest),
            dev_manifest=str(dev_manifest),
            test_manifest=str(dev_manifest), labels=LABELS,
            train_bs=args.batch_size, dev_bs=args.batch_size,
            ssl_folder=str(root / "feats"),
            pseudo_manifest=[str(clean_manifest), str(corrupt_manifest)],
            bucket_seconds=(6.0,),
        )
        model = build_model(num_classes=len(LABELS) + 1, mask=True,
                            dtype=jnp.bfloat16, in_c=64, feature_in=512)
        steps = dm.steps_per_epoch()
        first_cycle = max((args.first_cycle_epochs or epochs) * steps, 2)
        # low_label A/B fairness: injection ~triples the injection arm's
        # steps/epoch, so its step-based cosine cycle ends early and would
        # RESTART at full max_lr right before eval.  gamma=0.02 makes every
        # restart cycle effectively flat at ~min_lr, so BOTH arms finish
        # converged at the LR floor and the A/B isolates the injected data.
        gamma = (args.schedule_gamma if args.schedule_gamma > 0
                 else (0.02 if args.mode == "low_label" else 1.0))
        schedule = cosine_annealing_warmup_restarts(
            first_cycle_steps=first_cycle, cycle_mult=1,
            max_lr=5e-3, min_lr=1e-4,
            warmup_steps=min(60, steps * 2, first_cycle - 1), gamma=gamma)
        opt = novograd(schedule, betas=(0.8, 0.5), weight_decay=1e-3)

        class ChunkedSSLTrainer(SSLTrainer):
            epochs_this_process = 0
            resume_start_epoch = 0

            def on_resume(self, state, start_epoch):
                self.resume_start_epoch = start_epoch
                super().on_resume(state, start_epoch)

            def on_train_epoch_end(self, state, epoch):
                super().on_train_epoch_end(state, epoch)
                self.epochs_this_process += 1
                if (chunk and self.epochs_this_process >= chunk
                        and (epoch + 1) % val_every == 0):
                    # fit() validates + checkpoints this epoch before
                    # honoring should_stop, so --resume picks up exactly here
                    self.should_stop = True

        trainer = ChunkedSSLTrainer(
            model, opt, dm, total_epochs=epochs,
            run_dir=root / (run_name or f"run_{inject}"),
            lr_schedule=schedule,
            check_val_every_n_epoch=val_every,
            log_every_n_steps=50, train_wer_every_n_steps=10**9,
            sample_log_every_n_batches=10**9,
            # smoke default: augmentation off for the convergence gate
            # (features_cutout mechanics are covered by tests/test_ssl.py);
            # --augment turns the reference's cutout on for BOTH arms —
            # at these ~125-200-frame utterances the 5 rects cover ~8% of
            # cells on average, and decode-clean/train-augmented is the
            # noisy-student mechanism the pseudo loop pairs with
            augment=("cutout" if args.augment else False),
            # exercise the pseudo loop well before the reference's epoch-300
            # gate, but late enough that decodes are confident, with a
            # meaningfully strict threshold (reference: 0.01)
            pseudo_start_epoch=(max(int(args.pseudo_start_frac * epochs), 2)
                                if inject else epochs + 1),
            pseudo_every_n_epochs=args.pseudo_every,
            pseudo_confidence_threshold=args.threshold,
            pseudo_confidence_measure=args.measure,
            hparams={"labels": LABELS, "feature_in": 512, "in_c": 64},
        )
        resume_from = None
        if args.resume and (root / (run_name or f"run_{inject}")
                            / "checkpoints" / "last").exists():
            resume_from = "last"
        state = trainer.fit(resume=resume_from)
        done_epochs = max(getattr(trainer, "epoch", -1) + 1,
                          trainer.resume_start_epoch)
        trainer.completed = done_epochs >= epochs
        return dm, model, state, trainer

    if args.skyline:
        # data-quantity upper bound: train on train + clean pool with TRUE
        # labels.  If this does not clearly beat the labeled-only control,
        # no pseudo-labeler can win in this corpus configuration.
        merged = root / "skyline_manifest.json"
        if not merged.exists():
            merged.write_text(open(train_manifest).read()
                              + open(clean_manifest).read())
        _, model_s, state_s, trainer_s = run_arm(
            inject=False, train_m=merged, run_name="run_skyline")
        if not trainer_s.completed:
            print(json.dumps({"arm": "skyline", "status": "chunk_done",
                              "epochs_done": getattr(trainer_s, "epoch", -1) + 1}))
            return
        cer_sky = dev_cer(model_s, state_s, root, dev_manifest, args.batch_size)
        report = {"mode": "skyline", "labeled_utts": args.utts,
                  "pool_clean": pool_clean, "base_noise": base,
                  "pool_noise": list(pool_noise), "epochs": args.epochs,
                  "dev_cer_skyline": cer_sky}
        (root / "arm_skyline.json").write_text(json.dumps(report))
        print(json.dumps(report))
        return

    if args.diagnose:
        _, model_c, state_c, trainer_d = run_arm(inject=False)
        if not trainer_d.completed:
            print(json.dumps({"arm": "diagnose", "status": "chunk_done",
                              "epochs_done": getattr(trainer_d, "epoch", -1) + 1}))
            return
        cer_control = dev_cer(model_c, state_c, root, dev_manifest,
                              args.batch_size)
        c_stems, c_refs, c_hyps, c_confs = decode_corpus(
            model_c, state_c, root, clean_manifest, args.batch_size)
        x_stems, _, _, x_confs = decode_corpus(
            model_c, state_c, root, corrupt_manifest, args.batch_size)
        from lightning_asr_tpu.metrics.wer import word_error_rate
        pool_cer = float(word_error_rate(c_hyps, c_refs, use_cer=True))
        per_utt_cer = np.array([
            float(word_error_rate([h], [r], use_cer=True))
            for h, r in zip(c_hyps, c_refs)])

        def spearman(a, b):
            def rank(v):
                order = np.argsort(v)
                rk = np.empty(len(v))
                rk[order] = np.arange(len(v))
                return rk
            ra, rb = rank(np.asarray(a)), rank(np.asarray(b))
            ra, rb = ra - ra.mean(), rb - rb.mean()
            den = float(np.sqrt((ra ** 2).sum() * (rb ** 2).sum()))
            return float((ra * rb).sum() / den) if den else 0.0

        by_measure = {}
        for m in MEASURES:
            conf = np.asarray(c_confs[m])
            sweep = []
            # quantile thresholds: keep the q% most-confident slice of the
            # pool (threshold value reported so the double-arm run can pin
            # it as an absolute number)
            for q in (5, 10, 25, 50, 75, 90):
                th = float(np.percentile(conf, q))
                kc = np.where(conf <= th)[0]
                kx = int((np.asarray(x_confs[m]) <= th).sum())
                cer_k = (float(word_error_rate(
                    [c_hyps[i] for i in kc], [c_refs[i] for i in kc],
                    use_cer=True)) if len(kc) else None)
                exact = (round(100.0 * sum(c_hyps[i] == c_refs[i] for i in kc)
                               / len(kc), 1) if len(kc) else None)
                sweep.append({
                    "keep_quantile_pct": q, "threshold": round(th, 5),
                    "kept_clean": int(len(kc)),
                    "kept_corrupted_pct": round(100.0 * kx / pool_corrupt, 1),
                    "kept_clean_label_cer": cer_k,
                    "kept_exact_pct": exact})
            by_measure[m] = {
                "spearman_conf_vs_cer": round(spearman(conf, per_utt_cer), 4),
                "sweep": sweep}
        report = {"mode": "diagnose", "labeled_utts": args.utts,
                  "speakers": ({"train": args.spk_train, "dev": args.spk_dev,
                                "pool": args.spk_pool,
                                "sigma": args.speaker_sigma}
                               if args.spk_train else None),
                  "epochs": args.epochs, "pool_noise": list(pool_noise),
                  "dev_cer_control": cer_control,
                  "pool_clean_cer_unfiltered": pool_cer,
                  "pool_clean": pool_clean, "pool_corrupted": pool_corrupt,
                  "by_measure": by_measure,
                  "note": ("injection can only win if some (measure, "
                           "threshold) keeps a meaningful fraction of the "
                           "pool at label CER well below "
                           "pool_clean_cer_unfiltered (confidence must "
                           "select CORRECT decodes, not just "
                           "pattern-vs-noise); spearman > 0 means the "
                           "measure ranks bad decodes as less confident")}
        out = Path(__file__).resolve().parents[1] / args.out
        out.write_text(json.dumps(report, indent=2) + "\n")
        print(json.dumps(report))
        return

    from lightning_asr_tpu.metrics.wer import word_error_rate

    # --- arm 1: pseudo injection enabled over the mixed clean+corrupt pool
    pseudo_marker = root / "arm_pseudo.json"
    if args.arm in ("both", "pseudo") and not pseudo_marker.exists():
        dm, model, state, trainer = run_arm(inject=True)
        if not trainer.completed:
            print(json.dumps({"arm": "pseudo", "status": "chunk_done",
                              "epochs_done": getattr(trainer, "epoch", -1) + 1}))
            return
        kept_paths = [Path(e.audio_filepath).stem for e in dm.pseudo_entries]
        kept_clean = sum(1 for s in kept_paths if s.startswith("pseudo"))
        kept_corrupt = sum(1 for s in kept_paths if s.startswith("corrupt"))
        cer_train = dev_cer(model, state, root, train_manifest, args.batch_size)
        cer_inject = dev_cer(model, state, root, dev_manifest, args.batch_size)

        # quality of the labels actually injected: kept-clean pseudo texts
        # vs the clean pool's TRUE transcripts (known — we generated them)
        true_clean = {Path(json.loads(l)["audio_filepath"]).stem:
                      json.loads(l)["text"] for l in open(clean_manifest)}
        kept_pairs = [(e.text, true_clean[Path(e.audio_filepath).stem])
                      for e in dm.pseudo_entries
                      if Path(e.audio_filepath).stem in true_clean]
        kept_clean_label_cer = (float(word_error_rate(
            [h for h, _ in kept_pairs], [r for _, r in kept_pairs],
            use_cer=True)) if kept_pairs else None)
        pseudo_marker.write_text(json.dumps({
            "kept_clean": int(kept_clean), "kept_corrupt": int(kept_corrupt),
            "kept_clean_label_cer": kept_clean_label_cer,
            "cer_train": cer_train, "cer_inject": cer_inject}))
    if args.arm == "pseudo":
        print(json.dumps({"arm": "pseudo", "status": "done"}))
        return
    arm1 = json.loads(pseudo_marker.read_text())
    kept_clean, kept_corrupt = arm1["kept_clean"], arm1["kept_corrupt"]
    kept_clean_label_cer = arm1["kept_clean_label_cer"]
    cer_train, cer_inject = arm1["cer_train"], arm1["cer_inject"]

    # --- arm 2: control, injection disabled, otherwise identical
    _, model_c, state_c, trainer_c = run_arm(inject=False)
    if not trainer_c.completed:
        print(json.dumps({"arm": "control", "status": "chunk_done",
                          "epochs_done": getattr(trainer_c, "epoch", -1) + 1}))
        return
    cer_control = dev_cer(model_c, state_c, root, dev_manifest, args.batch_size)

    # post-hoc threshold sweep: score the whole pool with the CONTROL model
    # (the model a fresh injection decision would be made by) and tabulate
    # keep-rates + kept-label quality per candidate threshold
    sweep = []
    c_stems, c_refs, c_hyps, c_confs_all = decode_corpus(
        model_c, state_c, root, clean_manifest, args.batch_size)
    x_stems, _, _, x_confs_all = decode_corpus(
        model_c, state_c, root, corrupt_manifest, args.batch_size)
    c_confs = c_confs_all[args.measure]
    x_confs = x_confs_all[args.measure]
    sweep_ths = sorted(set(
        [round(float(np.percentile(np.asarray(c_confs), q)), 5)
         for q in (10, 25, 50, 75)] + [args.threshold]))
    for th in sweep_ths:
        kc = [i for i, c in enumerate(c_confs) if c <= th]
        kx = sum(1 for c in x_confs if c <= th)
        cer_k = (float(word_error_rate([c_hyps[i] for i in kc],
                                       [c_refs[i] for i in kc], use_cer=True))
                 if kc else None)
        sweep.append({"threshold": th,
                      "kept_clean_pct": round(100.0 * len(kc) / pool_clean, 1),
                      "kept_corrupted_pct": round(100.0 * kx / pool_corrupt, 1),
                      "kept_clean_label_cer": cer_k})
    (root / "arm_control.json").write_text(json.dumps(
        {"cer_control": cer_control, "sweep": sweep}))

    report = {
        "mode": args.mode,
        "labeled_utts": args.utts, "epochs": args.epochs,
        "control_epochs": args.control_epochs or args.epochs,
        "speakers": ({"train": args.spk_train, "dev": args.spk_dev,
                      "pool": args.spk_pool, "sigma": args.speaker_sigma}
                     if args.spk_train else None),
        "augment": "cutout" if args.augment else False,
        "schedule_gamma": (args.schedule_gamma if args.schedule_gamma > 0
                           else (0.02 if args.mode == "low_label" else 1.0)),
        "confidence_threshold": args.threshold,
        "confidence_measure": args.measure,
        "pseudo_start_epoch": max(int(args.pseudo_start_frac * args.epochs), 2),
        "pseudo_every_n_epochs": args.pseudo_every,
        "pseudo_pool_clean": pool_clean,
        "pseudo_pool_corrupted": pool_corrupt,
        "pool_noise": list(pool_noise),
        "kept_clean": int(kept_clean),
        "kept_corrupted": int(kept_corrupt),
        "kept_clean_pct": round(100.0 * kept_clean / pool_clean, 1),
        "kept_corrupted_pct": round(100.0 * kept_corrupt / pool_corrupt, 1),
        "kept_clean_label_cer": kept_clean_label_cer,
        "train_cer": cer_train,
        "dev_cer_with_pseudo": cer_inject,
        "dev_cer_control": cer_control,
        "pseudo_delta_cer": cer_inject - cer_control,
        "pseudo_rel_gain_pct": (round(100.0 * (cer_control - cer_inject)
                                      / cer_control, 1)
                                if cer_control > 0 else None),
        "threshold_sweep_on_control_model": sweep,
        "device": str(jax.devices()[0]),
        "note": ("train_cer gates learnability; dev CER measures "
                 "generalization on the synthetic toy corpus — the control "
                 "delta is the meaningful dev-side signal.  low_label mode "
                 "is the regime the technique exists for: few labels, large "
                 "clean pool, injection early enough to be exploited."),
    }
    # Gates: learnability (train CER), selectivity (clean kept, corrupted
    # mostly rejected — the keep-ratio gate is primary; the absolute cap at
    # 30% bounds confidently-wrong leakage), and the injection gate:
    # "don't hurt" for the smoke, ">=10% relative dev-CER win" in low-label
    # mode (VERDICT r3 #2).
    gates = {
        "learnability": cer_train < 0.08,
        "clean_mostly_kept": kept_clean >= pool_clean // 2,
        "selectivity_ratio": kept_clean * pool_corrupt
                             >= 2 * max(kept_corrupt, 1) * pool_clean,
        "corrupted_mostly_rejected": kept_corrupt <= int(0.3 * pool_corrupt),
    }
    if args.mode == "low_label":
        gates["injection_wins"] = (cer_inject < cer_control
                                   and (cer_control - cer_inject)
                                   >= 0.10 * cer_control)
    else:
        gates["injection_not_harmful"] = cer_inject <= cer_control + 0.02
    report["gates"] = gates
    report["ok"] = all(gates.values())
    out = Path(__file__).resolve().parents[1] / args.out
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    print("SSL SMOKE OK" if report["ok"] else "SSL SMOKE WEAK", file=sys.stderr)
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
