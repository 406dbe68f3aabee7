#!/bin/bash
# Chunked driver for the SSL data-QUANTITY-regime A/B (VERDICT r3 #2, v4).
#
# Regime (established by the diagnose + skyline arms at this exact corpus
# config, /tmp/SSLV4_CAL_n12.json + arm_skyline.json):
#   * base_noise 1.2 everywhere: the 320-label control converges to dev
#     CER 0.339, and its pseudo-labels on the 2560-utt clean pool carry
#     ~0.339 label CER (teacher-level noise; no confidence measure ranks
#     correctness inside the clean pool).
#   * skyline (same pool with TRUE labels) reaches dev CER 0.000 — the
#     0.339 -> 0 gap is pure data QUANTITY, the regime the reference's
#     pseudo-labeling loop (/root/reference/train_ssl.py:223-260) exists
#     for: few labels, a large unlabeled pool, per-cycle re-decode.
#
# A/B design: both arms share one cosine anneal measured in STEPS
# (first_cycle_epochs 480 x 20 steps/epoch = 9,600 steps, 5e-3 -> 1e-4,
# gamma 0.1 restarts = the reference's SSL plasticity knob), so per-step
# LR is identical.  The pseudo arm runs 80 data-epochs with injection
# from epoch 24 (refresh every 3 epochs -> the label set improves as the
# student improves); the control runs 480 epochs of the 320 labels =
# 9,600 steps, matching the pseudo arm's expected total step count.
#
# Chunked per CLAUDE.md: the tunneled axon client leaks ~batch-nbytes of
# host RAM per host->device transfer, so every ~24 data-epochs get a
# fresh process; checkpoints + arm_*.json markers carry state across.
#
# Usage: setsid nohup bash scripts/ssl_quantity_driver.sh &> /tmp/sslv4_ab.log &
set -u
cd "$(dirname "$0")/.."
ROOT=${ROOT:-/tmp/sslv4ab_n12}
ARGS=(--mode low_label --utts 320 --pool_clean 2560 --pool_corrupt 320
      --base_noise 1.2 --epochs 80 --augment
      --pseudo_start_frac 0.3 --pseudo_every 3
      --measure ref --threshold 0.19
      --control_epochs 480 --first_cycle_epochs 480 --schedule_gamma 0.1
      --val_every 8 --root "$ROOT" --resume --out SSL_SMOKE.json)

fails=0
for i in $(seq 1 16); do
  [ -f "$ROOT/arm_pseudo.json" ] && break
  echo "=== pseudo arm chunk $i ==="
  # transient tunnel/remote-compile failures (e.g. "response body closed
  # before all bytes were read") are retried: --resume makes a relaunch
  # continue from the last checkpoint, and the chunk budget bounds retries.
  # Three CONSECUTIVE failures = deterministic breakage (bad flag, code
  # bug, persistent OOM) — fail fast instead of burning the chunk budget
  # (ADVICE r4).
  if python scripts/ssl_smoke.py "${ARGS[@]}" --arm pseudo --chunk_epochs 24; then
    fails=0
  else
    rc=$?
    fails=$((fails+1))
    echo "pseudo arm chunk failed (rc=$rc, consecutive=$fails)"
    [ $fails -ge 3 ] && { echo "3 consecutive failures: not transient, aborting"; exit 1; }
    sleep 60
  fi
done
[ -f "$ROOT/arm_pseudo.json" ] || { echo "pseudo arm exhausted"; exit 1; }
fails=0
for i in $(seq 1 8); do
  [ -f "$ROOT/arm_control.json" ] && break
  echo "=== control arm chunk $i ==="
  python scripts/ssl_smoke.py "${ARGS[@]}" --arm control --chunk_epochs 96
  rc=$?
  # the final control invocation composes the report and exits 0/1 on the
  # gate; distinguish "gate failed" (report written) from a crash
  if [ -f "$ROOT/arm_control.json" ]; then
    echo "control arm + report done (rc=$rc)"; exit 0
  fi
  if [ $rc -ne 0 ]; then
    fails=$((fails+1))
    echo "control arm chunk failed (rc=$rc, consecutive=$fails)"
    [ $fails -ge 3 ] && { echo "3 consecutive failures: not transient, aborting"; exit 1; }
    sleep 60
  else
    fails=0
  fi
done
echo "driver exhausted its chunk budget"; exit 1
