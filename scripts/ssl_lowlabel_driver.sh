#!/bin/bash
# Chunked driver for the low-label SSL A/B (VERDICT r3 #2).
#
# The tunneled axon client leaks ~batch-nbytes of host RAM per
# host->device transfer (CLAUDE.md), so the 60-epoch double-arm run OOMs
# the 125 GB host if run monolithically (observed: 94 GB RSS by arm-1
# epoch 34).  This loop re-invokes scripts/ssl_smoke.py with
# --resume --chunk_epochs so every ~10 epochs get a fresh process; the
# checkpoint + arm_<name>.json markers in $ROOT carry the state across.
#
# Usage: setsid nohup bash scripts/ssl_lowlabel_driver.sh &> /tmp/ssl_lowlabel.log &
set -u
cd "$(dirname "$0")/.."
ROOT=${ROOT:-/tmp/ssl_smoke_wgephbzz}
ARGS=(--mode low_label --utts 1280 --epochs 60
      --pool_clean 5120 --pool_corrupt 640 --pool_noise_hi 0.9
      --measure entropy --threshold 0.13
      --pseudo_start_frac 0.25 --pseudo_every 4 --augment
      --root "$ROOT" --resume --val_every 4 --out SSL_SMOKE.json)

for i in $(seq 1 12); do
  [ -f "$ROOT/arm_pseudo.json" ] && break
  echo "=== pseudo arm chunk $i ==="
  python scripts/ssl_smoke.py "${ARGS[@]}" --arm pseudo --chunk_epochs 8 \
    || { echo "pseudo arm chunk failed (rc=$?)"; exit 1; }
done
for i in $(seq 1 6); do
  [ -f "$ROOT/arm_control.json" ] && break
  echo "=== control arm chunk $i ==="
  python scripts/ssl_smoke.py "${ARGS[@]}" --arm control --chunk_epochs 28
  rc=$?
  # the final control invocation composes the report and exits 0/1 on the
  # gate; distinguish "gate failed" (report written) from a crash
  if [ -f "$ROOT/arm_control.json" ]; then
    echo "control arm + report done (rc=$rc)"; exit 0
  fi
  [ $rc -ne 0 ] && { echo "control arm chunk failed (rc=$rc)"; exit 1; }
done
echo "driver exhausted its chunk budget"; exit 1
