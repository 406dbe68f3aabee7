#!/bin/bash
# v5: CONVERGED-teacher injection in the data-QUANTITY regime — the
# decisive SSL A/B (VERDICT r4 #2 follow-through).
#
# What v4 established (SSL_SMOKE.json, both arms at their schedule floors):
#   * EARLY injection (epoch 24, teacher at ~0.40 CER) self-poisons: the
#     pseudo arm locked at dev CER 0.374 while the step-matched control
#     reached 0.187 — a -100% rel refutation of weak-teacher injection,
#     echoing the reference's own epoch>=300 gate
#     (/root/reference/train_ssl.py:224-227).
#   * The threshold sweep ON THE CONVERGED CONTROL shows keep-75% of the
#     clean pool at 0% corrupt with kept-label CER 0.179 — BELOW the
#     control's own dev error (0.187).  That is the structural
#     precondition v3's analysis demanded: pool labels better than the
#     control's achievable error.
#
# v5 design: BOTH arms branch from the SAME v4-control epoch-480
# checkpoint at its cycle boundary (step 9600), where the shared
# step-indexed CAWR restarts at gamma*max_lr = 5e-4 (the reference's SSL
# plasticity, train_ssl.py:62-64).  The pseudo arm re-decodes the pool
# with the CONVERGED teacher, keeps the top-75% by the reference
# confidence measure (threshold 0.06, calibrated by the v4 sweep), and
# trains on ~2240 utts/epoch; the control continues on its 320 labels,
# step-matched (480 more epochs x 20 steps == 69 pseudo epochs x ~140).
#
# Prep (prepare_ssl_v5.py): regenerate the corpus in $ROOT (clean splits
# are seed-identical to v4; the corrupt pool is regenerated with the
# ADVICE-r4 amplitude fix) and seed both run dirs with the v4 control
# checkpoint.
#
# Usage: setsid nohup bash scripts/ssl_converged_driver.sh &> /tmp/sslv5_ab.log &
set -u
cd "$(dirname "$0")/.."
ROOT=${ROOT:-/tmp/sslv5ab}
V4ROOT=${V4ROOT:-/tmp/sslv4ab_n12b}

python scripts/prepare_ssl_v5.py --root "$ROOT" --v4_root "$V4ROOT" \
  || { echo "prep failed"; exit 1; }

ARGS=(--mode low_label --utts 320 --pool_clean 2560 --pool_corrupt 320
      --base_noise 1.2 --epochs 549 --augment
      --pseudo_start_frac 0.874 --pseudo_every 3
      --measure ref --threshold 0.06
      --control_epochs 960 --first_cycle_epochs 480 --schedule_gamma 0.1
      --val_every 8 --root "$ROOT" --resume --out SSL_SMOKE_V5.json)

fails=0
for i in $(seq 1 10); do
  [ -f "$ROOT/arm_pseudo.json" ] && break
  echo "=== pseudo arm chunk $i ==="
  if python scripts/ssl_smoke.py "${ARGS[@]}" --arm pseudo --chunk_epochs 16; then
    fails=0
  else
    rc=$?
    fails=$((fails+1))
    echo "pseudo arm chunk failed (rc=$rc, consecutive=$fails)"
    [ $fails -ge 3 ] && { echo "3 consecutive failures: aborting"; exit 1; }
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
  if [ -f "$ROOT/arm_control.json" ]; then
    echo "control arm + report done (rc=$rc)"; exit 0
  fi
  if [ $rc -ne 0 ]; then
    fails=$((fails+1))
    echo "control arm chunk failed (rc=$rc, consecutive=$fails)"
    [ $fails -ge 3 ] && { echo "3 consecutive failures: aborting"; exit 1; }
    sleep 60
  else
    fails=0
  fi
done
echo "driver exhausted its chunk budget"; exit 1
