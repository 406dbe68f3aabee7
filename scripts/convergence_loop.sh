#!/bin/bash
# Chunked-resume driver for the long CAWR convergence run (VERDICT r2 #4).
#
# The tunneled axon client retains one host copy per host->device transfer
# (see CLAUDE.md), so a monolithic 110-epoch run at 20k-utt scale OOMs the
# host around epoch 40.  This loop runs scripts/convergence_run.py in
# ~16-epoch chunks: each chunk stops cleanly on a validated+checkpointed
# epoch boundary, the process exit resets host RSS, and --resume restores
# optimizer/schedule state (global_step included, so the CAWR phase is
# exact) plus the prior curve from CONVERGENCE.json.
#
# Corpus + checkpoints live under the repo (.convruns/, gitignored) so a VM
# restart doesn't lose them the way /tmp does.
#
# Launch detached (survives session rotation):
#   setsid nohup bash scripts/convergence_loop.sh & echo $! > /tmp/convloop.pid
set -u
cd "$(dirname "$0")/.."
CORPUS=${CORPUS:-.convruns/corpus20k}
TAG=${TAG:-cawr_960h_20k}
LOG=${LOG:-.convruns/${TAG}.chunklog}
mkdir -p "$(dirname "$LOG")"
echo "loop: start $(date -u +%FT%TZ)" >> "$LOG"
for i in $(seq 1 40); do
  python scripts/convergence_run.py --utts 20000 --epochs 100 \
    --extra_epochs 10 --tag "$TAG" --corpus "$CORPUS" \
    --resume --chunk_epochs 16 >> "$LOG" 2>&1
  rc=$?
  if tail -n 5 "$LOG" | grep -q '"completed": true'; then
    echo "loop: completed after chunk $i $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  echo "loop: chunk $i exited rc=$rc; resuming $(date -u +%FT%TZ)" >> "$LOG"
  sleep 10
done
echo "loop: exhausted chunk budget without completion" >> "$LOG"
exit 1
