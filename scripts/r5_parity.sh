#!/bin/bash
# CPU parity gate for the round-5 eval levers (bake / prefilter_levels /
# stride8) on the freshly retrained converged mini checkpoint (r5mini).
# Runs entirely on CPU while the TPU is busy; banks every arm's PSNR
# line into RESULTS.md as it prints (reset-mortality lesson, r3/r4).
set -u
cd /root/repo
LOG=/tmp/r5parity.log
: > "$LOG"

echo "=== r5 parity gate: waiting for r5mini ckpt $(date +%F-%H:%M) ===" >> "$LOG"
while ! grep -q "WATCHDOG: run completed" /tmp/r5mini.log 2>/dev/null; do
  sleep 60
done
CFG=exp/r5mini/parsed.yaml
CKPT=$(ls -t exp/r5mini/ckpt/*.ckpt.npz 2>/dev/null | head -1)
if [ -z "${CKPT:-}" ]; then
  echo "no r5mini checkpoint found" >> "$LOG"
  python scripts/bank_metrics.py "$LOG" r5parity || true
  exit 1
fi
echo "=== parity on $CKPT (4 views, CPU) $(date +%F-%H:%M) ===" >> "$LOG"
JAX_PLATFORMS=cpu bash scripts/parity_validate.sh "$CFG" "$CKPT" 4 \
  >> "$LOG" 2>&1 &
PV=$!
echo $PV > /tmp/r5parity.pid
while kill -0 "$PV" 2>/dev/null; do
  sleep 120
  python scripts/bank_metrics.py "$LOG" r5parity || true
done
python scripts/bank_metrics.py "$LOG" r5parity || true
echo "=== parity gate done $(date +%F-%H:%M) ===" >> "$LOG"
python scripts/bank_metrics.py "$LOG" r5parity || true
