#!/bin/bash
# Round-5 session-2 tail (VERDICT r4 #4): quick concave ckpt (600 steps,
# ~23 dB phys — enough surface for bounce geometry) then the third-bounce
# diagnostic against the dataset's analytic GT.  Deadline-guarded so the
# chip is free for the driver's end-of-round bench; everything banked to
# git the moment it prints (environment resets wipe /tmp and exp/).
set -u
cd /root/repo
LOG=/tmp/r5conc.log
DLOG=/tmp/r5diag3b.log
DEADLINE=${DEADLINE:-1787275200}
left() { echo $(( DEADLINE - $(date +%s) )); }

echo "=== r5conc train start $(date +%F-%H:%M) (left $(left)s) ===" >> "$LOG"
T=$(( $(left) - 600 ))   # reserve 10 min for the diagnostic
if [ "$T" -lt 300 ]; then
  echo "no time for train (left $(left)s)" >> "$LOG"
else
  timeout "$T" python scripts/train_synthetic.py --steps 600 --res 96 \
    --kick 300 --bf16 --val-every 600 --save-every 100 --out exp/r5conc \
    --set dataset.name=synthetic-concave >> "$LOG" 2>&1
  echo "train exit=$? $(date +%F-%H:%M)" >> "$LOG"
fi
python scripts/bank_metrics.py "$LOG" r5conc --raw || true

CKPT=$(ls -t exp/r5conc/ckpt/step_*.ckpt.npz 2>/dev/null | head -1)
if [ -n "${CKPT:-}" ] && [ "$(left)" -gt 120 ]; then
  echo "=== diag third bounce on $CKPT $(date +%F-%H:%M) ===" >> "$DLOG"
  timeout $(( $(left) - 60 )) python scripts/diag_third_bounce.py \
    exp/r5conc/parsed.yaml "$CKPT" 4096 0 >> "$DLOG" 2>&1
  echo "diag exit=$? $(date +%F-%H:%M)" >> "$DLOG"
  python scripts/bank_metrics.py "$DLOG" r5diag3b --raw || true
fi
echo "=== r5conc tail done $(date +%F-%H:%M) (left $(left)s) ===" >> "$LOG"
python scripts/bank_metrics.py "$LOG" r5conc --raw || true
