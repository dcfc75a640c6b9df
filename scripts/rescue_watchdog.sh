#!/bin/bash
# Ripple-rescue variant of longrun_watchdog.sh (RESULTS.md r4ripple):
# resumes the r4long experiment from its newest checkpoint with two
# targeted stabilizers for the high-inv_s glossy instability —
#   * variance lr -> 0: inv_s is frozen where it stands (~1000; sharp
#     enough — the ripples grew as inv_s crossed ~800 on the compressed
#     schedule, i.e. with 8x less wall-clock in the sharp regime than
#     the reference's 80k steps)
#   * lambda_curvature x5: |SDF Laplacian| on train samples directly
#     penalizes the concentric surface wrinkles
# Everything else (schedule, data, seed stream, tag=r4long exp dir) is
# unchanged, so vals/test land in the same banked series with an honest
# "rescued at step ~N" caveat.
#
# Usage: scripts/rescue_watchdog.sh <logfile> [max_steps]
set -u
LOG=${1:-/tmp/longrun.log}
MAX_STEPS=${2:-9000}
STALL_MIN=${STALL_MIN:-30}
EXP_GLOB="exp/split-mixed-occ-tensoir-longrun/*/ckpt/latest.ckpt.npz"
cd /root/repo

launch() {
  local resume_arg=()
  local ckpt
  ckpt=$(ls -t $EXP_GLOB 2>/dev/null | head -1 || true)
  if [ -n "${ckpt:-}" ]; then
    resume_arg=(--resume "$ckpt")
    echo "WATCHDOG: resuming from $ckpt (RESCUE: curv x5, inv_s frozen)" >> "$LOG"
  else
    echo "WATCHDOG: fresh start (RESCUE overrides active)" >> "$LOG"
  fi
  nohup python launch.py --config configs/split-mixed-occ-tensoir.yaml \
    --train \
    dataset.name=synthetic-sphere dataset.scene=longrun \
    dataset.n_images=32 'dataset.relight_list=[warm]' \
    trainer.max_steps="$MAX_STEPS" trainer.val_check_interval=375 \
    trainer.save_every_n_steps=250 trainer.log_every_n_steps=25 \
    model.split_sum_kick_in_step=1125 model.cos_anneal_end=1125 \
    model.geometry.xyz_encoding_config.start_step=675 \
    model.geometry.xyz_encoding_config.update_steps=56 \
    system.loss.lambda_curvature=5.0 \
    system.optimizer.params.variance.lr=0.0 \
    tag=r4long "${resume_arg[@]}" >> "$LOG" 2>&1 &
  echo $! > /tmp/longrun.pid
  echo "WATCHDOG: launched pid $(cat /tmp/longrun.pid)" >> "$LOG"
}

launch
while true; do
  sleep 120
  python scripts/bank_metrics.py "$LOG" r4long || true
  pid=$(cat /tmp/longrun.pid)
  if ! kill -0 "$pid" 2>/dev/null; then
    if tail -50 "$LOG" | grep -qE "^test[:/]"; then
      echo "WATCHDOG: run completed (test metrics present)" >> "$LOG"
      python scripts/bank_metrics.py "$LOG" r4long || true
      exit 0
    fi
    last=$(grep -oE '^step [0-9]+' "$LOG" | tail -1 | cut -d' ' -f2)
    if [ -n "${last:-}" ] && [ "$last" -ge $((MAX_STEPS - 1)) ]; then
      echo "WATCHDOG: reached final step $last; exiting" >> "$LOG"
      python scripts/bank_metrics.py "$LOG" r4long || true
      exit 0
    fi
    echo "WATCHDOG: process died (last step ${last:-none}); relaunching" >> "$LOG"
    launch
    continue
  fi
  now=$(date +%s)
  mtime=$(stat -c %Y "$LOG")
  if [ $((now - mtime)) -gt $((STALL_MIN * 60)) ]; then
    echo "WATCHDOG: stall ($(((now - mtime) / 60)) min silent); killing $pid" >> "$LOG"
    kill "$pid" 2>/dev/null
    sleep 10
    kill -9 "$pid" 2>/dev/null
    launch
  fi
done
