#!/bin/bash
# Self-healing driver for the long converged run (BASELINE.md protocol).
#
# The axon TPU tunnel intermittently hangs mid-run (observed r3: a
# training process stopped making progress at ~step 5300 with no error;
# only a kill+resume recovered it).  Checkpoint/resume is bit-exact
# (tests/test_resume.py), so the recovery is lossless: this script
# launches the run, watches the log for fresh "step N" lines, and on a
# stall (no new log bytes for STALL_MIN minutes — generous because the
# initial remote compile is ~18 min and level-opening recompiles are
# minutes each) kills the process and relaunches with
# --resume <newest latest.ckpt.npz>.
#
# The compressed schedule (80k -> 9k) spends 8x less wall-clock than the
# reference in the sharp high-inv_s regime, where the r4long run rippled
# (val@4500 regressed 30.23 -> 26.83; BASELINE.md "ripple regression").
# The rescue (lambda_curvature 1 -> 5 from step 5001) recovered +4.9 dB
# in 250 steps, so the launch now ramps the curvature weight
# [2250, 1.0, 5.0, 5000]: reference-parity 1.0 through the geometry
# warm-up, rising to 5 as inv_s enters the knife-edge regime.
#
# Usage: scripts/longrun_watchdog.sh <logfile> [max_steps]
set -u
LOG=${1:-/tmp/longrun.log}
MAX_STEPS=${2:-9000}
STALL_MIN=${STALL_MIN:-30}
EXP_GLOB="exp/split-mixed-occ-tensoir-longrun/*/ckpt/latest.ckpt.npz"
cd /root/repo

launch() {
  local resume_arg=()
  # newest checkpoint across all trials of this experiment, if any
  local ckpt
  ckpt=$(ls -t $EXP_GLOB 2>/dev/null | head -1 || true)
  if [ -n "${ckpt:-}" ]; then
    resume_arg=(--resume "$ckpt")
    echo "WATCHDOG: resuming from $ckpt" >> "$LOG"
  else
    echo "WATCHDOG: fresh start" >> "$LOG"
  fi
  nohup python launch.py --config configs/split-mixed-occ-tensoir.yaml \
    --train \
    dataset.name=synthetic-sphere dataset.scene=longrun \
    dataset.n_images=32 'dataset.relight_list=[warm]' \
    trainer.max_steps="$MAX_STEPS" trainer.val_check_interval=1125 \
    trainer.save_every_n_steps=250 trainer.log_every_n_steps=25 \
    model.split_sum_kick_in_step=1125 model.cos_anneal_end=1125 \
    model.geometry.xyz_encoding_config.start_step=675 \
    model.geometry.xyz_encoding_config.update_steps=56 \
    'system.loss.lambda_curvature=[2250,1.0,5.0,5000]' \
    tag=r5long "${resume_arg[@]}" >> "$LOG" 2>&1 &
  echo $! > /tmp/longrun.pid
  echo "WATCHDOG: launched pid $(cat /tmp/longrun.pid)" >> "$LOG"
}

: > "$LOG"
launch
while true; do
  sleep 120
  # exp/ is reset-mortal: commit every metric line the moment it prints
  python scripts/bank_metrics.py "$LOG" r5long || true
  pid=$(cat /tmp/longrun.pid)
  if ! kill -0 "$pid" 2>/dev/null; then
    # process exited: finished or crashed
    if grep -q "WATCHDOG_DONE_SENTINEL_NEVER_MATCHES" "$LOG"; then :; fi
    if tail -50 "$LOG" | grep -qE "^test[:/]"; then
      echo "WATCHDOG: run completed (test metrics present)" >> "$LOG"
      python scripts/bank_metrics.py "$LOG" r5long || true
      exit 0
    fi
    # completed max_steps? final save happens then test() runs; if the
    # last logged step is >= MAX_STEPS-1 treat as done anyway
    last=$(grep -oE '^step [0-9]+' "$LOG" | tail -1 | cut -d' ' -f2)
    if [ -n "${last:-}" ] && [ "$last" -ge $((MAX_STEPS - 1)) ]; then
      echo "WATCHDOG: reached final step $last; exiting" >> "$LOG"
      python scripts/bank_metrics.py "$LOG" r5long || true
      exit 0
    fi
    echo "WATCHDOG: process died (last step ${last:-none}); relaunching" >> "$LOG"
    launch
    continue
  fi
  # stall detection: log file untouched for STALL_MIN minutes
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
