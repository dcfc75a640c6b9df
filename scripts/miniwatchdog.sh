#!/bin/bash
# Self-healing driver for scripts/train_synthetic.py runs, with automatic
# metric banking.
#
# Hardens against the three observed failure modes on this host:
#   1. session death killing child processes (launch under `setsid` so the
#      run escapes the launcher's process group);
#   2. the axon TPU tunnel hanging mid-run (stall detection on log mtime,
#      kill + bit-exact --resume from the newest checkpoint);
#   3. environment resets wiping exp/ and /tmp (scripts/bank_metrics.py
#      commits every val/test metric line into RESULTS.md on each tick).
#
# Usage: scripts/miniwatchdog.sh <logfile> <outdir> <tag> <train args...>
#   e.g. scripts/miniwatchdog.sh /tmp/r4mini.log exp/r4mini r4mini \
#          --steps 1200 --res 96 --kick 300 --bf16 --test --export \
#          --val-every 300 --save-every 300
# (--out and --resume are added by the watchdog; don't pass them.)
set -u
LOG=$1
OUT=$2
TAG=$3
shift 3
STALL_MIN=${STALL_MIN:-25}
cd /root/repo

launch() {
  local resume_arg=()
  if [ -f "$OUT/ckpt/latest.ckpt.npz" ]; then
    resume_arg=(--resume "$OUT/ckpt/latest.ckpt.npz")
    echo "WATCHDOG: resuming from $OUT/ckpt/latest.ckpt.npz" >> "$LOG"
  else
    echo "WATCHDOG: fresh start" >> "$LOG"
  fi
  setsid nohup python scripts/train_synthetic.py --out "$OUT" \
    "${resume_arg[@]}" "$@" < /dev/null >> "$LOG" 2>&1 &
  echo $! > "/tmp/${TAG}.pid"
  echo "WATCHDOG: launched pid $(cat /tmp/${TAG}.pid)" >> "$LOG"
}

touch "$LOG"
launch "$@"
while true; do
  sleep 120
  python scripts/bank_metrics.py "$LOG" "$TAG" || true
  pid=$(cat "/tmp/${TAG}.pid")
  if ! kill -0 "$pid" 2>/dev/null; then
    if grep -qE "^(test:|test protocol time|FINAL)" "$LOG"; then
      echo "WATCHDOG: run completed" >> "$LOG"
      python scripts/bank_metrics.py "$LOG" "$TAG" || true
      exit 0
    fi
    echo "WATCHDOG: process died before completion; relaunching" >> "$LOG"
    launch "$@"
    continue
  fi
  now=$(date +%s)
  mtime=$(stat -c %Y "$LOG")
  if [ $((now - mtime)) -gt $((STALL_MIN * 60)) ]; then
    echo "WATCHDOG: stall ($(((now - mtime) / 60)) min silent); killing $pid" >> "$LOG"
    kill "$pid" 2>/dev/null
    sleep 10
    kill -9 "$pid" 2>/dev/null
    launch "$@"
  fi
done
