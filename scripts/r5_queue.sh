#!/bin/bash
# Round-5 session-1 TPU queue (VERDICT r5 items #1, #2, #7).
#
#   A. wait for the r5mini retrain (the converged parity-gate ckpt)
#   B. TPU bench arms for the gather-wall levers, banked as they print:
#        armBF    eval_sdf_bake=full   (probe + secondary from the bake)
#        armBP    eval_sdf_bake=probe  (probe only)
#        armL8    prefilter_levels=8   (the carried no-bake lever)
#        armBF192 bake at 192^3 cells  (resolution sensitivity)
#   C. hand off to the 9k 800^2 longrun watchdog (ramped curvature)
#
# Deadline guard: nothing new starts after DEADLINE_EPOCH so the chip is
# free for the driver's end-of-round bench.  PID-file based; never kills
# by pattern.
set -u
cd /root/repo
LOG=/tmp/r5queue.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-0}
: > "$LOG"
say() { echo "=== $* $(date +%F-%H:%M) ===" >> "$LOG"; }
guard() {
  if [ "$DEADLINE_EPOCH" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; then
    say "DEADLINE passed; stopping queue before: $*"
    python scripts/bank_metrics.py "$LOG" r5bench || true
    exit 0
  fi
}

say "queue start; waiting for r5mini"
while ! grep -q "WATCHDOG: run completed" /tmp/r5mini.log 2>/dev/null; do
  sleep 60
  # if the mini run somehow died without its watchdog, don't wait forever
  if ! kill -0 "$(cat /tmp/r5mini.pid 2>/dev/null)" 2>/dev/null \
     && ! grep -q "WATCHDOG" /tmp/r5mini.log 2>/dev/null; then
    say "r5mini watchdog gone without completion; proceeding"
    break
  fi
done
say "r5mini done; starting bench arms"

for arm in \
  "armDEF -" \
  "armBF model.eval_sdf_bake=full" \
  "armBP model.eval_sdf_bake=probe" \
  "armL8 model.prefilter_levels=8" \
  "armBF192 model.eval_sdf_bake=full model.eval_sdf_bake_cells=192"; do
  guard "bench $arm"
  set -- $arm; tag=$1; shift
  ov=()
  [ "${1:-}" != "-" ] && ov=("$@")
  say "bench $tag: ${ov[*]:-defaults}"
  RISE_BENCH_FAST=1 timeout 2400 python bench.py ${ov[@]+"${ov[@]}"} \
    >> "$LOG" 2>&1
  python scripts/bank_metrics.py "$LOG" r5bench || true
done

# seed-7 NaN provoke re-run (VERDICT r4 weak #2: the r4 closure's newest
# leg was never banked — the r4 queue piped it through `tail` and the
# output died with /tmp).  Full output goes straight to the banked log.
guard "seed-7 provoke"
say "NaN provoke seed 7 (re-bank of the scatter-NaN closure leg)"
{ echo "=== provoke seed 7 rerun $(date +%F-%H:%M) ==="
  timeout 3000 python scripts/nan_repro.py provoke --steps 700 \
    --seed 7 --out /tmp/nanrepro 2>&1 | grep -vE "^step |^WARNING"
  echo "=== provoke seed 7 rerun exit=$? $(date +%F-%H:%M) ==="
} >> /tmp/r5nan.log
python scripts/bank_metrics.py /tmp/r5nan.log r5nan --raw || true

guard "longrun launch"
say "handing off to longrun watchdog"
setsid nohup bash scripts/longrun_watchdog.sh /tmp/longrun.log 9000 \
  < /dev/null > /tmp/longrun_watchdog.log 2>&1 &
echo $! > /tmp/longrun_watchdog.pid
say "longrun watchdog launched"
python scripts/bank_metrics.py "$LOG" r5bench || true
