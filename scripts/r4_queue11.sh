#!/bin/bash
# Round-4 queue v11 (session 11): replaces queue7's tail + queue9.
# The control train arm turned out ~2.5x slower than budgeted (0.18
# steps/s), so the remaining TPU time is re-ordered by value:
#   1. (wait for the control arm's miniwatchdog to exit — it banks and
#      judges the already-banked finek3 arm);
#   2. armGP2 / armGP2z pipeline-depth bench arms (headline default
#      decision — the driver benches DEFAULTS at round end) + armGP2L8,
#      the prefilter_levels=8 SPEED data point (probe = ~55% of gather
#      rows; quality-gated separately, round-5 lever sizing);
#   3. NaN provoke seed 7 (+ bounded minimize on fault) — closure
#      evidence for VERDICT r3 #3;
#   4. curv25 train A/B arm (skipped unless >1h to deadline).
# A hard deadline frees the chip for the driver's end-of-round bench.
#
# Usage: setsid nohup scripts/r4_queue11.sh <watch_pid> <deadline_epoch> \
#          </dev/null >/tmp/r4queue11.log 2>&1 &
set -u
cd /root/repo
WATCH=${1:?miniwatchdog pid required}
DEADLINE=${2:?deadline epoch required}
bank() { python scripts/bank_metrics.py "$1" "$2" || true; }
say() { echo "QUEUE11[$(date +%H:%M:%S)]: $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

say "waiting for control-arm miniwatchdog (pid $WATCH)"
while kill -0 "$WATCH" 2>/dev/null; do
  if [ "$(left)" -le 0 ]; then
    say "deadline hit while waiting; control arm still owns the chip"
    exit 0
  fi
  sleep 30
done
say "control arm drained; $(left)s to deadline"

run_bench() {
  tag=$1; shift
  if [ "$(left)" -lt 1500 ]; then say "skip $tag: $(left)s left"; return 1; fi
  t=$(left); [ "$t" -gt 1800 ] && t=1800
  { echo "=== bench $tag ($*) $(date +%F-%H:%M) ==="
    RISE_BENCH_FAST=1 timeout "$t" python bench.py "$@" 2>&1
  } >> /tmp/r4bench.log
  bank /tmp/r4bench.log r4bench
  say "$tag done"
}

run_bench armGP2 model.eval_pipeline_depth=2
run_bench armGP2z model.eval_pipeline_depth=2 model.eval_band_reserve=32768
run_bench armGP2L8 model.eval_pipeline_depth=2 model.prefilter_levels=8

if [ "$(left)" -gt 1200 ]; then
  t=$(( $(left) - 300 )); [ "$t" -gt 3000 ] && t=3000
  say "NaN provoke seed 7 (timeout ${t}s)"
  { echo "=== provoke seed 7 $(date +%F-%H:%M) ==="
    timeout "$t" python scripts/nan_repro.py provoke --steps 700 \
      --seed 7 --out /tmp/nanrepro 2>&1 | tail -12; } >> /tmp/r4nan.log
  bank /tmp/r4nan.log r4nan
  if [ -f /tmp/nanrepro/fault.npz ] && [ "$(left)" -gt 900 ]; then
    say "fault reproduced; bounded minimize"
    { echo "=== minimize $(date +%F-%H:%M) ==="
      timeout $(( $(left) - 300 )) python scripts/nan_repro.py minimize \
        --dump /tmp/nanrepro/fault.npz 2>&1 | tail -80; } >> /tmp/r4nan.log
    bank /tmp/r4nan.log r4nan
  fi
else
  say "skip NaN provoke: $(left)s left"
fi

if [ "$(left)" -gt 4200 ]; then
  say "A/B arm curv25"
  bash scripts/miniwatchdog.sh /tmp/r4ab_curv25.log exp/r4ab_curv25 \
    r4ab_curv25 --steps 800 --res 96 --kick 300 --bf16 --val-every 400 \
    --set model.geometry.curvature_probe_frac=0.25
  bank /tmp/r4ab_curv25.log r4ab_curv25
else
  say "skip curv25: $(left)s left"
fi
say "queue11 drained; chip free"
