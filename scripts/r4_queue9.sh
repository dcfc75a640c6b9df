#!/bin/bash
# Round-4 queue v9 (session 11): pipeline-depth bench arms, gated on
# queue7 draining.  The 16k-chunk arm bought +3.8% purely from dispatch
# amortization but at 1.75% dropped rays (over the <0.5% bar);
# eval_pipeline_depth captures the same overlap drop-free at 4096-ray
# chunks (157 dispatches x ~28 ms RTT = ~4.4 s of a ~78 s render).
#   1. armGP2  — golden (default) + eval_pipeline_depth=2;
#   2. armGP2z — + eval_band_reserve=32768 (offline probe: true zero-drop
#      at cap*16, RESULTS.md r4interleave) — the dropped=0 candidate;
#   3. armGP3  — depth=3 (only if time remains; RTT should already be
#      hidden at depth 2).
# A hard deadline frees the chip for the driver's end-of-round bench.
#
# Usage: setsid nohup scripts/r4_queue9.sh <deadline_epoch> </dev/null >/tmp/r4queue9.log 2>&1 &
set -u
cd /root/repo
DEADLINE=${1:?deadline epoch required}
bank() { python scripts/bank_metrics.py "$1" "$2" || true; }
say() { echo "QUEUE9[$(date +%H:%M:%S)]: $*"; }

say "waiting for queue7 (pid $(cat /tmp/r4queue7.pid 2>/dev/null || echo '?'))"
while [ -f /tmp/r4queue7.pid ] && kill -0 "$(cat /tmp/r4queue7.pid)" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    say "deadline hit while waiting; queue7 still owns the chip — exiting"
    exit 0
  fi
  sleep 30
done
say "queue7 drained; starting bench arms"

run_arm() {
  tag=$1; shift
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -lt 1500 ]; then
    say "skip $tag: only ${left}s to deadline"
    return 1
  fi
  { echo "=== bench $tag ($*) $(date +%F-%H:%M) ==="
    RISE_BENCH_FAST=1 timeout $(( left < 1800 ? left : 1800 )) \
      python bench.py "$@" 2>&1
  } >> /tmp/r4bench.log
  bank /tmp/r4bench.log r4bench
  say "$tag done"
}

run_arm armGP2 model.eval_pipeline_depth=2
run_arm armGP2z model.eval_pipeline_depth=2 model.eval_band_reserve=32768
run_arm armGP3 model.eval_pipeline_depth=3
say "queue9 drained; chip free"
