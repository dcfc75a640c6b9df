#!/bin/bash
# Round-4 master queue v4 (session 9): serialize ALL remaining TPU work
# on the single chip (session 8 taught us: concurrent TPU jobs contend
# and OOM each other — the armC validate died to HBM exhaustion under a
# co-running train).
#
# Order (rationale):
#   0. wait for the in-flight finek3 train A/B (launched by queue2);
#   1. the 800^2 9k-step longrun + 32-view full test protocol — the
#      round's #1 evidence item (needs ~5-6 h incl. watchdog restarts,
#      so it goes FIRST; banking now happens inside longrun_watchdog);
#   2. matched-protocol A/B arms: control (defaults) + curv25 — the
#      control arm queue2 forgot, without which neither finek3 nor
#      curv25 can be judged;
#   3. stride8 parity validate on the converged r4mini ckpt (its armC
#      run OOM'd under contention) + a clean fast bench at current
#      defaults (band8 exact-K) for the BENCH_r04 headline;
#   4. multi-seed NaN provoke: either it faults (-> dump for minimize)
#      or N*700 clean pure-pallas steps across seeds close VERDICT #3
#      with a measured fault rate of ~0 under current code.
#
# Usage: setsid nohup scripts/r4_queue4.sh <finek3_watchdog_pid> \
#          </dev/null >/tmp/r4queue4.log 2>&1 &
set -u
cd /root/repo
bank() { python scripts/bank_metrics.py "$1" "$2" || true; }
say() { echo "QUEUE4[$(date +%H:%M:%S)]: $*"; }

FINEK3_WD=${1:-}
if [ -n "$FINEK3_WD" ]; then
  say "waiting for finek3 watchdog (pid $FINEK3_WD)"
  while kill -0 "$FINEK3_WD" 2>/dev/null; do sleep 30; done
fi
bank /tmp/r4ab_finek3.log r4ab_finek3

say "launching 800^2 9k longrun (watchdog banks every tick)"
STALL_MIN=25 bash scripts/longrun_watchdog.sh /tmp/longrun.log 9000
say "longrun watchdog exited"
bank /tmp/longrun.log r4long

AB_ARGS=(--steps 800 --res 96 --kick 300 --bf16 --val-every 400)
for ab in "control -" "curv25 model.geometry.curvature_probe_frac=0.25"; do
  tag=${ab%% *}; ov=${ab#* }
  extra=()
  [ "$ov" != "-" ] && extra=(--set "$ov")
  say "A/B arm $tag"
  bash scripts/miniwatchdog.sh "/tmp/r4ab_${tag}.log" "exp/r4ab_${tag}" \
    "r4ab_${tag}" "${AB_ARGS[@]}" ${extra[@]+"${extra[@]}"}
  bank "/tmp/r4ab_${tag}.log" "r4ab_${tag}"
done

say "stride8 parity validate on r4mini (serial this time)"
{ echo "=== validate stride8 (+band8 default) $(date +%F-%H:%M) ==="
  timeout 1800 python scripts/validate_ckpt.py exp/r4mini/parsed.yaml \
    exp/r4mini/ckpt/latest.ckpt.npz 4 model.prefilter_stride=8 2>&1
} >> /tmp/r4evalab.log
bank /tmp/r4evalab.log r4evalab

say "clean fast bench at current defaults (band8 exact-K headline)"
{ echo "=== bench defaults-clean () $(date +%F-%H:%M) ==="
  RISE_BENCH_FAST=1 timeout 1800 python bench.py 2>&1
  echo "=== bench stride8-clean (model.prefilter_stride=8) $(date +%F-%H:%M) ==="
  RISE_BENCH_FAST=1 timeout 1800 python bench.py model.prefilter_stride=8 2>&1
} >> /tmp/r4bench.log
bank /tmp/r4bench.log r4bench

say "multi-seed NaN provoke (closure evidence)"
for seed in 7 123; do
  { echo "=== provoke seed $seed $(date +%F-%H:%M) ==="
    timeout 3000 python scripts/nan_repro.py provoke --steps 700 \
      --seed "$seed" --out /tmp/nanrepro 2>&1 | tail -12; } >> /tmp/r4nan.log
  bank /tmp/r4nan.log r4nan
  if [ -f /tmp/nanrepro/fault.npz ]; then
    say "fault reproduced (seed $seed); bounded minimize"
    { echo "=== minimize $(date +%F-%H:%M) ==="
      timeout 3600 python scripts/nan_repro.py minimize \
        --dump /tmp/nanrepro/fault.npz 2>&1 | tail -80; } >> /tmp/r4nan.log
    bank /tmp/r4nan.log r4nan
    break
  fi
done
say "queue4 drained"
