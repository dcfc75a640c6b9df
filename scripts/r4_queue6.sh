#!/bin/bash
# Round-4 queue v6 (session 9): everything after the ripple-rescue
# longrun (scripts/rescue_watchdog.sh, RESULTS.md r4ripple), serialized
# on the single chip, value-ordered so the most decision-relevant
# results land first if the session ends early:
#   1. golden-interleave bench arms (headline default decision)
#   2. clean fast benches at current defaults + stride8
#   3. control train A/B arm (judges the already-run finek3 arm)
#   4. stride8 parity validate on r4mini (gates the stride8 flip)
#   5. curv25 train A/B arm
#   6. one NaN provoke seed (closure evidence; 700 clean steps already
#      banked from session 8)
#
# Usage: setsid nohup scripts/r4_queue6.sh <rescue_watchdog_pid> \
#          </dev/null >/tmp/r4queue6.log 2>&1 &
set -u
cd /root/repo
bank() { python scripts/bank_metrics.py "$1" "$2" || true; }
say() { echo "QUEUE6[$(date +%H:%M:%S)]: $*"; }

WD=${1:-}
if [ -n "$WD" ]; then
  say "waiting for rescue watchdog (pid $WD)"
  while kill -0 "$WD" 2>/dev/null; do sleep 60; done
fi
bank /tmp/longrun.log r4long

G="model.eval_ray_interleave=golden"
{ echo "=== bench armG golden+reserve12288 $(date +%F-%H:%M) ==="
  RISE_BENCH_FAST=1 timeout 1800 python bench.py $G \
    model.eval_band_reserve=12288 2>&1
  echo "=== bench armG16k golden+chunk16384+reserve49152 $(date +%F-%H:%M) ==="
  RISE_BENCH_FAST=1 timeout 1800 python bench.py $G \
    model.ray_chunk=16384 model.eval_band_reserve=49152 2>&1
  echo "=== bench armG16k8 (+stride8) $(date +%F-%H:%M) ==="
  RISE_BENCH_FAST=1 timeout 1800 python bench.py $G \
    model.ray_chunk=16384 model.eval_band_reserve=49152 \
    model.prefilter_stride=8 2>&1
} >> /tmp/r4bench.log
bank /tmp/r4bench.log r4bench

{ echo "=== bench defaults-clean $(date +%F-%H:%M) ==="
  RISE_BENCH_FAST=1 timeout 1800 python bench.py 2>&1
  echo "=== bench stride8-clean (model.prefilter_stride=8) $(date +%F-%H:%M) ==="
  RISE_BENCH_FAST=1 timeout 1800 python bench.py \
    model.prefilter_stride=8 2>&1
} >> /tmp/r4bench.log
bank /tmp/r4bench.log r4bench

AB_ARGS=(--steps 800 --res 96 --kick 300 --bf16 --val-every 400)
for ab in "control -" "curv25 model.geometry.curvature_probe_frac=0.25"; do
  tag=${ab%% *}; ov=${ab#* }
  extra=()
  [ "$ov" != "-" ] && extra=(--set "$ov")
  if [ "$tag" = "control" ]; then
    say "A/B arm control + stride8 parity validate first"
  fi
  say "A/B arm $tag"
  bash scripts/miniwatchdog.sh "/tmp/r4ab_${tag}.log" "exp/r4ab_${tag}" \
    "r4ab_${tag}" "${AB_ARGS[@]}" ${extra[@]+"${extra[@]}"}
  bank "/tmp/r4ab_${tag}.log" "r4ab_${tag}"
  if [ "$tag" = "control" ]; then
    { echo "=== validate stride8 (+band8+reserve defaults) $(date +%F-%H:%M) ==="
      timeout 1800 python scripts/validate_ckpt.py exp/r4mini/parsed.yaml \
        exp/r4mini/ckpt/latest.ckpt.npz 4 model.prefilter_stride=8 \
        model.eval_band_reserve=16384 2>&1
    } >> /tmp/r4evalab.log
    bank /tmp/r4evalab.log r4evalab
  fi
done

say "NaN provoke (one seed)"
{ echo "=== provoke seed 7 $(date +%F-%H:%M) ==="
  timeout 3000 python scripts/nan_repro.py provoke --steps 700 \
    --seed 7 --out /tmp/nanrepro 2>&1 | tail -12; } >> /tmp/r4nan.log
bank /tmp/r4nan.log r4nan
if [ -f /tmp/nanrepro/fault.npz ]; then
  say "fault reproduced; bounded minimize"
  { echo "=== minimize $(date +%F-%H:%M) ==="
    timeout 3600 python scripts/nan_repro.py minimize \
      --dump /tmp/nanrepro/fault.npz 2>&1 | tail -80; } >> /tmp/r4nan.log
  bank /tmp/r4nan.log r4nan
fi
say "queue6 drained"
