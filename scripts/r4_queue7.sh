#!/bin/bash
# Round-4 queue v7 (session 10, post-reset): the environment reset killed
# queue4/5/6 mid-flight and wiped exp/ (again).  Everything that matters
# from their remaining work, value-ordered and adapted to having NO
# surviving checkpoints, serialized on the single chip:
#   1. defaults-clean fast bench — the compliant baseline headline under
#      the session-9 flips (band8 exact-K + eval_band_reserve 16384),
#      never yet measured on TPU;
#   2. golden-interleave bench arms (armG / armG16k / armG16k8) — the
#      headline default decision (TODO.md decision tree);
#   3. control train A/B arm — judges the already-banked finek3 arm;
#   4. curv25 train A/B arm;
#   5. one NaN provoke seed (closure evidence).
# Parity validates that needed the (now dead) r4mini checkpoint are
# dropped: golden interleave is bit-identical up to reassociation
# (tested on CPU), band8 exact-K parity was already banked (+0.002 dB),
# and stride8 stays un-flipped without its validate.
#
# Usage: setsid nohup scripts/r4_queue7.sh </dev/null >/tmp/r4queue7.log 2>&1 &
set -u
cd /root/repo
bank() { python scripts/bank_metrics.py "$1" "$2" || true; }
say() { echo "QUEUE7[$(date +%H:%M:%S)]: $*"; }

G="model.eval_ray_interleave=golden"
{ echo "=== bench defaults-clean (band8+reserve16384) $(date +%F-%H:%M) ==="
  RISE_BENCH_FAST=1 timeout 1800 python bench.py 2>&1
} >> /tmp/r4bench.log
bank /tmp/r4bench.log r4bench

{ echo "=== bench armG golden+reserve12288 ($G) $(date +%F-%H:%M) ==="
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
say "bench arms drained"

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
say "queue7 drained"
