#!/bin/bash
# Round-4 queue v8 (session 10): the train-side tail of queue7, split
# out so the bench-side default flips (golden interleave / 16k chunks /
# eval pipeline depth) could land between the bench arms and the train
# arms without contending for the chip.
#   1. control train A/B arm (judges the banked finek3 arm);
#   2. one NaN provoke seed (closure evidence for VERDICT r3 #3; 700
#      clean steps already banked from session 8) + bounded minimize
#      on fault;
#   3. curv25 train A/B arm (perf lever — last, most cuttable).
#
# Usage: setsid nohup scripts/r4_queue8.sh </dev/null >/tmp/r4queue8.log 2>&1 &
set -u
cd /root/repo
bank() { python scripts/bank_metrics.py "$1" "$2" || true; }
say() { echo "QUEUE8[$(date +%H:%M:%S)]: $*"; }

AB_ARGS=(--steps 800 --res 96 --kick 300 --bf16 --val-every 400)
run_arm() {
  tag=$1; ov=$2
  extra=()
  [ "$ov" != "-" ] && extra=(--set "$ov")
  say "A/B arm $tag"
  bash scripts/miniwatchdog.sh "/tmp/r4ab_${tag}.log" "exp/r4ab_${tag}" \
    "r4ab_${tag}" "${AB_ARGS[@]}" ${extra[@]+"${extra[@]}"}
  bank "/tmp/r4ab_${tag}.log" "r4ab_${tag}"
}

run_arm control -

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

run_arm curv25 model.geometry.curvature_probe_frac=0.25
say "queue8 drained"
