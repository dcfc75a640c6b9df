#!/bin/bash
# Round-5 session-1 TPU queue, v2 (VERDICT r5 #1, #2, #5, #6b, #7).
#
#   B. TPU bench arms for the gather-wall levers (banked as they print)
#   P. TPU parity validates of the levers on the r5mini converged ckpt
#      (CPU was starved by the test gate; the chip does each arm in
#      ~2-4 min and is the real target anyway)
#   G. decision gate: wait up to GATE_MAX_S for /tmp/r5_flip_done (the
#      operator flips config defaults from the banked evidence), then
#   C. launch the 9k 800^2 longrun watchdog and WAIT for completion
#   D. tail items in the slack: seed-7 provoke re-bank, albedo
#      emitter-distillation arm
#
# PID-file based; never kills by pattern.  DEADLINE_EPOCH stops new
# starts so the chip is free for the driver's end-of-round bench.
set -u
cd /root/repo
LOG=/tmp/r5queue.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-0}
GATE_MAX_S=${GATE_MAX_S:-900}
say() { echo "=== $* $(date +%F-%H:%M) ===" >> "$LOG"; }
left() {
  if [ "$DEADLINE_EPOCH" -gt 0 ]; then
    echo $(( DEADLINE_EPOCH - $(date +%s) ))
  else
    echo 99999
  fi
}
guard() {
  if [ "$(left)" -lt "${2:-0}" ]; then
    say "DEADLINE guard (need ${2:-0}s, have $(left)s); skipping: $1"
    return 1
  fi
  return 0
}

say "queue v2 start"

# ---- B. bench arms ---- #
for arm in \
  "armDEF -" \
  "armBF model.eval_sdf_bake=full" \
  "armBP model.eval_sdf_bake=probe" \
  "armL8 model.prefilter_levels=8" \
  "armBF192 model.eval_sdf_bake=full model.eval_sdf_bake_cells=192"; do
  guard "bench $arm" 9000 || continue
  set -- $arm; tag=$1; shift
  ov=()
  [ "${1:-}" != "-" ] && ov=("$@")
  say "bench $tag: ${ov[*]:-defaults}"
  RISE_BENCH_FAST=1 timeout 2400 python bench.py ${ov[@]+"${ov[@]}"} \
    >> "$LOG" 2>&1
  python scripts/bank_metrics.py "$LOG" r5bench || true
done

# ---- P. TPU parity validates on the r5mini ckpt ---- #
CKPT=$(ls -t exp/r5mini/ckpt/step_*.ckpt.npz 2>/dev/null | head -1)
if [ -n "${CKPT:-}" ] && guard "parity validates" 7800; then
  say "TPU parity validates on $CKPT"
  bash scripts/parity_validate.sh exp/r5mini/parsed.yaml "$CKPT" 4 \
    >> /tmp/r5parity.log 2>&1
  python scripts/bank_metrics.py /tmp/r5parity.log r5parity || true
fi

# ---- G. decision gate ---- #
say "decision gate: waiting for /tmp/r5_flip_done (max ${GATE_MAX_S}s)"
t0=$(date +%s)
while [ ! -f /tmp/r5_flip_done ] \
      && [ $(( $(date +%s) - t0 )) -lt "$GATE_MAX_S" ]; do
  sleep 15
done
say "gate done (flag: $(ls /tmp/r5_flip_done 2>/dev/null || echo timeout))"

# ---- C. longrun (critical path): launch and WAIT for completion ---- #
if guard "longrun launch" 7200; then
  say "launching longrun watchdog (9k, ramped curvature)"
  setsid nohup bash scripts/longrun_watchdog.sh /tmp/longrun.log 9000 \
    < /dev/null > /tmp/longrun_watchdog.log 2>&1 &
  echo $! > /tmp/longrun_watchdog.pid
  sleep 30
  WPID=$(cat /tmp/longrun_watchdog.pid)
  while kill -0 "$WPID" 2>/dev/null; do
    sleep 120
    if [ "$(left)" -lt 0 ]; then
      say "DEADLINE during longrun; stopping watchdog + trainer"
      kill "$WPID" 2>/dev/null
      sleep 2
      kill "$(cat /tmp/longrun.pid 2>/dev/null)" 2>/dev/null
      sleep 10
      kill -9 "$(cat /tmp/longrun.pid 2>/dev/null)" 2>/dev/null
      python scripts/bank_metrics.py /tmp/longrun.log r5long || true
      exit 0
    fi
  done
  say "longrun watchdog exited"
  python scripts/bank_metrics.py /tmp/longrun.log r5long || true
fi

# ---- D. tail items in the remaining slack ---- #
if guard "seed-7 provoke" 3300; then
  say "NaN provoke seed 7 (re-bank of the scatter-NaN closure leg)"
  { echo "=== provoke seed 7 rerun $(date +%F-%H:%M) ==="
    timeout 3000 python scripts/nan_repro.py provoke --steps 700 \
      --seed 7 --out /tmp/nanrepro 2>&1 | grep -vE "^step |^WARNING"
    echo "=== provoke seed 7 rerun done $(date +%F-%H:%M) ==="
  } >> /tmp/r5nan.log
  python scripts/bank_metrics.py /tmp/r5nan.log r5nan --raw || true
fi

if guard "albedo A/B arm" 4500; then
  say "albedo lever arm: lambda_emitter_distillation=0.1 (mini protocol)"
  t=$(( $(left) - 900 ))
  timeout "$t" bash scripts/miniwatchdog.sh /tmp/r5ab_distill.log \
    exp/r5ab_distill r5ab_distill --steps 1200 --res 96 --kick 300 \
    --bf16 --test --val-every 300 --save-every 300 \
    --set system.loss.lambda_emitter_distillation=0.1
  kill "$(cat /tmp/r5ab_distill.pid 2>/dev/null)" 2>/dev/null || true
  python scripts/bank_metrics.py /tmp/r5ab_distill.log r5ab_distill || true
fi

say "queue drained ($(left)s to deadline)"
python scripts/bank_metrics.py "$LOG" r5bench || true
