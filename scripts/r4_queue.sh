#!/bin/bash
# Round-4 serial TPU queue: keeps the single chip busy through every
# VERDICT-r3 deliverable, in priority order, with each stage's metrics
# banked into git (RESULTS.md) the moment they print.  Run under setsid
# so it survives the launching session:
#   setsid nohup scripts/r4_queue.sh </dev/null >/tmp/r4queue.log 2>&1 &
#
# Stages (VERDICT r3 "next round" numbering):
#   A  wait for the r4mini converged mini-protocol run (#1, running)
#   B  concave ablation arm WITH secondary pass (#2)
#   C  concave ablation arm WITHOUT (model.indirect_pred=false) (#2)
#   D  instrumented bench + eval A/Bs: chunk size, banded spr (#4,#7,#8)
#   G  eval-mode A/B on the r4mini converged ckpt: banded vs sphere (#5)
#   F  train A/Bs: fd_fine_k=3, curvature_probe_frac=0.25 (#6)
#   E  scatter-NaN provoke + minimize (#3)
#   H  800^2 9k-step longrun relaunch under its own watchdog (#1)
set -u
cd /root/repo
Q=/tmp/r4queue.log
bank() { python scripts/bank_metrics.py "$1" "$2" || true; }
say() { echo "QUEUE[$(date +%H:%M:%S)]: $*"; }

MINI_ARGS=(--steps 1200 --res 96 --kick 300 --bf16 --test --export
           --val-every 300 --save-every 300)

# ---- A: wait for r4mini (watchdog 18914 / trainer per pid file) ----
say "stage A: waiting for r4mini"
while true; do
  if grep -q "WATCHDOG: run completed" /tmp/r4mini.log 2>/dev/null; then
    say "r4mini complete"; break
  fi
  wd=$(cat /tmp/r4mini_wd.pid 2>/dev/null || echo 0)
  if ! kill -0 "$wd" 2>/dev/null; then
    # watchdog died without completing: take over (idempotent resume)
    say "r4mini watchdog dead; taking over"
    bash scripts/miniwatchdog.sh /tmp/r4mini.log exp/r4mini r4mini \
      "${MINI_ARGS[@]}"
    break
  fi
  sleep 60
done
bank /tmp/r4mini.log r4mini

# ---- B/C: concave secondary-pass ablation pair ----
CONC_ARGS=(--steps 1200 --res 96 --kick 300 --bf16 --test
           --val-every 300 --save-every 300
           --set dataset.name=synthetic-concave)
say "stage B: concave WITH secondary"
bash scripts/miniwatchdog.sh /tmp/r4concA.log exp/r4concA r4concaveA \
  "${CONC_ARGS[@]}"
bank /tmp/r4concA.log r4concaveA

say "stage C: concave WITHOUT secondary (indirect_pred=false)"
bash scripts/miniwatchdog.sh /tmp/r4concB.log exp/r4concB r4concaveB \
  "${CONC_ARGS[@]}" --set model.indirect_pred=false
bank /tmp/r4concB.log r4concaveB

# ---- D: instrumented bench + eval A/Bs ----
say "stage D: bench (frozen protocol) + eval A/Bs"
run_bench() {  # run_bench <tag> [overrides...]
  local tag=$1; shift
  say "bench $tag $*"
  { echo "=== bench $tag ($*) $(date +%F-%H:%M) ==="
    timeout 3600 python bench.py "$@" 2>&1; } >> /tmp/r4bench.log
  bank /tmp/r4bench.log r4bench
}
# row-volume attribution (CPU trace, r4): the coarse visibility probe
# is 55% of all table gathers (33.5M of 61.3M rows/chunk) and its
# static 64-probes/ray capacity is ~78% padding on the converged scene
# (~14 real probes/ray) — so probe-capacity/stride arms are the
# highest-leverage throughput knobs, then dispatch amortization (chunk)
# and band width.
run_bench headline
run_bench coarse24 model.prefilter_coarse_per_ray=24
run_bench stride8  model.prefilter_stride=8 model.prefilter_coarse_per_ray=32
run_bench chunk16k model.ray_chunk=16384
run_bench band8    model.eval_banded_samples_per_ray=8
run_bench combo    model.ray_chunk=16384 model.prefilter_coarse_per_ray=24 \
                   model.eval_banded_samples_per_ray=8

# ---- G: eval-mode A/B on the converged r4mini checkpoint ----
say "stage G: banded vs sphere-trace on r4mini ckpt"
CKPT=exp/r4mini/ckpt/latest.ckpt.npz
PARSED=exp/r4mini/parsed.yaml
if [ ! -f "$PARSED" ]; then
  # the r4mini run predates train_synthetic's config dumping —
  # reconstruct the exact config from the same args
  timeout 600 python scripts/train_synthetic.py --out exp/r4mini \
    --dump-config-only "${MINI_ARGS[@]}" || true
fi
if [ -f "$CKPT" ] && [ -f "$PARSED" ]; then
  { echo "=== validate banded $(date +%F-%H:%M) ==="
    timeout 3600 python scripts/validate_ckpt.py "$PARSED" "$CKPT" 4 2>&1
    echo "=== validate sphere_trace ==="
    timeout 3600 python scripts/validate_ckpt.py "$PARSED" "$CKPT" 4 \
      model.eval_mode=sphere_trace 2>&1
    echo "=== validate banded8 + coarse24 (quality parity for the bench arms) ==="
    timeout 3600 python scripts/validate_ckpt.py "$PARSED" "$CKPT" 4 \
      model.eval_banded_samples_per_ray=8 \
      model.prefilter_coarse_per_ray=24 2>&1; } >> /tmp/r4evalab.log
  bank /tmp/r4evalab.log r4evalab
else
  say "stage G skipped: no r4mini ckpt/parsed.yaml"
fi

# ---- F: train A/Bs (800 steps, 96^2, bf16) ----
say "stage F: train A/Bs"
AB_ARGS=(--steps 800 --res 96 --kick 300 --bf16 --val-every 400)
for ab in "finek3 model.geometry.fd_fine_k=3" \
          "curv25 model.geometry.curvature_probe_frac=0.25"; do
  tag=${ab%% *}; ov=${ab#* }
  bash scripts/miniwatchdog.sh "/tmp/r4ab_${tag}.log" "exp/r4ab_${tag}" \
    "r4ab_${tag}" "${AB_ARGS[@]}" --set "$ov"
  bank "/tmp/r4ab_${tag}.log" "r4ab_${tag}"
done

# ---- E: scatter-NaN provoke + minimize ----
say "stage E: NaN provoke + minimize"
{ echo "=== provoke $(date +%F-%H:%M) ==="
  timeout 5400 python scripts/nan_repro.py provoke --steps 700 \
    --out /tmp/nanrepro 2>&1 | tail -40
  if [ -f /tmp/nanrepro/fault.npz ]; then
    echo "=== minimize ==="
    timeout 7200 python scripts/nan_repro.py minimize \
      --dump /tmp/nanrepro/fault.npz 2>&1 | tail -80
  else
    echo "no fault dump produced (fault did not reproduce in 700 steps)"
  fi; } >> /tmp/r4nan.log
python scripts/bank_metrics.py /tmp/r4nan.log r4nan --raw || true

# ---- H: 800^2 9k-step longrun (runs to round end) ----
say "stage H: longrun relaunch"
STALL_MIN=35 bash scripts/longrun_watchdog.sh /tmp/longrun.log 9000 &
LRPID=$!
while kill -0 "$LRPID" 2>/dev/null; do
  sleep 120
  bank /tmp/longrun.log r4long
done
bank /tmp/longrun.log r4long
say "queue drained"
