#!/bin/bash
# Round-4 serial TPU queue, v2 (session 7 restructure).  Reprioritized
# from r4_queue.sh after the coarse24/stride8 bench arms landed:
#   - the NaN minimizer (VERDICT #3, "must not survive a fourth round")
#     is promoted ABOVE the train A/Bs so it cannot be squeezed out by
#     the round boundary;
#   - remaining bench arms trimmed to the two that can set a compliant
#     headline (band8; chunk16k+band8 combo) — coarse24's 9,444 rays/s
#     drops 6.4% of rays, failing the <0.5% headline bar, so it only
#     returns via the stage-G parity validate;
#   - the 800^2 longrun moves to "if time remains" (it cannot converge
#     before round end; its curve would bank but its checkpoints are
#     reset-mortal).
# Run under setsid so it survives the launching session:
#   setsid nohup scripts/r4_queue2.sh </dev/null >/tmp/r4queue2.log 2>&1 &
set -u
cd /root/repo
bank() { python scripts/bank_metrics.py "$1" "$2" || true; }
say() { echo "QUEUE2[$(date +%H:%M:%S)]: $*"; }

MINI_ARGS=(--steps 1200 --res 96 --kick 300 --bf16 --test --export
           --val-every 300 --save-every 300)

# ---- wait for the in-flight stride8 bench (pid 27526) ----
say "waiting for stride8 bench"
while kill -0 27526 2>/dev/null; do sleep 30; done
bank /tmp/r4bench.log r4bench

run_bench() {  # run_bench <tag> [overrides...]
  local tag=$1; shift
  say "bench $tag $*"
  { echo "=== bench $tag ($*) $(date +%F-%H:%M) ==="
    timeout 3600 python bench.py "$@" 2>&1; } >> /tmp/r4bench.log
  bank /tmp/r4bench.log r4bench
}

# ---- D': the two headline-candidate arms ----
run_bench band8   model.eval_banded_samples_per_ray=8
run_bench combo2  model.ray_chunk=16384 model.eval_banded_samples_per_ray=8

# ---- G: eval-mode + arm quality parity on the converged r4mini ckpt ----
say "stage G: validates on r4mini ckpt"
CKPT=exp/r4mini/ckpt/latest.ckpt.npz
PARSED=exp/r4mini/parsed.yaml
if [ ! -f "$PARSED" ]; then
  timeout 600 python scripts/train_synthetic.py --out exp/r4mini \
    --dump-config-only "${MINI_ARGS[@]}" || true
fi
if [ -f "$CKPT" ] && [ -f "$PARSED" ]; then
  { echo "=== validate banded16 (reference quality) $(date +%F-%H:%M) ==="
    timeout 3600 python scripts/validate_ckpt.py "$PARSED" "$CKPT" 4 2>&1
    echo "=== validate sphere_trace (win-or-demote record) ==="
    timeout 3600 python scripts/validate_ckpt.py "$PARSED" "$CKPT" 4 \
      model.eval_mode=sphere_trace 2>&1
    echo "=== validate band8 (headline-candidate parity) ==="
    timeout 3600 python scripts/validate_ckpt.py "$PARSED" "$CKPT" 4 \
      model.eval_banded_samples_per_ray=8 2>&1
    echo "=== validate band8+coarse24 (bench-arm parity) ==="
    timeout 3600 python scripts/validate_ckpt.py "$PARSED" "$CKPT" 4 \
      model.eval_banded_samples_per_ray=8 \
      model.prefilter_coarse_per_ray=24 2>&1; } >> /tmp/r4evalab.log
  bank /tmp/r4evalab.log r4evalab
else
  say "stage G skipped: no r4mini ckpt/parsed.yaml"
fi

# ---- E: scatter-NaN provoke + minimize (VERDICT #3, promoted) ----
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

# ---- H: longrun only if time remains ----
say "stage H: longrun relaunch (leftover time)"
STALL_MIN=35 bash scripts/longrun_watchdog.sh /tmp/longrun.log 9000 &
LRPID=$!
while kill -0 "$LRPID" 2>/dev/null; do
  sleep 120
  bank /tmp/longrun.log r4long
done
bank /tmp/longrun.log r4long
say "queue drained"
