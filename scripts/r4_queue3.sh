#!/bin/bash
# Round-4 final-stretch queue (session 8): runs after the orphaned
# stage-E provoke (queue2's bash was killed at 12:12; provoke PID given
# as $1 keeps the TPU until ~12:40).  ~110 min of round remain, so:
#   1. ONE decisive fast-bench arm: stride8 + band8(exact-K) + chunk8192
#      — the max-speed headline candidate that exact-K sampling makes
#      drop-compliant (RISE_BENCH_FAST=1: cutonly+headline rows only).
#   2. Its 4-view quality-parity validate on the converged r4mini ckpt
#      (<0.1 dB bar vs banded16's 30.369 NN).
#   3. NaN minimize with whatever time remains (VERDICT #3) if the
#      provoke produced a fault dump.
# Defaults are flipped manually in configs/ based on 1+2.
#   setsid nohup scripts/r4_queue3.sh <provoke_pid> </dev/null \
#     >/tmp/r4queue3.log 2>&1 &
set -u
cd /root/repo
bank() { python scripts/bank_metrics.py "$1" "$2" || true; }
say() { echo "QUEUE3[$(date +%H:%M:%S)]: $*"; }

PROVOKE_PID=${1:-}
if [ -n "$PROVOKE_PID" ]; then
  say "waiting for provoke (pid $PROVOKE_PID)"
  while kill -0 "$PROVOKE_PID" 2>/dev/null; do sleep 15; done
fi
bank /tmp/r4nan.log r4nan

ARM="model.prefilter_stride=8 model.eval_banded_samples_per_ray=8 model.ray_chunk=8192"
say "fast bench armC: $ARM"
{ echo "=== bench armC-fast ($ARM) $(date +%F-%H:%M) ==="
  RISE_BENCH_FAST=1 timeout 1500 python bench.py $ARM 2>&1; } \
  >> /tmp/r4bench.log
bank /tmp/r4bench.log r4bench

say "armC parity validate on r4mini"
{ echo "=== validate stride8+band8+chunk8192 (armC parity) $(date +%F-%H:%M) ==="
  timeout 1200 python scripts/validate_ckpt.py exp/r4mini/parsed.yaml \
    exp/r4mini/ckpt/latest.ckpt.npz 4 $ARM 2>&1; } >> /tmp/r4evalab.log
bank /tmp/r4evalab.log r4evalab

if [ -f /tmp/nanrepro/fault.npz ]; then
  say "NaN minimize (bounded)"
  { echo "=== minimize $(date +%F-%H:%M) ==="
    timeout 2400 python scripts/nan_repro.py minimize \
      --dump /tmp/nanrepro/fault.npz 2>&1 | tail -80; } >> /tmp/r4nan.log
else
  say "no fault dump; re-provoke with remaining time"
  { echo "=== provoke2 $(date +%F-%H:%M) ==="
    timeout 2400 python scripts/nan_repro.py provoke --steps 700 \
      --out /tmp/nanrepro 2>&1 | tail -40; } >> /tmp/r4nan.log
fi
bank /tmp/r4nan.log r4nan
say "queue3 drained"
