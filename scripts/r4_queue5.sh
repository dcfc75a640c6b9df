#!/bin/bash
# Round-4 queue v5 (session 9): interleaved-eval bench arms, serialized
# after queue4 drains (single chip; co-running TPU jobs contend/OOM).
#
# Decision data these arms complete (with queue4's defaults + stride8
# clean benches): headline default among
#   A  = row-major + reserve 16384 (cap*12; 0.31% drops, 1 monster
#        chunk the 4x ladder still can't fit)
#   B  = strided interleave + reserve 32768 (cap*16; zero drops, zero
#        escalations -- scripts/drop_probe.py analysis, RESULTS.md
#        r4interleave)
#   B8 = B + prefilter_stride=8 (gated on queue4's stride8 parity
#        validate <0.1 dB)
#
# Usage: setsid nohup scripts/r4_queue5.sh <queue4_pid> \
#          </dev/null >/tmp/r4queue5.log 2>&1 &
set -u
cd /root/repo
bank() { python scripts/bank_metrics.py "$1" "$2" || true; }
say() { echo "QUEUE5[$(date +%H:%M:%S)]: $*"; }

Q4=${1:-}
if [ -n "$Q4" ]; then
  say "waiting for queue4 (pid $Q4)"
  while kill -0 "$Q4" 2>/dev/null; do sleep 60; done
fi

ARM_B="model.eval_ray_interleave=true model.eval_band_reserve=32768"
{ echo "=== bench armB interleave+reserve32768 ($ARM_B) $(date +%F-%H:%M) ==="
  RISE_BENCH_FAST=1 timeout 1800 python bench.py $ARM_B 2>&1
  echo "=== bench armB8 (+stride8) $(date +%F-%H:%M) ==="
  RISE_BENCH_FAST=1 timeout 1800 python bench.py $ARM_B \
    model.prefilter_stride=8 2>&1
} >> /tmp/r4bench.log
bank /tmp/r4bench.log r4bench
say "queue5 drained"
