#!/bin/bash
# Round-4 queue v5 (session 9): interleaved-eval bench arms, serialized
# after queue4 drains (single chip; co-running TPU jobs contend/OOM).
#
# Offline scoring of the frozen protocol's saved per-ray counts
# (scripts/drop_probe.py analyze; RESULTS.md r4interleave) found the
# golden multiplicative interleave reaches ZERO drops at chunk*11 rows
# for every chunk size 4096..16384, where row-major needs chunk*514
# (one monster silhouette chunk).  Arms:
#   armG    = golden + reserve 12288 (cap*11 at chunk 4096: a buffer
#             8% SMALLER than today's compliant cap*12, zero drops)
#   armG16k = golden + ray_chunk 16384 + reserve 49152 (cap*11): 40
#             dispatches/image instead of 157 — the measured +5%
#             dispatch-amortization lever, previously drop-blocked
#   armG16k8 = armG16k + prefilter_stride=8 (gated on queue4's stride8
#             parity validate <0.1 dB before any default flip)
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

G="model.eval_ray_interleave=golden"
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
say "queue5 drained"
