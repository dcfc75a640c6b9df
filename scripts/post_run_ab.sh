#!/bin/bash
# Serial TPU A/B queue for after the long converged run releases the
# chip (single axon tunnel — run ONE TPU process at a time).
#
#   scripts/post_run_ab.sh <run_dir> [logfile]
#
# where <run_dir> is the finished long-run trial dir containing
# config/parsed.yaml and ckpt/latest.ckpt.npz.  Runs, in order:
#   1. converged-checkpoint eval A/B: banded volume (default) vs
#      sphere-trace (timing + PSNR)  [VERDICT r2 #1 follow-through]
#   2. profile_render surface breakdown (trace level truncation, guard)
#   3. curvature_probe_frac=0.25 vs control vs fd_fine_k=3 quality/perf
#      arms (96^2, matched seeds/schedules)
# Everything appends to the logfile; each block is bounded by timeout.
set -u
RUN_DIR=${1:?usage: post_run_ab.sh <run_dir> [logfile]}
LOG=${2:-/tmp/ab.log}
CFG="$RUN_DIR/config/parsed.yaml"
CKPT=$(ls -t "$RUN_DIR"/ckpt/latest.ckpt.npz "$RUN_DIR"/ckpt/*.npz 2>/dev/null | head -1)
cd /root/repo

say() { echo "=== $* ===" >> "$LOG"; }

say "eval A/B on $CKPT (banded volume default)"
timeout 3600 python scripts/validate_ckpt.py "$CFG" "$CKPT" 2 >> "$LOG" 2>&1

say "eval A/B: sphere_trace"
timeout 3600 python scripts/validate_ckpt.py "$CFG" "$CKPT" 2 \
  model.eval_mode=sphere_trace >> "$LOG" 2>&1

say "profile_render surface breakdown"
timeout 3600 python scripts/profile_render.py >> "$LOG" 2>&1

AB="python scripts/train_synthetic.py --steps 800 --res 96 --bf16 --seed 42"
say "train A/B: control"
timeout 3600 $AB --out /tmp/ab_ctl >> "$LOG" 2>&1
say "train A/B: curvature_probe_frac=0.25"
timeout 3600 $AB --out /tmp/ab_curv \
  --set model.geometry.curvature_probe_frac=0.25 >> "$LOG" 2>&1
say "train A/B: fd_fine_k=3"
timeout 3600 $AB --out /tmp/ab_finek \
  --set model.geometry.fd_fine_k=3 >> "$LOG" 2>&1

# multi-emitter full test protocol on the converged checkpoint: the
# in-process run just measured the single-light path (1 NVS + 1 relight
# full render per view) on this same checkpoint — re-running the full
# 32-view protocol with the multi-emitter chunk gives the view-for-view
# timing AND a metric cross-check (parity is test-verified; this is the
# production-scale confirmation).  --no-export: the mesh was already
# exported by the in-process run.
say "multi-emitter full test protocol (32 views)"
TEST_CKPT_SAVE_DIR=/tmp/testck_multi timeout 10800 \
  python scripts/test_ckpt.py "$CFG" "$CKPT" --no-export >> "$LOG" 2>&1

say "ALL DONE"
