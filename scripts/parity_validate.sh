#!/bin/bash
# Eval-lever parity validate on a trained checkpoint: renders val views
# with the current defaults, then with each candidate eval lever, and
# prints the PSNR deltas.  Quality levers flip only if |delta| <= 0.1 dB
# (the bar used for bf16/band8).  CPU-safe (JAX_PLATFORMS honored), so it
# can run while the TPU is busy; round 5 reruns it on the converged
# 800^2 checkpoint (the authoritative gate — see TODO.md carry #3).
#
# Usage: [JAX_PLATFORMS=cpu] scripts/parity_validate.sh <parsed.yaml> \
#          <ckpt.npz> [n_views=1]
set -u
CFG=${1:?parsed config}
CKPT=${2:?checkpoint}
N=${3:-1}
cd /root/repo

for arm in \
  "defaults -" \
  "bakefull model.eval_sdf_bake=full" \
  "bakeprobe model.eval_sdf_bake=probe" \
  "plevels8 model.prefilter_levels=8" \
  "plevels4 model.prefilter_levels=4" \
  "stride8 model.prefilter_stride=8"; do
  tag=${arm%% *}; ov=${arm#* }
  extra=()
  [ "$ov" != "-" ] && extra=("$ov")
  echo "=== parity arm $tag (${extra[*]:-defaults}) $(date +%F-%H:%M) ==="
  timeout 3000 python scripts/validate_ckpt.py "$CFG" "$CKPT" "$N" \
    ${extra[@]+"${extra[@]}"} 2>&1 | grep -v "^WARNING" | tail -3
done
