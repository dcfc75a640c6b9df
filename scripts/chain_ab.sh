#!/bin/bash
# Zero-gap handoff from the long converged run to the serial TPU A/B
# queue (scripts/post_run_ab.sh).  The axon tunnel supports ONE TPU
# process at a time, so the A/Bs must start only after the long run's
# test protocol fully completes — including any watchdog relaunches
# (scripts/longrun_watchdog.sh) along the way.
#
#   scripts/chain_ab.sh <run_dir> [longrun_log] [ab_log]
#
# Completion condition: the long-run log contains a final "test: {...}"
# metrics line AND the current long-run pid is dead.  Until then, sleep.
# On completion, launch post_run_ab.sh detached (pid -> /tmp/ab.pid) and
# exit 0 so the caller is notified at the handoff moment while the A/Bs
# already occupy the chip.
set -u
RUN_DIR=${1:?usage: chain_ab.sh <run_dir> [longrun_log] [ab_log]}
LOG=${2:-/tmp/longrun.log}
ABLOG=${3:-/tmp/ab.log}
cd /root/repo

while true; do
  pid=$(cat /tmp/longrun.pid 2>/dev/null || echo 0)
  if [ "$pid" != 0 ] && kill -0 "$pid" 2>/dev/null; then
    sleep 60
    continue
  fi
  # long-run process is gone — completed, or mid-relaunch by the watchdog
  if grep -q '^test: ' "$LOG"; then
    break
  fi
  # incomplete: give the watchdog its 120 s poll to relaunch, then re-check
  sleep 150
done

echo "CHAIN: long run complete; starting A/B queue $(date -u +%H:%M:%S)" >> "$ABLOG"
nohup bash scripts/post_run_ab.sh "$RUN_DIR" "$ABLOG" >> "$ABLOG" 2>&1 &
echo $! > /tmp/ab.pid
echo "CHAIN: post_run_ab.sh pid $(cat /tmp/ab.pid)" >> "$ABLOG"
exit 0
