#!/bin/bash
# Auto-harvest daemon for the round-5 chip queue.
#
# The axon tunnel can stay down for hours (it has been down >5h today); the
# serialized chip queue (chip_queue_r05_all.sh) will start draining whenever
# the tunnel returns — possibly after the interactive session is gone. This
# daemon makes sure finished job logs still land in git: every 2 minutes it
# folds log/r05/*.log into BENCH_r05_aux.json (idempotent, see
# harvest_r05.py) and commits the artifact when it changed. It exits once
# the queue has printed its DONE marker and the final harvest is committed.
set -u
cd /root/repo
LOG=log/r05
while true; do
  python scripts/harvest_r05.py > /dev/null 2>&1 || true
  if ! git diff --quiet -- BENCH_r05_aux.json 2>/dev/null; then
    git commit -q \
      -m "Harvest chip-queue results into BENCH_r05_aux.json [auto]" \
      -- BENCH_r05_aux.json || true
  fi
  if grep -q "QUEUE ALL DONE" $LOG/queue.log 2>/dev/null \
      && git diff --quiet -- BENCH_r05_aux.json 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) queue done and harvested; exiting"
    exit 0
  fi
  sleep 120
done
