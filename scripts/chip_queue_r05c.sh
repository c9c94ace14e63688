#!/bin/bash
# Round-5 chip queue, phase C: after phase B, run the full-step chunked-CE
# A/B at the production shape (bench.py --variants cached,chunked) and an
# uncached pipeline reading.
set -u
cd /root/repo
LOG=log/r05
mkdir -p $LOG

echo "$(date -u +%H:%M:%S) phase C waiting for phase B completion"
while ! grep -q "PHASE B DONE" $LOG/queue.log 2>/dev/null; do
  sleep 120
done
echo "$(date -u +%H:%M:%S) phase B done; starting phase C" | tee -a $LOG/queue.log

run_job() {
  local name=$1 tmo=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) START $name: $*" | tee -a $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$rc" | tee -a $LOG/queue.log
  tail -3 "$LOG/$name.log" | sed 's/^/    /' | tee -a $LOG/queue.log
}

run_job bench_chunked 2400 python bench.py --variants cached,chunked
run_job bench_pipeline_uncached 3600 python bench.py --pipeline --uncached

echo "=== PHASE C DONE $(date -u +%H:%M:%S)" | tee -a $LOG/queue.log
