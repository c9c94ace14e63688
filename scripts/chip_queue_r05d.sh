#!/bin/bash
# Round-5 close-out queue: (1) quiet-host T5 re-measure — the end-of-round
# r5 reading (88.3 ms wall vs 68.5 ms device-busy) was polluted by
# co-resident queue tooling on the 1-CPU host, so re-measure with the host
# idle; (2) on-chip --rss_watchdog_gb demo at the production shape
# (scripts/probe_watchdog.py) — RSS before re-exec vs post-restart trough;
# (3) T5 step trace for the PARITY budget table. Serialized (ONE chip),
# deadline-aware, logs to log/r05 for harvest_r05.py / autoharvest.
set -u
cd /root/repo
LOG=log/r05
mkdir -p $LOG
DEADLINE=${MMGL_Q5D_DEADLINE:?epoch seconds when the queue must stop}

left() { echo $(( DEADLINE - $(date +%s) )); }

# let the CPU pytest suite finish first — chip-job wall time on this 1-CPU
# host is compile-bound, so contention would poison the "quiet host" claim
for _ in $(seq 90); do
  grep -q "^rc=" /tmp/pytest_r5.log 2>/dev/null && break
  (( $(left) > 600 )) || break
  sleep 10
done

wait_tunnel() {
  while true; do
    if timeout 150 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu'" 2>/dev/null; then
      return 0
    fi
    (( $(left) > 180 )) || return 1
    sleep 60
  done
}

run_job() {
  local name=$1 want=$2; shift 2
  local budget=$(left)
  local tmo=$(( want < budget - 60 ? want : budget - 60 ))
  if (( tmo < 180 )); then
    echo "=== $(date -u +%H:%M:%S) SKIP $name (only ${budget}s left)" | tee -a $LOG/queue.log
    return 1
  fi
  echo "=== $(date -u +%H:%M:%S) START $name (tmo=$tmo): $*" | tee -a $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$rc" | tee -a $LOG/queue.log
  tail -3 "$LOG/$name.log" | sed 's/^/    /' | tee -a $LOG/queue.log
}

wait_tunnel || { echo "q5d: no tunnel" | tee -a $LOG/queue.log; exit 1; }

run_job bench_t5_quiet 720 python bench.py --t5
run_job probe_watchdog 1500 python scripts/probe_watchdog.py
run_job profile_t5 600 python scripts/profile_step.py --family t5 --batch 16
echo "=== QUEUE ALL DONE $(date -u +%H:%M:%S)" | tee -a $LOG/queue.log
