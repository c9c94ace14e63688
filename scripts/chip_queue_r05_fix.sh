#!/bin/bash
# Round-5 fix queue: re-run the chip jobs that failed on (a) the 3-word
# pltpu.prng_seed (Mosaic: "Setting seed with more than 2 values is not
# supported" — fixed by folding the block word into the two key halves)
# and (b) the batched bias-backward VMEM OOM at the 512x512 encoder shape
# (fixed by the 11 MB dispatch envelope). Waits for the running tail queue
# to release the chip, then runs in verdict-priority order with
# deadline-aware timeouts so the driver's own bench gets a free chip.
set -u
cd /root/repo
LOG=log/r05
mkdir -p $LOG
DEADLINE=${MMGL_FIXQ_DEADLINE:?epoch seconds when the queue must stop}
PREV_PID=${1:-}

left() { echo $(( DEADLINE - $(date +%s) )); }

# wait for the previous queue (if any) to release the chip
if [[ -n $PREV_PID ]]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do
    if (( $(left) <= 120 )); then
      echo "fixq: deadline hit while waiting for pid $PREV_PID" | tee -a $LOG/queue.log
      exit 1
    fi
    sleep 15
  done
fi

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

wait_tunnel || { echo "fixq: no tunnel" | tee -a $LOG/queue.log; exit 1; }

# 1. gradient gate for the fixed in-kernel dropout seed path
run_job verify_bias 600 python scripts/verify_bias_kernel.py
# 2. batched bias kernels under the corrected VMEM envelope
run_job ab_t5 540 python scripts/ab_t5_attention.py
# 3. the dropout-path A/B (both fixes in play)
run_job ab_t5_drop 540 python scripts/ab_t5_attention.py --dropout
# 4. T5 step trace if time remains
run_job profile_t5 480 python scripts/profile_step.py --family t5 --batch 16
echo "=== FIX QUEUE DONE $(date -u +%H:%M:%S)" | tee -a $LOG/queue.log
