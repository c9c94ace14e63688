#!/bin/bash
# Round-5 chip queue, phase B: waits for phase A (chip_queue_r05.sh) to
# print QUEUE DONE, then runs the long jobs — the T5 trace capture and the
# production-vocab 5K-step soak with mid-run SIGKILL + resume. Serialized:
# one chip, jobs never overlap.
set -u
cd /root/repo
LOG=log/r05
mkdir -p $LOG

echo "$(date -u +%H:%M:%S) phase B waiting for phase A completion"
while ! grep -q "QUEUE DONE" $LOG/queue.log 2>/dev/null; do
  sleep 120
done
echo "$(date -u +%H:%M:%S) phase A done; starting phase B" | tee -a $LOG/queue.log

run_job() {
  local name=$1 tmo=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) START $name: $*" | tee -a $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$rc" | tee -a $LOG/queue.log
  tail -3 "$LOG/$name.log" | sed 's/^/    /' | tee -a $LOG/queue.log
}

# T5 trace capture (VERDICT item 4: "capture a T5 trace table like OPT's")
run_job profile_t5 2400 python scripts/profile_step.py --family t5 --batch 16

# production-vocab soak: 10 epochs x 500 steps = 5K steps, kill mid-epoch 5,
# resume, exact-replay + RSS verdicts in the JSON tail (VERDICT item 2).
# ~128 ms/step x 5K x (runA + runB-pre-kill + resume) ~= 35-40 min of chip
# time + eval overhead; budget generously.
run_job soak_5k 14000 python scripts/soak.py --epochs 10 --steps 500 --batch 32 --workdir /tmp/mmgl_soak_r05

echo "=== PHASE B DONE $(date -u +%H:%M:%S)" | tee -a $LOG/queue.log
