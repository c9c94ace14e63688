#!/bin/bash
# Re-prioritized tail of the round-5 chip queue, swapped in after soak_5k:
# tightened timeouts so the VERDICT-item jobs (6.7B probe, T5 A/B + bench,
# chunked-CE A/B + bench) all land before the 15:30 UTC deadline guard
# (scripts/stop_queue.sh) frees the chip for the driver's own bench run.
set -u
cd /root/repo
LOG=log/r05
mkdir -p $LOG

wait_tunnel() {
  local budget=${1:-3600}
  local t0=$(date +%s)
  while true; do
    if timeout 150 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu'" 2>/dev/null; then
      echo "$(date -u +%H:%M:%S) tunnel UP"; return 0
    fi
    if (( $(date +%s) - t0 > budget )); then
      echo "$(date -u +%H:%M:%S) tunnel wait budget exhausted"; return 1
    fi
    echo "$(date -u +%H:%M:%S) tunnel down; retrying in 60s"
    sleep 60
  done
}

run_job() {
  local name=$1 tmo=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) START $name: $*" | tee -a $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) END $name rc=$rc" | tee -a $LOG/queue.log
  tail -3 "$LOG/$name.log" | sed 's/^/    /' | tee -a $LOG/queue.log
  wait_tunnel 3600 >> $LOG/queue.log || true
}

wait_tunnel 3600 | tee -a $LOG/queue.log || exit 1

# VERDICT item 3: 6.7B measured (incremental JSON per attempt, so even a
# timeout leaves a parseable partial summary)
run_job probe_67b 2400 python scripts/probe_67b.py \
  --configs "1:1:0,2:1:0,4:1:0,4:0:0,8:1:0:8"
# VERDICT item 4: T5 attention A/B (serial vs batched vs XLA) + end-to-end
run_job ab_t5 900 python scripts/ab_t5_attention.py
run_job bench_t5 1200 python bench.py --t5
# VERDICT item 7: chunked CE, isolated + full-step
run_job ab_ce_chunked 900 python scripts/ab_ce.py --chunked
run_job bench_chunked 1200 python bench.py --variants cached,chunked
# gradient gate + the remaining A/Bs if time remains before the guard
run_job verify_bias 900 python scripts/verify_bias_kernel.py
run_job ab_t5_drop 900 python scripts/ab_t5_attention.py --dropout
run_job profile_t5 900 python scripts/profile_step.py --family t5 --batch 16
run_job bench_pipeline 1200 python bench.py --pipeline
run_job bench_eval 1200 python bench.py --eval
run_job bench_generate 1200 python bench.py --generate
echo "=== QUEUE ALL DONE $(date -u +%H:%M:%S)" | tee -a $LOG/queue.log
