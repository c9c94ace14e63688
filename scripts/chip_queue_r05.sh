#!/bin/bash
# Round-5 serialized chip-job queue. ONE chip: jobs must never overlap
# (verify skill gotcha). Waits for the axon tunnel, then runs the r5
# measurement list in priority order, logging to log/r05/. Each job is
# bounded by `timeout`; a failed job is recorded and the queue continues.
set -u
cd /root/repo
LOG=log/r05
mkdir -p $LOG

wait_tunnel() {
  local budget=${1:-7200}
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
  # tunnel may have dropped mid-job: re-wait before the next one
  wait_tunnel 7200 >> $LOG/queue.log || true
}

wait_tunnel 100000 | tee -a $LOG/queue.log || exit 1

# 1. headline (VERDICT item 1): cached + uncached, full timing loop
run_job bench_headline 2400 python bench.py
# 2. gradient gate for the bias kernel incl. new batched backward path
run_job verify_bias 1800 python scripts/verify_bias_kernel.py
# 3. T5 attention A/B: serial vs batched backward vs XLA (VERDICT item 4)
run_job ab_t5 1800 python scripts/ab_t5_attention.py
run_job ab_t5_drop 1800 python scripts/ab_t5_attention.py --dropout
# 4. T5 end-to-end step throughput
run_job bench_t5 2400 python bench.py --t5
# 5. chunked CE A/B (VERDICT item 7)
run_job ab_ce_chunked 1800 python scripts/ab_ce.py --chunked
# 6. replay fidelity on chip (VERDICT item 2b): phase a then fresh-proc b
run_job verify_replay_a 2400 python scripts/verify_replay.py
run_job verify_replay_b 2400 python scripts/verify_replay.py --phase b
# 7. OPT-6.7B measured (VERDICT item 3)
run_job probe_67b 5400 python scripts/probe_67b.py
# 8. aux bench modes (pipeline efficiency, eval, generate, host data)
run_job bench_pipeline 2400 python bench.py --pipeline
run_job bench_eval 2400 python bench.py --eval
run_job bench_generate 2400 python bench.py --generate
run_job bench_data 2400 python bench.py --data
echo "=== QUEUE DONE $(date -u +%H:%M:%S)" | tee -a $LOG/queue.log
