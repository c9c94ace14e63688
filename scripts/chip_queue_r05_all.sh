#!/bin/bash
# Round-5 serialized chip-job queue (single file, verdict-priority order).
# Replaces the A/B/C phase split: if the axon tunnel window is short, the
# jobs that close VERDICT items 1-3 (headline, on-chip replay, 5K soak,
# 6.7B probe) must land FIRST; kernel A/Bs and aux modes follow. ONE chip:
# jobs never overlap; each is bounded by `timeout`; a failed job is
# recorded and the queue continues; the tunnel is re-awaited between jobs
# because it can drop for 30+ min mid-queue.
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
  wait_tunnel 14400 >> $LOG/queue.log || true
}

wait_tunnel 1000000 | tee -a $LOG/queue.log || exit 1

# ---- tier 1: the verdict-critical artifacts -------------------------------
# 1. headline (VERDICT item 1): cached + uncached, full timing loop
run_job bench_headline 2400 python bench.py
# 2. replay fidelity on chip (VERDICT item 2b): phase a then fresh-proc b
rm -rf /tmp/mmgl_verify_replay /tmp/mmgl_verify_replay.losses.json
run_job verify_replay_a 2400 python scripts/verify_replay.py
run_job verify_replay_b 2400 python scripts/verify_replay.py --phase b
# 3. production-vocab 5K-step soak w/ mid-run SIGKILL + resume (item 2)
rm -rf /tmp/mmgl_soak_r05
run_job soak_5k 14000 python scripts/soak.py --epochs 10 --steps 500 --batch 32 --workdir /tmp/mmgl_soak_r05
# 4. OPT-6.7B measured (VERDICT item 3)
run_job probe_67b 5400 python scripts/probe_67b.py

# ---- tier 2: T5 gap + chunked CE (items 4 and 7) --------------------------
# 5. gradient gate for the bias kernel incl. new batched paths
run_job verify_bias 1800 python scripts/verify_bias_kernel.py
# 6. T5 attention A/B: serial vs batched vs XLA
run_job ab_t5 1800 python scripts/ab_t5_attention.py
run_job ab_t5_drop 1800 python scripts/ab_t5_attention.py --dropout
# 7. T5 end-to-end step throughput + captured trace
run_job bench_t5 2400 python bench.py --t5
run_job profile_t5 2400 python scripts/profile_step.py --family t5 --batch 16
# 8. chunked CE A/B: isolated then full-step
run_job ab_ce_chunked 1800 python scripts/ab_ce.py --chunked
run_job bench_chunked 2400 python bench.py --variants cached,chunked

# ---- tier 3: aux modes ------------------------------------------------------
run_job bench_pipeline 2400 python bench.py --pipeline
run_job bench_pipeline_uncached 3600 python bench.py --pipeline --uncached
run_job bench_eval 2400 python bench.py --eval
run_job bench_generate 2400 python bench.py --generate
echo "=== QUEUE ALL DONE $(date -u +%H:%M:%S)" | tee -a $LOG/queue.log
