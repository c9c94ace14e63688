#!/bin/bash
# Retry pass for the round-5 chip queue.
#
# chip_queue_r05_all.sh runs each job ONCE; a job that started inside a
# tunnel window and lost it mid-run leaves an error-JSON (or truncated)
# log and is never retried. This companion waits for the main queue's
# DONE marker, then re-runs every tier-1/tier-2 job whose log does not
# yet carry a successful machine-readable tail, re-awaiting the tunnel
# between attempts. At most MAX_PASSES sweeps so a permanently dead
# tunnel cannot spin forever.
set -u
cd /root/repo
LOG=log/r05
MAX_PASSES=${MAX_PASSES:-3}

wait_tunnel() {
  local budget=${1:-14400}
  local t0=$(date +%s)
  while true; do
    if timeout 150 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu'" 2>/dev/null; then
      return 0
    fi
    (( $(date +%s) - t0 > budget )) && return 1
    sleep 60
  done
}

# job OK iff its log's last JSON line has a non-null "value" (bench/soak/
# probe jobs) or an EXACT verdict line (verify_replay phases).
job_ok() {
  local name=$1 log=$LOG/$1.log
  [ -s "$log" ] || return 1
  case $name in
    verify_replay_*)
      grep -q -- "-> EXACT" "$log"; return $? ;;
    verify_bias|ab_t5|ab_t5_drop|ab_ce_chunked)
      # text jobs: OK if they exited without a traceback and printed a tail
      ! grep -q "Traceback" "$log" && [ "$(wc -l < "$log")" -ge 3 ]
      return $? ;;
    *)
      python - "$log" <<'EOF'
import json, sys
rec = None
for line in open(sys.argv[1], errors="replace"):
    line = line.strip()
    if line.startswith("{") and line.endswith("}"):
        try: rec = json.loads(line)
        except ValueError: pass
sys.exit(0 if rec and rec.get("value") is not None else 1)
EOF
      return $? ;;
  esac
}

run_job() {
  local name=$1 tmo=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) RETRY $name: $*" | tee -a $LOG/queue.log
  # stdin redirected: the caller's stdin is the JOBS heredoc and a child
  # that read it would eat the remaining job list
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1 < /dev/null
  echo "=== $(date -u +%H:%M:%S) RETRY END $name rc=$?" | tee -a $LOG/queue.log
}

# wait (up to 24h) for the main queue to finish its single pass
t0=$(date +%s)
while ! grep -q "QUEUE ALL DONE" $LOG/queue.log 2>/dev/null; do
  (( $(date +%s) - t0 > 86400 )) && { echo "main queue never finished"; exit 1; }
  sleep 120
done

for pass in $(seq 1 "$MAX_PASSES"); do
  missing=0
  while read -r name tmo cmd; do
    job_ok "$name" && continue
    missing=1
    wait_tunnel 14400 || { echo "$(date -u +%H:%M:%S) tunnel never returned (pass $pass)" >> $LOG/queue.log; break; }
    case $name in
      soak_5k) rm -rf /tmp/mmgl_soak_r05 ;;            # stale partial state
      verify_replay_a) rm -rf /tmp/mmgl_verify_replay /tmp/mmgl_verify_replay.losses.json ;;
    esac
    # shellcheck disable=SC2086
    run_job "$name" "$tmo" $cmd
    python scripts/harvest_r05.py > /dev/null 2>&1 || true
  done <<'JOBS'
bench_headline 2400 python bench.py
verify_replay_a 2400 python scripts/verify_replay.py
verify_replay_b 2400 python scripts/verify_replay.py --phase b
soak_5k 14000 python scripts/soak.py --epochs 10 --steps 500 --batch 32 --workdir /tmp/mmgl_soak_r05
probe_67b 5400 python scripts/probe_67b.py
verify_bias 1800 python scripts/verify_bias_kernel.py
ab_t5 1800 python scripts/ab_t5_attention.py
ab_t5_drop 1800 python scripts/ab_t5_attention.py --dropout
bench_t5 2400 python bench.py --t5
ab_ce_chunked 1800 python scripts/ab_ce.py --chunked
bench_chunked 2400 python bench.py --variants cached,chunked
JOBS
  [ "$missing" -eq 0 ] && { echo "=== RETRY PASS $pass: all jobs OK" | tee -a $LOG/queue.log; break; }
done
echo "=== RETRY QUEUE DONE $(date -u +%H:%M:%S)" | tee -a $LOG/queue.log
