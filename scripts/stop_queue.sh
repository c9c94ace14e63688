#!/bin/bash
# Cleanly stop the round-5 chip queue: kill the queue shell and its child
# job tree BY PID WALK (never by name pattern), append the DONE marker so
# the autoharvest daemon can finish, run a final harvest, and commit.
# Usage: scripts/stop_queue.sh [<queue-pidfile>...]
set -u
cd /root/repo
PIDFILES=("$@")
if [[ ${#PIDFILES[@]} -eq 0 ]]; then
  PIDFILES=(/tmp/chipq_all.pid /tmp/chipq_tail.pid)
fi
LOG=log/r05

kill_tree() {
  local pid=$1
  for child in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    kill_tree "$child"
  done
  kill "$pid" 2>/dev/null
}

for PIDFILE in "${PIDFILES[@]}"; do
  [[ -f $PIDFILE ]] || continue
  qpid=$(cat "$PIDFILE")
  if kill -0 "$qpid" 2>/dev/null; then
    echo "stopping queue pid $qpid and its job tree"
    kill_tree "$qpid"
    sleep 3
    # SIGKILL stragglers still alive in the tree
    for child in $(ps -o pid= --ppid "$qpid" 2>/dev/null); do
      kill -9 "$child" 2>/dev/null
    done
    kill -9 "$qpid" 2>/dev/null
  fi
done
echo "=== QUEUE ALL DONE $(date -u +%H:%M:%S) (stopped by deadline guard)" \
  >> $LOG/queue.log
python scripts/harvest_r05.py || true
if ! git diff --quiet -- BENCH_r05_aux.json 2>/dev/null; then
  git commit -q -m "Final chip-queue harvest at deadline" -- BENCH_r05_aux.json
fi
echo "queue stopped; chip free"
