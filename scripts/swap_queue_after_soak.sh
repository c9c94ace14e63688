#!/bin/bash
# Watch the round-5 queue log; the moment soak_5k ends, stop the stock
# queue (PID walk, never name patterns) and launch the re-prioritized tail
# queue (chip_queue_r05_tail.sh). Run detached.
set -u
cd /root/repo
LOG=log/r05

kill_tree() {
  local pid=$1
  for child in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    kill_tree "$child"
  done
  kill "$pid" 2>/dev/null
}

while ! grep -q "END soak_5k" $LOG/queue.log 2>/dev/null; do
  sleep 30
done
echo "$(date -u +%H:%M:%S) soak done; swapping queues" >> $LOG/swap.log

if [[ -f /tmp/chipq_all.pid ]]; then
  qpid=$(cat /tmp/chipq_all.pid)
  if kill -0 "$qpid" 2>/dev/null; then
    kill_tree "$qpid"
    sleep 3
    for child in $(ps -o pid= --ppid "$qpid" 2>/dev/null); do
      kill -9 "$child" 2>/dev/null
    done
    kill -9 "$qpid" 2>/dev/null
  fi
fi
# probe_67b may have started between soak end and the swap; give the chip
# a few seconds to free after the tree kill
sleep 10
nohup bash scripts/chip_queue_r05_tail.sh >> /tmp/chipq_tail.out 2>&1 &
echo $! > /tmp/chipq_tail.pid
echo "$(date -u +%H:%M:%S) tail queue started pid $(cat /tmp/chipq_tail.pid)" >> $LOG/swap.log
