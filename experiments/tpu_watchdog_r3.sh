#!/bin/bash
# Round-3 end-of-round watchdog. At the deadline, stop the eval queue and
# every TPU client so the driver's BENCH run gets a clean axon claim, then
# (after the dirty-claim window) run one warm bench to re-verify the cache.
set -u
cd /root/repo
DEADLINE="21:02"

while [ "$(date +%H%M)" -lt "${DEADLINE/:/}" ]; do sleep 30; done
echo "[watchdog $(date +%H:%M:%S)] deadline: stopping queue + TPU clients" >> out/queue.log

QP=$(cat /tmp/queue.pid 2>/dev/null)
[ -n "${QP}" ] && { pkill -9 -P "${QP}" 2>/dev/null; kill -9 "${QP}" 2>/dev/null; }
# Kill known TPU client commands by exact pattern match on our own launches.
for pat in "train_diffusion --config experiments" "experiments/eval_checkpoint.py" \
           "experiments/eval_sige.py" "experiments/probe_reheat.py" "bench.py"; do
  ps aux | grep -F "$pat" | grep -v grep | awk '{print $2}' | while read -r pid; do
    kill -9 "$pid" 2>/dev/null
  done
done
echo "[watchdog $(date +%H:%M:%S)] clients stopped; cooling 620s" >> out/queue.log
sleep 620

timeout 900 python bench.py > out/bench_watchdog.log 2>&1 \
  && echo "[watchdog $(date +%H:%M:%S)] bench ok: $(tail -1 out/bench_watchdog.log | head -c 200)" >> out/queue.log \
  || echo "[watchdog $(date +%H:%M:%S)] bench FAILED" >> out/queue.log
echo "[watchdog] TPU left clean for the driver" >> out/queue.log
