#!/bin/bash
# Round-3 session-F stage J: runs after tpu_queue_r3i.sh drains. Two
# measurement jobs that need the TPU but not training time:
#   * repro_batch32 — bisect the N=216 batch-32 worker fault (stage A
#     forward / stage B short scan at batch 16/24/32).
#   * arch_timing — MACE vs EGNN forward latency + MFU at the same
#     workload (VERDICT #4's wall-clock/MFU comparison clause).
# Takes over /tmp/queue.pid once r3i exits so the 23:35 watchdog's
# PID-tree kill covers this queue too.
set -u
cd /root/repo
mkdir -p out

START_DEADLINE=2300

log() { echo "[r3j $(date +%H:%M:%S)] $*" >> out/queue.log; }

while kill -0 "$(cat /tmp/queue.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
echo $$ > /tmp/queue.pid
sleep 120

wait_for_tpu() {
  local tries=0
  while true; do
    timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print(float((x @ x).sum()))
" > /dev/null 2>&1 && { log "tpu probe ok"; sleep 30; return 0; }
    tries=$((tries + 1))
    log "tpu probe wedged (try ${tries}); cooling 600s"
    sleep 600
    if [ "$tries" -ge 6 ]; then log "tpu unreachable after ${tries} tries"; return 1; fi
  done
}

run_job() {
  local name=$1; shift
  if [ "$(date +%H%M)" -gt "${START_DEADLINE}" ]; then
    log "SKIP ${name}: past start deadline"
    return 1
  fi
  wait_for_tpu || { log "SKIP ${name}: no tpu"; return 1; }
  log "start ${name}"
  if "$@" >> "out/${name}.log" 2>&1; then
    log "done ${name}"
    sleep 60
  else
    log "FAILED/timeout ${name} (continuing)"
    sleep 300
  fi
}

log "=== r3j queue start ==="

run_job arch_timing \
  timeout 2400 python experiments/arch_timing.py --batch 256

run_job repro_b32 \
  timeout 2400 python experiments/repro_batch32.py \
  --checkpoint experiments/si_3x3x3_checkpoint --prefer last

log "=== r3j queue ALL DONE ==="
