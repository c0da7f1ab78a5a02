#!/bin/bash
# Swap the running r3i/r3j queues for tpu_queue_r3k.sh at the job boundary
# right after the MACE eval drains. Kills by known PID only (never by
# command-name pattern); aborts the swap if r3i has already started its
# next python job, leaving the original queue running as the fallback.
#
#   bash experiments/takeover_r3k.sh <r3j_pid>
set -u
cd /root/repo
R3J_PID="${1:?usage: takeover_r3k.sh <r3j_pid>}"

log() { echo "[takeover $(date +%H:%M:%S)] $*" >> out/queue.log; }

# 1. Wait for the MACE eval job boundary.
while ! grep -Eq "(done|FAILED/timeout) eval_mace_r3i" out/queue.log; do
  sleep 10
done
log "MACE eval drained; starting takeover"

# 2. Kill the r3j waiter (it would otherwise seize /tmp/queue.pid).
if ps -p "${R3J_PID}" -o cmd= 2>/dev/null | grep -q "tpu_queue_r3j"; then
  kill -9 "${R3J_PID}" 2>/dev/null
  log "killed r3j waiter (pid ${R3J_PID})"
else
  log "r3j pid ${R3J_PID} not found or cmd mismatch; skipping"
fi

kill_tree() {
  local pid=$1 child
  for child in $(ps -o pid= --ppid "${pid}" 2>/dev/null); do
    kill_tree "${child}"
  done
  kill -9 "${pid}" 2>/dev/null
}

# 3. Kill r3i only while it is sleeping between jobs (no python child —
#    SIGKILLing a live TPU client leaves the claim dirty ~10 min).
R3I_PID=$(cat /tmp/queue.pid 2>/dev/null || true)
if [ -n "${R3I_PID:-}" ] && kill -0 "${R3I_PID}" 2>/dev/null; then
  # Jobs run as `timeout NNN python ...`, so the direct child's comm is
  # "timeout"; the wait_for_tpu probe is a bare python. Watch for both.
  for _ in $(seq 1 12); do
    if ps -o comm= --ppid "${R3I_PID}" 2>/dev/null | grep -Eq "python|timeout"; then
      log "r3i has a live job child; waiting 5s"
      sleep 5
    else
      break
    fi
  done
  if ps -o comm= --ppid "${R3I_PID}" 2>/dev/null | grep -Eq "python|timeout"; then
    log "ABORT takeover: r3i already started its next job; leaving r3i+its plan in place"
    exit 1
  fi
  kill_tree "${R3I_PID}"
  log "killed r3i queue (pid ${R3I_PID})"
fi

# 4. Install r3k as the queue of record (watchdog kills this tree at 23:35).
chmod +x experiments/tpu_queue_r3k.sh
nohup bash experiments/tpu_queue_r3k.sh >> out/queue_r3k_nohup.log 2>&1 &
echo $! > /tmp/queue.pid
log "r3k installed as /tmp/queue.pid ($(cat /tmp/queue.pid))"
