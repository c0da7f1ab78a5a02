#!/bin/bash
# Round-3 session-F stage K: replaces the tail of tpu_queue_r3i.sh (and all
# of tpu_queue_r3j.sh) once the MACE eval drains. Rationale: r3i's fixed
# 4h si3-train timeout pushes the final Si 3x3x3 probe+eval past the 22:50
# start deadline, losing the round's strongest #3 evidence, and r3j's
# arch-timing (VERDICT #4's MFU-comparison clause) would never start. This
# queue re-orders with wall-clock-bounded budgets:
#   1. arch_timing         — MACE vs EGNN forward MFU (short, do first)
#   2. si3 insurance       — FF probe + n=64 eval on the 40-epoch ckpt
#   3. si3 resume          — trains until the 20:45 wall boundary
#   4. si3 probe + eval    — on the resumed ckpt, fits before 23:35 watchdog
#   5. adaptive5 / repro   — only if time remains (usually skipped)
# The takeover wrapper (takeover_r3k.sh) kills r3i/r3j at a job boundary
# and installs this script's PID in /tmp/queue.pid so the 23:35 watchdog
# covers it.
set -u
cd /root/repo
mkdir -p out

START_DEADLINE=2250   # no new job after 22:50 (watchdog 23:35)

log() { echo "[r3k $(date +%H:%M:%S)] $*" >> out/queue.log; }

# Seconds from now until today's HH:MM (0 if already past).
secs_until() {
  local target now
  target=$(date -d "today $1" +%s)
  now=$(date +%s)
  echo $(( target > now ? target - now : 0 ))
}

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

snapshot() {
  local src=$1 dst=$2
  rm -rf "${dst}"
  cp -r "${src}" "${dst}" && log "snapshot ${src} -> ${dst}"
}

log "=== r3k queue start ==="

# ----------------------------------- 1. arch timing (VERDICT #4 MFU clause)
run_job arch_timing \
  timeout 2400 python experiments/arch_timing.py --batch 256

# ------------------------------------ 2. Si 3x3x3 insurance (40-epoch ckpt)
run_job probe_si3_ff \
  timeout 3000 python experiments/probe_reheat.py \
  --checkpoint experiments/si_3x3x3_checkpoint --prefer last \
  --data data/si_diffusion_3x3x3 --elements Si --sw Si.sw \
  --cell 16.29 16.29 16.29 --natoms 216 --steps 1000 --correctors 3 \
  --samples 16 --batch 16 --force_field 1.5 20.0 \
  --out experiments/reheat_probe_si3x3x3_ff.json

SI3_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_ff.json'))['noise_temperature'])" 2>/dev/null || echo 0.9)
SI3_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_ff.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.0133)
run_job eval_si3_ff \
  timeout 4200 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_3x3x3_checkpoint --prefer last --sweep custom \
  --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 64 --correctors 3 --batch 16 --force_field 1.5 20.0 \
  --noise_temperature "${SI3_TAU}" --sigma_window "${SI3_WIN}" \
  --output experiments/si_3x3x3_eval_ff.json

# --------- 3+4. Si 3x3x3 resume + probe + eval, bounded by wall boundaries.
# Delegated to a helper so the stage can be finalized while this queue is
# already running earlier jobs (bash reads the helper at invocation time,
# not at queue start — the fused-checkpoint conversion lands there).
bash experiments/si3_stage_r3k.sh "${SI3_TAU}" "${SI3_WIN}"

# -------------------- 5. leftovers, only if the clock allows (rare)
run_job adaptive5 \
  timeout 3600 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --sweep adaptive5 --natoms 64 --cell 10.86 10.86 10.86 \
  --data data/si_diffusion_2x2x2 \
  --output experiments/adaptive5_si_2x2x2.json

run_job repro_b32 \
  timeout 2400 python experiments/repro_batch32.py \
  --checkpoint experiments/si_3x3x3_checkpoint --prefer last

log "=== r3k queue ALL DONE ==="
