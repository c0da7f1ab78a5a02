#!/bin/bash
# Round-3 session-D stage F: replaces tpu_queue_r3e.sh (killed while still
# waiting) with a tighter schedule — r3d drains ~13:00 and the 14:10
# watchdog leaves only ~70 min, so: shorter settle sleeps, a per-job
# start deadline, and the jobs ordered by VERDICT value:
#   1. MACE median+force-field reheat probe + 256-sample eval (VERDICT #4;
#      the mean-based probe was dragged hot by near-overlap outliers).
#   2. Reheat-probe validation on Si 2x2x2 (VERDICT #5: the probe should
#      recover the sweep optimum tau ~1.22 without a sweep).
#   3. Adaptive corrector at the measured 5-corrector convergence
#      threshold on the production checkpoint (VERDICT #7 follow-through).
set -u
cd /root/repo
mkdir -p out

START_DEADLINE=1345   # don't start a new job after 13:45 (watchdog 14:10)

log() { echo "[r3f $(date +%H:%M:%S)] $*" >> out/queue.log; }

while kill -0 "$(cat /tmp/queue.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
sleep 120

wait_for_tpu() {
  local tries=0
  while true; do
    timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print(float((x @ x).sum()))
" > /dev/null 2>&1 && { log "tpu probe ok"; sleep 60; return 0; }
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

log "=== r3f queue start ==="

# 1a. MACE reheat probe with the outlier-robust median estimator AND the
#     production force-field wrapper.
run_job probe_mace_ff \
  timeout 2000 python experiments/probe_reheat.py \
  --checkpoint experiments/mace_si_1x1x1_r3_checkpoint --prefer last \
  --data data/si_diffusion_1x1x1 --elements Si --sw Si.sw \
  --cell 5.43 5.43 5.43 --natoms 8 --steps 500 --correctors 3 \
  --force_field 1.5 20.0 \
  --out experiments/reheat_probe_mace_ff.json

# 1b. Evaluate at the probed tau with the same wrapper.
MACE_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_mace_ff.json'))['noise_temperature'])" 2>/dev/null || echo 1.1)
MACE_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_mace_ff.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.02)
run_job eval_mace_ff \
  timeout 1800 python experiments/eval_checkpoint.py \
  --checkpoint experiments/mace_si_1x1x1_r3_checkpoint --prefer last \
  --sweep custom --natoms 8 --cell 5.43 5.43 5.43 --steps 500 \
  --data data/si_diffusion_1x1x1 --samples 256 --correctors 3 \
  --noise_temperature "${MACE_TAU}" --sigma_window "${MACE_WIN}" \
  --force_field 1.5 20.0 \
  --output experiments/mace_si_1x1x1_eval_ff.json

# 2. Reheat-probe validation against the Si 2x2x2 sweep optimum (~1.22).
run_job reheat_probe_si \
  timeout 1800 python experiments/probe_reheat.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --data data/si_diffusion_2x2x2 --elements Si --sw Si.sw \
  --cell 10.86 10.86 10.86 --natoms 64 --steps 1000 --correctors 3 \
  --out experiments/reheat_probe_si.json

# 3. Adaptive corrector at the measured convergence threshold.
run_job adaptive5_si2x2x2 \
  timeout 2400 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --sweep round3_samplers --entries adaptive_r0.17_guard_reheat \
  --data data/si_diffusion_2x2x2 --correctors 5 --samples 64 \
  --output experiments/adaptive5_si_2x2x2.json

log "=== r3f queue ALL DONE ==="
