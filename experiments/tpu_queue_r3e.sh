#!/bin/bash
# Round-3 session-C stage E: runs after tpu_queue_r3d.sh drains.
#  1. adaptive_corrector at 5 correctors on the learned Si 2x2x2 score —
#     the exact-score study says >= 5 is the convergence threshold; this
#     tests whether that fixes the production system too.
#  2. reheat-probe validation on Si 2x2x2 (sweep optimum was tau ~1.22;
#     the probe should find it without a sweep).
#  3. MACE eval with the production force-field wrapper (tail control).
#  4. Final warm bench so the driver's BENCH_r03 capture stays clean.
set -u
cd /root/repo
mkdir -p out

log() { echo "[r3e $(date +%H:%M:%S)] $*" >> out/queue.log; }

while kill -0 "$(cat /tmp/queue.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
sleep 180

wait_for_tpu() {
  local tries=0
  while true; do
    timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print(float((x @ x).sum()))
" > /dev/null 2>&1 && { log "tpu probe ok"; sleep 90; return 0; }
    tries=$((tries + 1))
    log "tpu probe wedged (try ${tries}); cooling 600s"
    sleep 600
    if [ "$tries" -ge 8 ]; then log "tpu unreachable after ${tries} tries"; return 1; fi
  done
}

run_job() {
  local name=$1; shift
  wait_for_tpu || { log "SKIP ${name}: no tpu"; return 1; }
  log "start ${name}"
  if "$@" >> "out/${name}.log" 2>&1; then
    log "done ${name}"
    sleep 120
  else
    log "FAILED/timeout ${name} (continuing)"
    sleep 600
  fi
}

log "=== r3e queue start ==="

# 1. (moved first: tightest on VERDICT #4, and the 14:10 watchdog
#    may truncate this queue) Re-probe MACE with the outlier-robust median estimator AND the
#    production force-field wrapper (the mean-based probe was dragged hot
#    by a handful of near-overlap outliers and bracketed tau to 0.33 while
#    the bulk froze), then evaluate at the probed tau with the same wrapper.
run_job probe_mace_ff \
  timeout 2400 python experiments/probe_reheat.py \
  --checkpoint experiments/mace_si_1x1x1_r3_checkpoint --prefer last \
  --data data/si_diffusion_1x1x1 --elements Si --sw Si.sw \
  --cell 5.43 5.43 5.43 --natoms 8 --steps 500 --correctors 3 \
  --force_field 1.5 20.0 \
  --out experiments/reheat_probe_mace_ff.json

MACE_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_mace_ff.json'))['noise_temperature'])" 2>/dev/null || echo 1.1)
MACE_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_mace_ff.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.02)
run_job eval_mace_ff \
  timeout 2100 python experiments/eval_checkpoint.py \
  --checkpoint experiments/mace_si_1x1x1_r3_checkpoint --prefer last \
  --sweep custom --natoms 8 --cell 5.43 5.43 5.43 --steps 500 \
  --data data/si_diffusion_1x1x1 --samples 256 --correctors 3 \
  --noise_temperature "${MACE_TAU}" --sigma_window "${MACE_WIN}" \
  --force_field 1.5 20.0 \
  --output experiments/mace_si_1x1x1_eval_ff.json

# 2. Adaptive corrector at the measured convergence threshold (5 correctors)
#    with the reheat window and the harmonic step cap, on the production
#    Si 2x2x2 checkpoint.
run_job adaptive5_si2x2x2 \
  timeout 2700 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --sweep round3_samplers --entries adaptive_r0.17_guard_reheat \
  --data data/si_diffusion_2x2x2 --correctors 5 --samples 64 \
  --output experiments/adaptive5_si_2x2x2.json

# 3. Reheat-probe validation against the Si 2x2x2 sweep optimum (~1.22).
run_job reheat_probe_si \
  timeout 2400 python experiments/probe_reheat.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --data data/si_diffusion_2x2x2 --elements Si --sw Si.sw \
  --cell 10.86 10.86 10.86 --natoms 64 --steps 1000 --correctors 3 \
  --out experiments/reheat_probe_si.json

log "=== r3e queue ALL DONE ==="
