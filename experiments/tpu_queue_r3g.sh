#!/bin/bash
# Round-3 session-E stage G: replaces tpu_queue_r3f.sh. Two changes:
#   * The Si 3x3x3 probe/eval retry is inserted after the MACE chain —
#     the r3d probe_si3 (batch 32) crashed the TPU worker with a kernel
#     fault at N=216; training-time validation sampling proves batch 16
#     is inside the fused-forward VMEM budget, so the retry runs with
#     the new --batch 16 chunking in probe_reheat.py / eval_checkpoint.py.
#   * The queue pid is written to /tmp/queue_r3e.pid so the 14:10
#     watchdog's pid-tree kill covers this queue (r3f never registered).
# Job order by VERDICT value: MACE median+FF probe+eval (#4), Si 3x3x3
# eval retry (#3), reheat-probe validation on Si 2x2x2 (#5), adaptive@5
# (#7 follow-through).
set -u
cd /root/repo
mkdir -p out

START_DEADLINE=1340   # don't start a new job after 13:40 (watchdog 14:10)

log() { echo "[r3g $(date +%H:%M:%S)] $*" >> out/queue.log; }

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

log "=== r3g queue start ==="

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

# 2a. Si 3x3x3 reheat probe, chunk-guarded. 16 samples suffice: at N=216
#     the per-structure energy is an average over 216 atoms, so the median
#     estimator's spread is far tighter than at N=8/64.
run_job probe_si3_b16 \
  timeout 2400 python experiments/probe_reheat.py \
  --checkpoint experiments/si_3x3x3_checkpoint --prefer last \
  --data data/si_diffusion_3x3x3 --elements Si --sw Si.sw \
  --cell 16.29 16.29 16.29 --natoms 216 --steps 1000 --correctors 3 \
  --samples 16 --batch 16 \
  --out experiments/reheat_probe_si3x3x3.json

# 2b. Si 3x3x3 eval at the probed tau, 64 samples in 16-sample chunks.
SI3_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3.json'))['noise_temperature'])" 2>/dev/null || echo 1.22)
SI3_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.006)
run_job eval_si3_b16 \
  timeout 3600 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_3x3x3_checkpoint --prefer last --sweep custom \
  --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 64 --correctors 3 --batch 16 \
  --noise_temperature "${SI3_TAU}" --sigma_window "${SI3_WIN}" \
  --output experiments/si_3x3x3_eval.json

# 3. Reheat-probe validation against the Si 2x2x2 sweep optimum (~1.22).
run_job reheat_probe_si \
  timeout 1800 python experiments/probe_reheat.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --data data/si_diffusion_2x2x2 --elements Si --sw Si.sw \
  --cell 10.86 10.86 10.86 --natoms 64 --steps 1000 --correctors 3 \
  --out experiments/reheat_probe_si.json

# 4. Adaptive corrector at the measured convergence threshold.
run_job adaptive5_si2x2x2 \
  timeout 2400 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --sweep round3_samplers --entries adaptive_r0.17_guard_reheat \
  --data data/si_diffusion_2x2x2 --correctors 5 --samples 64 \
  --output experiments/adaptive5_si_2x2x2.json

log "=== r3g queue ALL DONE ==="
