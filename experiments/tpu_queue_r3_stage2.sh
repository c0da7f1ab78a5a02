#!/bin/bash
# Round-3 TPU queue, stage 2: evaluation chain. Waits for stage 1
# (experiments/tpu_queue_r3.sh: trainings + MACE retrain + Si reheat probe),
# then runs the offline evals in priority order. Each job appends to its own
# log; failures are logged and the chain continues (evals are independent).
set -u
cd /root/repo

wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 60; done; }

log() { echo "[stage2 $(date +%H:%M:%S)] $*" >> out/queue.log; }

run_job() {
  local name=$1; shift
  log "start ${name}"
  if "$@" >> "out/${name}.log" 2>&1; then
    log "done ${name}"
  else
    log "FAILED ${name} (continuing)"
  fi
}

[ -f /tmp/queue.pid ] && wait_pid "$(cat /tmp/queue.pid)"
log "stage 1 finished"

# 1. SiGe: empirical reheat probe on the r3 checkpoint, then the 256-sample
#    final eval with the probe's noise_temperature (VERDICT #2, the gate).
run_job reheat_probe_sige \
  python experiments/probe_reheat.py \
  --checkpoint out/sige_1x1x1_r3 --prefer last \
  --data data/sige_diffusion_1x1x1_r3 --elements Ge Si --sw SiGe.sw \
  --cell 5.543 5.543 5.543 --natoms 8 --steps 500 --correctors 3 \
  --out experiments/reheat_probe_sige.json

SIGE_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_sige.json'))['noise_temperature'])" 2>/dev/null || echo 1.22)
SIGE_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_sige.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.02)
log "sige tau=${SIGE_TAU} window=${SIGE_WIN}"

run_job eval_sige_r3 \
  python experiments/eval_sige.py \
  --checkpoint out/sige_1x1x1_r3 --prefer last \
  --data data/sige_diffusion_1x1x1_r3 --samples 256 \
  --noise_temperature "${SIGE_TAU}" --temperature_sigma_max "${SIGE_WIN}"

# 2. Si 3x3x3: reheat probe then eval (VERDICT #3).
run_job reheat_probe_si3 \
  python experiments/probe_reheat.py \
  --checkpoint out/si_3x3x3 --prefer last \
  --data data/si_diffusion_3x3x3 --elements Si --sw Si.sw \
  --cell 16.29 16.29 16.29 --natoms 216 --steps 1000 --correctors 3 \
  --samples 32 --max_probes 5 \
  --out experiments/reheat_probe_si3.json

SI3_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3.json'))['noise_temperature'])" 2>/dev/null || echo 1.2)
SI3_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.006)

run_job eval_si3 \
  python experiments/eval_checkpoint.py \
  --checkpoint out/si_3x3x3 --prefer last --sweep custom \
  --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 128 --correctors 3 \
  --noise_temperature "${SI3_TAU}" --sigma_window "${SI3_WIN}" \
  --output experiments/si_3x3x3_eval.json

# 3. MACE checkpoint eval on Si 1x1x1 (VERDICT #4): reheat probe, then a
#    256-sample KS + overlap check at the calibrated temperature.
run_job reheat_probe_mace \
  python experiments/probe_reheat.py \
  --checkpoint out/mace_si_1x1x1_r3b --prefer last \
  --data data/si_diffusion_1x1x1 --elements Si --sw Si.sw \
  --cell 5.43 5.43 5.43 --natoms 8 --steps 500 --correctors 3 \
  --out experiments/reheat_probe_mace.json

MACE_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_mace.json'))['noise_temperature'])" 2>/dev/null || echo 1.0)
MACE_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_mace.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.02)

run_job eval_mace_r3 \
  python experiments/eval_checkpoint.py \
  --checkpoint out/mace_si_1x1x1_r3b --prefer last --sweep custom \
  --natoms 8 --cell 5.43 5.43 5.43 --steps 500 \
  --data data/si_diffusion_1x1x1 --samples 256 --correctors 3 \
  --noise_temperature "${MACE_TAU}" --sigma_window "${MACE_WIN}" \
  --output experiments/mace_si_1x1x1_eval.json

# 4. Alternative samplers on the shipped Si 2x2x2 checkpoint (VERDICT #7).
run_job alt_samplers \
  python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --sweep round3_samplers --data data/si_diffusion_2x2x2 \
  --output experiments/alt_samplers_si_2x2x2.json

# 5. Re-prime the bench compile cache so the driver's BENCH run is warm.
run_job bench_final timeout 3000 python bench.py

log "stage 2 ALL DONE"
