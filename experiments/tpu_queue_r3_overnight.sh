#!/bin/bash
# Overnight recovery queue: the axon tunnel went hard-down ~19:57 (probes
# wedge even after 75 min of zero clients). Probe every 30 min; when the
# TPU returns, run the pending round-3 work in priority order.
set -u
cd /root/repo
log() { echo "[night $(date +%H:%M:%S)] $*" >> out/queue.log; }

wait_for_tpu() {
  local tries=0
  while [ "$tries" -lt 24 ]; do
    timeout 420 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))
" > /dev/null 2>&1 && { log "tpu probe ok"; sleep 90; return 0; }
    tries=$((tries + 1))
    log "probe wedged (try ${tries}); sleeping 1800s"
    sleep 1800
  done
  return 1
}

run_job() {
  local name=$1; shift
  wait_for_tpu || { log "SKIP ${name}: tpu never recovered"; exit 1; }
  log "start ${name}"
  if "$@" >> "out/${name}.log" 2>&1; then
    log "done ${name}"; sleep 120
  else
    log "FAILED/timeout ${name} (continuing)"; sleep 600
  fi
}

log "=== overnight queue armed ==="

SIGE_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_sige.json'))['noise_temperature'])")
SIGE_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_sige.json'))['temperature_sigma_max'])")
run_job eval_sige_r3 \
  timeout 2400 python experiments/eval_sige.py \
  --checkpoint out/sige_1x1x1_r3 --prefer last \
  --data data/sige_diffusion_1x1x1_r3 --samples 256 \
  --noise_temperature "${SIGE_TAU}" --temperature_sigma_max "${SIGE_WIN}"

run_job bench_final timeout 2400 python bench.py

run_job si_3x3x3_b \
  timeout 5400 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_si_3x3x3.yaml --output out/si_3x3x3

run_job eval_si3 \
  timeout 3600 python experiments/eval_checkpoint.py \
  --checkpoint out/si_3x3x3 --prefer last --sweep custom \
  --natoms 216 --cell 16.29 16.29 16.29 --data data/si_diffusion_3x3x3 \
  --samples 64 --correctors 3 --noise_temperature 1.22 --sigma_window 0.006 \
  --output experiments/si_3x3x3_eval.json

run_job mace_si_1x1x1_r3b \
  timeout 3600 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_mace_si_1x1x1_round3.yaml --output out/mace_si_1x1x1_r3b

run_job eval_mace_r3 \
  timeout 1800 python experiments/eval_checkpoint.py \
  --checkpoint out/mace_si_1x1x1_r3b --prefer last --sweep custom \
  --natoms 8 --cell 5.43 5.43 5.43 --steps 500 \
  --data data/si_diffusion_1x1x1 --samples 256 --correctors 3 \
  --noise_temperature 1.1 --sigma_window 0.02 \
  --output experiments/mace_si_1x1x1_eval.json

run_job reheat_probe_si \
  timeout 2400 python experiments/probe_reheat.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --data data/si_diffusion_2x2x2 --elements Si --sw Si.sw \
  --cell 10.86 10.86 10.86 --natoms 64 --steps 1000 --correctors 3 \
  --out experiments/reheat_probe_si.json

run_job alt_samplers \
  timeout 3600 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --sweep round3_samplers --data data/si_diffusion_2x2x2 \
  --output experiments/alt_samplers_si_2x2x2.json

log "=== overnight queue ALL DONE ==="
