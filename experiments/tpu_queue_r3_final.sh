#!/bin/bash
# Round-3 TPU queue (v2). Axon-claim discipline learned the hard way:
#  - one client at a time; a clean exit frees the claim in ~1-2 min;
#  - a SIGKILL'd client leaves a dirty claim needing ~10 min of ZERO clients;
#  - a client that attaches during the dirty window wedges FOREVER (kill it
#    and start over).
# So: before every job, gate on a tiny matmul probe (clean exit on success);
# when the probe times out (wedged), enforce a 600 s zero-client window and
# retry. Trainings are time-capped; the trainer checkpoints every epoch.
set -u
cd /root/repo

log() { echo "[final $(date +%H:%M:%S)] $*" >> out/queue.log; }

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
    sleep 600  # timeout implies SIGKILL: dirty claim, long cooldown
  fi
}

log "=== final queue v2 start ==="

# 1. Si 3x3x3 training, time-capped (resumes from epoch 9; VERDICT #3).
run_job si_3x3x3_b \
  timeout 3000 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_si_3x3x3.yaml \
  --output out/si_3x3x3

# 2. Si 3x3x3 eval (64 samples, 32-chunks come from eval_checkpoint batching).
run_job eval_si3 \
  timeout 3000 python experiments/eval_checkpoint.py \
  --checkpoint out/si_3x3x3 --prefer last --sweep custom \
  --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 64 --correctors 3 \
  --noise_temperature 1.22 --sigma_window 0.006 \
  --output experiments/si_3x3x3_eval.json

# 3. SiGe 256-sample eval (chunked at 64 -> warm program; probe already done:
#    experiments/reheat_probe_sige.json, tau=0.8).
SIGE_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_sige.json'))['noise_temperature'])" 2>/dev/null || echo 1.0)
SIGE_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_sige.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.02)
run_job eval_sige_r3 \
  timeout 2400 python experiments/eval_sige.py \
  --checkpoint out/sige_1x1x1_r3 --prefer last \
  --data data/sige_diffusion_1x1x1_r3 --samples 256 \
  --noise_temperature "${SIGE_TAU}" --temperature_sigma_max "${SIGE_WIN}"

# 4. MACE retrain, time-capped (VERDICT #4).
run_job mace_si_1x1x1_r3b \
  timeout 2100 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_mace_si_1x1x1_round3.yaml \
  --output out/mace_si_1x1x1_r3b

run_job eval_mace_r3 \
  timeout 1500 python experiments/eval_checkpoint.py \
  --checkpoint out/mace_si_1x1x1_r3b --prefer last --sweep custom \
  --natoms 8 --cell 5.43 5.43 5.43 --steps 500 \
  --data data/si_diffusion_1x1x1 --samples 256 --correctors 3 \
  --noise_temperature 1.1 --sigma_window 0.02 \
  --output experiments/mace_si_1x1x1_eval.json

# 5. Si 2x2x2 reheat-probe validation (expect tau ~1.2, the sweep optimum).
run_job reheat_probe_si \
  timeout 1800 python experiments/probe_reheat.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --data data/si_diffusion_2x2x2 --elements Si --sw Si.sw \
  --cell 10.86 10.86 10.86 --natoms 64 --steps 1000 --correctors 3 \
  --out experiments/reheat_probe_si.json

# 6. Alternative samplers on the shipped Si 2x2x2 checkpoint (VERDICT #7).
run_job alt_samplers \
  timeout 2400 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --sweep round3_samplers --data data/si_diffusion_2x2x2 \
  --output experiments/alt_samplers_si_2x2x2.json

# 7. Re-prime the bench compile cache so the driver's BENCH run is warm.
run_job bench_final timeout 2400 python bench.py

log "=== final queue v2 ALL DONE ==="
