#!/bin/bash
# Round-3 TPU queue, final priority order. One axon client at a time with
# cooldowns between jobs (the claim wedges when clients overlap or die
# without a zero-client grace window). Time-capped trainings: the trainer
# checkpoints every epoch, so a timeout still leaves a usable last_model.
set -u
cd /root/repo

log() { echo "[final $(date +%H:%M:%S)] $*" >> out/queue.log; }

run_job() {
  local name=$1; shift
  log "start ${name}"
  if "$@" >> "out/${name}.log" 2>&1; then
    log "done ${name}"
  else
    log "FAILED/timeout ${name} (continuing)"
  fi
  sleep 120  # let the axon claim release before the next client attaches
}

log "=== final queue start ==="

# 1. SiGe: reheat probe + 256-sample final eval on the epoch-347 checkpoint
#    (VERDICT #2, the fidelity gate).
run_job reheat_probe_sige \
  timeout 2400 python experiments/probe_reheat.py \
  --checkpoint out/sige_1x1x1_r3 --prefer last \
  --data data/sige_diffusion_1x1x1_r3 --elements Ge Si --sw SiGe.sw \
  --cell 5.543 5.543 5.543 --natoms 8 --steps 500 --correctors 3 \
  --out experiments/reheat_probe_sige.json

SIGE_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_sige.json'))['noise_temperature'])" 2>/dev/null || echo 1.22)
SIGE_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_sige.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.02)
log "sige tau=${SIGE_TAU} window=${SIGE_WIN}"

run_job eval_sige_r3 \
  timeout 2400 python experiments/eval_sige.py \
  --checkpoint out/sige_1x1x1_r3 --prefer last \
  --data data/sige_diffusion_1x1x1_r3 --samples 256 \
  --noise_temperature "${SIGE_TAU}" --temperature_sigma_max "${SIGE_WIN}"

# 2. Si 3x3x3 training, time-capped (resumes from epoch 9; VERDICT #3).
run_job si_3x3x3_b \
  timeout 3300 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_si_3x3x3.yaml \
  --output out/si_3x3x3

# 3. Si 3x3x3 eval: 64 samples in 32-chunks at the default temperature plus
#    a light probe is too slow at N=216; evaluate directly with the
#    schedule-window default and tau from the Si 2x2x2 optimum.
run_job eval_si3 \
  timeout 3300 python experiments/eval_checkpoint.py \
  --checkpoint out/si_3x3x3 --prefer last --sweep custom \
  --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 64 --correctors 3 \
  --noise_temperature 1.22 --sigma_window 0.006 \
  --output experiments/si_3x3x3_eval.json

# 4. MACE retrain, time-capped (VERDICT #4; fresh dir — network changed).
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

log "=== final queue ALL DONE ==="
