#!/bin/bash
# Round-3 session-C queue, part 2 (replaces the tail of tpu_queue_r3c.sh).
# Changes vs r3c: the MACE eval at a guessed tau=1.1 gave KS 0.756 with a
# fat cold tail — insert a reheat-probe -> re-eval chain for MACE; keep the
# rest (alt samplers, Si 3x3x3, SiGe retrain, bench re-prime).
set -u
cd /root/repo
mkdir -p out

log() { echo "[r3d $(date +%H:%M:%S)] $*" >> out/queue.log; }

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

snapshot_ckpt() {
  local src=$1 dst=$2
  if [ -d "${src}/last_model" ]; then
    rm -rf "${dst}"
    mkdir -p "${dst}"
    cp -r "${src}/last_model" "${dst}/last_model"
    [ -f "${src}/config_backup.yaml" ] && cp "${src}/config_backup.yaml" "${dst}/"
    log "snapshot ${src} -> ${dst}"
  else
    log "snapshot SKIP: ${src}/last_model missing"
  fi
}

log "=== r3d queue start ==="

# 1. Alternative samplers on the shipped Si 2x2x2 checkpoint (VERDICT #7).
run_job alt_samplers \
  timeout 2700 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --sweep round3_samplers --data data/si_diffusion_2x2x2 \
  --output experiments/alt_samplers_si_2x2x2.json

# 2. MACE reheat probe (the tau=1.1 guess sampled cold with a fat tail).
run_job probe_mace \
  timeout 2400 python experiments/probe_reheat.py \
  --checkpoint out/mace_si_1x1x1_r3b --prefer last \
  --data data/si_diffusion_1x1x1 --elements Si --sw Si.sw \
  --cell 5.43 5.43 5.43 --natoms 8 --steps 500 --correctors 3 \
  --out experiments/reheat_probe_mace.json

MACE_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_mace.json'))['noise_temperature'])" 2>/dev/null || echo 1.1)
MACE_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_mace.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.02)
run_job eval_mace_r3b \
  timeout 2100 python experiments/eval_checkpoint.py \
  --checkpoint out/mace_si_1x1x1_r3b --prefer last --sweep custom \
  --natoms 8 --cell 5.43 5.43 5.43 --steps 500 \
  --data data/si_diffusion_1x1x1 --samples 256 --correctors 3 \
  --noise_temperature "${MACE_TAU}" --sigma_window "${MACE_WIN}" \
  --output experiments/mace_si_1x1x1_eval_probed.json

# 3. Si 3x3x3 from scratch (216 atoms; VERDICT #3).
run_job si_3x3x3_r3c \
  timeout 11000 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_si_3x3x3.yaml \
  --output out/si_3x3x3
snapshot_ckpt out/si_3x3x3 experiments/si_3x3x3_checkpoint

run_job probe_si3 \
  timeout 2400 python experiments/probe_reheat.py \
  --checkpoint out/si_3x3x3 --prefer last \
  --data data/si_diffusion_3x3x3 --elements Si --sw Si.sw \
  --cell 16.29 16.29 16.29 --natoms 216 --steps 1000 --correctors 3 \
  --samples 32 \
  --out experiments/reheat_probe_si3x3x3.json

SI3_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3.json'))['noise_temperature'])" 2>/dev/null || echo 1.22)
SI3_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.006)
run_job eval_si3 \
  timeout 3600 python experiments/eval_checkpoint.py \
  --checkpoint out/si_3x3x3 --prefer last --sweep custom \
  --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 64 --correctors 3 \
  --noise_temperature "${SI3_TAU}" --sigma_window "${SI3_WIN}" \
  --output experiments/si_3x3x3_eval.json

# 4. SiGe retrain (the 347-epoch checkpoint was lost with out/).
run_job sige_r3c \
  timeout 4800 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_sige_1x1x1_round3.yaml \
  --output out/sige_1x1x1_r3
snapshot_ckpt out/sige_1x1x1_r3 experiments/sige_1x1x1_r3_checkpoint

run_job probe_sige_r3c \
  timeout 2400 python experiments/probe_reheat.py \
  --checkpoint out/sige_1x1x1_r3 --prefer last \
  --data data/sige_diffusion_1x1x1_r3 --elements Si Ge --sw SiGe.sw \
  --cell 5.5415 5.5415 5.5415 --natoms 8 --steps 500 --correctors 3 \
  --out experiments/reheat_probe_sige_r3c.json

SIGE_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_sige_r3c.json'))['noise_temperature'])" 2>/dev/null || echo 0.8)
SIGE_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_sige_r3c.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.022)
run_job eval_sige_r3c \
  timeout 2700 python experiments/eval_sige.py \
  --checkpoint out/sige_1x1x1_r3 --prefer last \
  --data data/sige_diffusion_1x1x1_r3 --samples 256 \
  --noise_temperature "${SIGE_TAU}" --temperature_sigma_max "${SIGE_WIN}"

# 5. Re-prime the bench compile cache so the driver's BENCH run is warm.
run_job bench_final timeout 2400 python bench.py

log "=== r3d queue ALL DONE ==="
