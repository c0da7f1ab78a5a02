#!/bin/bash
# Round-3 session-C TPU queue. The VM restart wiped out/ (gitignored), so the
# SiGe-r3 (347 ep), Si-3x3x3 (8 ep) and MACE training checkpoints are gone;
# this queue retrains them and SNAPSHOTS every trained checkpoint into
# experiments/ so a restart never loses a model again.
# Axon-claim discipline (see tpu_queue_r3_final.sh header): one client at a
# time, probe-gate every job, long cooldown after a SIGKILL'd (timed-out) job.
set -u
cd /root/repo
mkdir -p out

log() { echo "[r3c $(date +%H:%M:%S)] $*" >> out/queue.log; }

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

# Copy a trained checkpoint out of gitignored out/ into experiments/ so it
# survives restarts and can be committed.
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

log "=== r3c queue start ==="

# 1. MACE retrain with the fixed true-geometry pair grid (VERDICT #4).
run_job mace_r3c \
  timeout 2400 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_mace_si_1x1x1_round3.yaml \
  --output out/mace_si_1x1x1_r3b
snapshot_ckpt out/mace_si_1x1x1_r3b experiments/mace_si_1x1x1_r3_checkpoint

run_job eval_mace_r3 \
  timeout 2100 python experiments/eval_checkpoint.py \
  --checkpoint out/mace_si_1x1x1_r3b --prefer last --sweep custom \
  --natoms 8 --cell 5.43 5.43 5.43 --steps 500 \
  --data data/si_diffusion_1x1x1 --samples 256 --correctors 3 \
  --noise_temperature 1.1 --sigma_window 0.02 \
  --output experiments/mace_si_1x1x1_eval.json

# 2. Si 2x2x2 reheat-probe validation on the committed round-2 checkpoint
#    (expect tau ~1.2, the sweep optimum — closes the probe-validation loop).
run_job reheat_probe_si \
  timeout 2400 python experiments/probe_reheat.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --data data/si_diffusion_2x2x2 --elements Si --sw Si.sw \
  --cell 10.86 10.86 10.86 --natoms 64 --steps 1000 --correctors 3 \
  --out experiments/reheat_probe_si.json

# 3. Alternative samplers on the shipped Si 2x2x2 checkpoint (VERDICT #7).
run_job alt_samplers \
  timeout 2700 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --sweep round3_samplers --data data/si_diffusion_2x2x2 \
  --output experiments/alt_samplers_si_2x2x2.json

# 4. Si 3x3x3 from scratch (216 atoms; VERDICT #3). Checkpoints every epoch;
#    12000 s cap, then snapshot whatever it reached.
run_job si_3x3x3_r3c \
  timeout 12000 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
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

# 5. SiGe retrain (the 347-epoch checkpoint was lost with out/). Loss had
#    plateaued from ~epoch 200; a 5400 s cap gets us into the plateau.
run_job sige_r3c \
  timeout 5400 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
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

# 6. Re-prime the bench compile cache so the driver's BENCH run is warm.
run_job bench_final timeout 2400 python bench.py

log "=== r3c queue ALL DONE ==="
