#!/bin/bash
# Si 3x3x3 resume + probe + eval stage, invoked by tpu_queue_r3k.sh with
# the insurance probe's (tau, window) as fallback calibration.
#
# Fused-first: the 40-epoch checkpoint was migrated to the Pallas-fused
# EGNN layout (experiments/convert_si3_to_fused.py) because the original
# config ran the dense path whose (B,216,216,513) f32 edge concat crosses
# 2^31 bytes at batch 32 (the round-3 worker fault). The fused kernel keeps
# per-pair activations in VMEM in both directions. If the fused resume
# fails on the real TPU (first N=216 fused run), fall back to the unfused
# checkpoint so the round still gets its resumed-eval number.
set -u
cd /root/repo
mkdir -p out

SI3_TAU="${1:-0.9}"
SI3_WIN="${2:-0.0133}"
START_DEADLINE=2250

log() { echo "[r3k-si3 $(date +%H:%M:%S)] $*" >> out/queue.log; }

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

# ----------------------------------------------- train: fused first
CKPT_DIR=""
if [ -d experiments/si_3x3x3_checkpoint_fused/last_model ]; then
  if [ ! -d out/si_3x3x3_fused ]; then
    cp -r experiments/si_3x3x3_checkpoint_fused out/si_3x3x3_fused
    log "seeded out/si_3x3x3_fused from the migrated 40-epoch snapshot"
  fi
  TRAIN_BUDGET=$(secs_until 20:45)
  if [ "${TRAIN_BUDGET}" -ge 1800 ]; then
    log "si3 FUSED train budget ${TRAIN_BUDGET}s (until 20:45)"
    run_job si3_train_r3k_fused \
      timeout "${TRAIN_BUDGET}" python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
      --config experiments/config_si_3x3x3_r3k_fused.yaml \
      --output out/si_3x3x3_fused
    # Fused path proven iff at least one epoch completed on the TPU.
    if grep -q "epoch 4[0-9]*:" out/si3_train_r3k_fused.log 2>/dev/null; then
      CKPT_DIR=out/si_3x3x3_fused
      snapshot out/si_3x3x3_fused experiments/si_3x3x3_checkpoint_r3k
      log "fused resume trained: probe/eval use ${CKPT_DIR}"
    else
      log "fused resume made no epoch progress; falling back to unfused"
    fi
  else
    log "SKIP si3_train_r3k_fused: budget ${TRAIN_BUDGET}s < 1800s"
  fi
fi

# ------------------------------------------- fallback: unfused resume
if [ -z "${CKPT_DIR}" ]; then
  if [ ! -d out/si_3x3x3 ]; then
    cp -r experiments/si_3x3x3_checkpoint out/si_3x3x3
    rm -f out/si_3x3x3/config_backup.yaml
    log "seeded out/si_3x3x3 from the 40-epoch snapshot"
  fi
  TRAIN_BUDGET=$(secs_until 20:45)
  if [ "${TRAIN_BUDGET}" -ge 1800 ]; then
    log "si3 UNFUSED train budget ${TRAIN_BUDGET}s (until 20:45)"
    run_job si3_train_r3k \
      timeout "${TRAIN_BUDGET}" python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
      --config experiments/config_si_3x3x3_r3i.yaml \
      --output out/si_3x3x3
    snapshot out/si_3x3x3 experiments/si_3x3x3_checkpoint_r3k
  else
    log "SKIP si3_train_r3k: budget ${TRAIN_BUDGET}s < 1800s"
  fi
  # Even without training time, probe/eval the seed if it exists.
  [ -d out/si_3x3x3/last_model ] && CKPT_DIR=out/si_3x3x3
fi

# ----------------------------- probe + eval on the resumed checkpoint
if [ -n "${CKPT_DIR}" ] && [ -d "${CKPT_DIR}/last_model" ]; then
  run_job probe_si3_r3k \
    timeout 2700 python experiments/probe_reheat.py \
    --checkpoint "${CKPT_DIR}" --prefer last \
    --data data/si_diffusion_3x3x3 --elements Si --sw Si.sw \
    --cell 16.29 16.29 16.29 --natoms 216 --steps 1000 --correctors 3 \
    --samples 16 --batch 16 --force_field 1.5 20.0 \
    --out experiments/reheat_probe_si3x3x3_r3k.json

  SI3B_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_r3k.json'))['noise_temperature'])" 2>/dev/null || echo "${SI3_TAU}")
  SI3B_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_r3k.json'))['temperature_sigma_max'])" 2>/dev/null || echo "${SI3_WIN}")
  EVAL_BUDGET=$(secs_until 23:25)
  run_job eval_si3_r3k \
    timeout "${EVAL_BUDGET}" python experiments/eval_checkpoint.py \
    --checkpoint "${CKPT_DIR}" --prefer last --sweep custom \
    --natoms 216 --cell 16.29 16.29 16.29 \
    --data data/si_diffusion_3x3x3 \
    --samples 64 --correctors 3 --batch 16 --force_field 1.5 20.0 \
    --noise_temperature "${SI3B_TAU}" --sigma_window "${SI3B_WIN}" \
    --output experiments/si_3x3x3_eval_r3k.json
fi

# Re-run the arch timing with the scan-amortized measurement (the first
# run's single-dispatch numbers were dominated by axon dispatch latency).
run_job arch_timing2 \
  timeout 2400 python experiments/arch_timing.py --batch 256
