#!/bin/bash
# r3l: end-of-round fused Si 3x3x3 resume, gated by the Mosaic row-block fix.
#
# The r3k fused resume died at trace time because _forward_block_rows picked
# 18 rows (a divisor of 216 within the pair budget) and Mosaic rejects VMEM
# blocks whose second-to-last dim is not a multiple of 8. With the fix the
# selector returns 8, so this stage (1) migrates the freshest unfused
# checkpoint (epoch 108) to the fused layout on CPU, (2) resumes fused
# training on the TPU until 23:24, (3) snapshots for round 4. The r3i
# watchdog kills /tmp/queue.pid at 23:35 and runs the warm driver bench.
set -u
cd /root/repo
mkdir -p out

log() { echo "[r3l $(date +%H:%M:%S)] $*" >> out/queue.log; }

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
    if [ "$tries" -ge 3 ]; then log "tpu unreachable after ${tries} tries"; return 1; fi
  done
}

log "=== r3l stage start ==="
echo $$ > /tmp/queue.pid
log "r3l installed as /tmp/queue.pid ($$)"

# ------------------------------------------ 1. CPU: migrate epoch-108 ckpt
if timeout 1200 python experiments/convert_si3_to_fused.py \
    --source experiments/si_3x3x3_checkpoint_r3k \
    --dest experiments/si_3x3x3_checkpoint_fused_e108 \
    > out/convert_e108.log 2>&1; then
  log "migrated epoch-108 checkpoint to fused layout"
else
  log "ABORT: conversion failed (out/convert_e108.log)"
  exit 1
fi

rm -rf out/si_3x3x3_fused
mkdir -p out/si_3x3x3_fused
cp -r experiments/si_3x3x3_checkpoint_fused_e108/last_model out/si_3x3x3_fused/
cp experiments/si_3x3x3_checkpoint_r3k/metrics.csv out/si_3x3x3_fused/ 2>/dev/null
log "seeded out/si_3x3x3_fused from the migrated epoch-108 snapshot"

# --------------------------------------------- 2. TPU: fused resume train
wait_for_tpu || { log "ABORT: no tpu"; exit 1; }
TRAIN_BUDGET=$(secs_until 23:24)
log "si3 FUSED train budget ${TRAIN_BUDGET}s (until 23:24)"
timeout "${TRAIN_BUDGET}" python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_si_3x3x3_r3l_fused.yaml \
  --output out/si_3x3x3_fused \
  > out/si3_train_r3l_fused.log 2>&1
RC=$?
log "fused train exited rc=${RC} (124 = wall-clock timeout, expected)"

# ----------------------------------------------------------- 3. snapshot
if [ -d out/si_3x3x3_fused/last_model ]; then
  rm -rf experiments/si_3x3x3_checkpoint_r3l_fused
  cp -r out/si_3x3x3_fused experiments/si_3x3x3_checkpoint_r3l_fused
  log "snapshot out/si_3x3x3_fused -> experiments/si_3x3x3_checkpoint_r3l_fused"
fi
LAST_EPOCH=$(awk -F, '$13 != "" {e=$13} END {print e}' out/si_3x3x3_fused/metrics.csv 2>/dev/null)
log "=== r3l stage done (last epoch ${LAST_EPOCH:-none}) ==="
