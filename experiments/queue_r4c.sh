#!/bin/bash
# r4c queue: runs after r4b. Lattice-diffusion retrain with the fixed
# validation-sampling callback (the 24-epoch r4b run died on an inf-range
# histogram of early degenerate samples), repaint-variant experiments
# (partial-denoising start and RePaint resampling — the r4b repaint showed
# the translation-invariant model commits to its own registry under full
# noise), and the end-of-round compile-cache prune + warm bench.
set -u
cd /root/repo
mkdir -p out

log() { echo "[r4c $(date +%H:%M:%S)] $*" >> out/queue.log; }

wait_for_r4b() {
  while ! grep -q "r4b queue done" out/queue.log 2>/dev/null; do sleep 120; done
}

wait_for_tpu() {
  local tries=0
  while true; do
    timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print(float((x @ x).sum()))
" > /dev/null 2>&1 && { log "tpu probe ok; settling 120s"; sleep 120; return 0; }
    tries=$((tries + 1))
    log "tpu probe wedged (try ${tries}); cooling 600s"
    sleep 600
    if [ "$tries" -ge 4 ]; then log "tpu unreachable after ${tries} tries"; return 1; fi
  done
}

run_job() {
  local name=$1; shift
  wait_for_tpu || { log "SKIP ${name}: no tpu"; return 1; }
  log "start ${name}"
  if "$@" >> "out/${name}.log" 2>&1; then
    log "done ${name}"
  else
    log "FAILED/timeout ${name} rc=$? (continuing)"
  fi
  sleep 120
}

wait_for_r4b
log "=== r4c queue start ==="
echo $$ > /tmp/queue.pid

# --------------------------- A: lattice retrain (fixed callback) + eval
rm -rf out/lattice_si_1x1x1
run_job lattice_train_r4c \
  timeout 4500 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_lattice_si_1x1x1_r4.yaml \
  --output out/lattice_si_1x1x1
if [ -d out/lattice_si_1x1x1/last_model ]; then
  rm -rf experiments/lattice_si_1x1x1_r4_checkpoint
  cp -r out/lattice_si_1x1x1 experiments/lattice_si_1x1x1_r4_checkpoint
  log "snapshot -> experiments/lattice_si_1x1x1_r4_checkpoint"
  run_job lattice_eval_r4c \
    timeout 3600 python experiments/eval_lattice_diffusion.py \
    --checkpoint experiments/lattice_si_1x1x1_r4_checkpoint --prefer best \
    --samples 256 \
    --out experiments/lattice_diffusion_eval_r4.json
fi

# ------------------- B: repaint variants on the Si 2x2x2 checkpoint
# (b1) partial-denoising start: registry anchored by the constraint frame.
run_job repaint_start_sigma_r4 \
  timeout 3600 python experiments/repaint_si_2x2x2.py \
  --samples 64 --batch 32 --start_sigma 0.1 \
  --out experiments/repaint_si_2x2x2_startsigma.json

# (b2) RePaint resampling U=1+4 from full noise (cold compile ~20 min).
run_job repaint_resample_r4 \
  timeout 5400 python experiments/repaint_si_2x2x2.py \
  --samples 64 --batch 32 --resample_steps 4 \
  --out experiments/repaint_si_2x2x2_resample.json

# --------------------------------- C: prune the committed compile cache
run_job prune_cache_r4 \
  timeout 3600 python experiments/prune_compile_cache.py
if [ -d .jax_compilation_cache.pruned ]; then
  du -sh .jax_compilation_cache .jax_compilation_cache.pruned >> out/queue.log
fi

log "=== r4c queue done ==="
