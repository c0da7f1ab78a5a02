#!/bin/bash
# r4g queue: post-epsilon-fix TPU passes while the round is still open.
#   A  Repaint gate on TPU at n=64 (fixed epsilon) + coherent ablation
#   B  Si 3x3x3 corrector-8 n=128 eval at tau=1.3 (push the 0.176 tail)
#   C  Free-lattice MLP retrain, 400 epochs, then eval with the data prior
set -u
cd /root/repo
mkdir -p out

log() { echo "[r4g $(date +%H:%M:%S)] $*" >> out/queue.log; }

wait_for_tpu() {
  local tries=0
  while true; do
    timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print(float((x @ x).sum()))
" > /dev/null 2>&1 && { log "tpu probe ok; settling 60s"; sleep 60; return 0; }
    tries=$((tries + 1))
    log "tpu probe wedged (try ${tries}); cooling 300s"
    sleep 300
    if [ "$tries" -ge 4 ]; then log "tpu unreachable"; return 1; fi
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
  sleep 30
}

log "=== r4g queue start ==="
echo $$ > /tmp/queue.pid

run_job repaint_gate_tpu_r4g \
  timeout 1200 python experiments/repaint_si_2x2x2.py \
  --samples 64 --batch 32 --repaint_atoms 8 \
  --out experiments/repaint_si_2x2x2_tpu_r4g.json

run_job repaint_gate_coherent_r4g \
  timeout 1200 python experiments/repaint_si_2x2x2.py \
  --samples 64 --batch 32 --repaint_atoms 8 --coherent \
  --out experiments/repaint_si_2x2x2_coherent_r4g.json

run_job eval_si3_c8_r4g \
  timeout 7200 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_3x3x3_checkpoint_r3l_fused --prefer last \
  --sweep custom --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 128 --correctors 8 --batch 16 --force_field 1.5 20.0 \
  --noise_temperature 1.3 --sigma_window 0.01332947938261649 \
  --output experiments/si_3x3x3_eval_c8_r4g.json

run_job lattice_train_r4g \
  timeout 3600 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_lattice_si_1x1x1_r4g.yaml \
  --output out/lattice_si_1x1x1_r4g

if [ -d out/lattice_si_1x1x1_r4g/best_model ]; then
  rm -rf experiments/lattice_si_1x1x1_r4g_checkpoint
  cp -r out/lattice_si_1x1x1_r4g experiments/lattice_si_1x1x1_r4g_checkpoint
  log "snapshot -> experiments/lattice_si_1x1x1_r4g_checkpoint"
fi

run_job lattice_eval_r4g \
  timeout 1800 python experiments/eval_lattice_diffusion.py \
  --checkpoint experiments/lattice_si_1x1x1_r4g_checkpoint --prefer best \
  --samples 256 --steps 500 --correctors 3 \
  --out experiments/lattice_diffusion_eval_r4g.json

log "=== r4g queue done ==="
