#!/bin/bash
# r5a queue: first TPU queue of round 5 — run the round-4 tail's fixes at
# production scale.
#   A  Repaint gate at scale (n=64, k=8, fixed epsilon) — the CPU n=4 run
#      already closes the gate (E/atom -4.291); this is the
#      statistics-bearing version, plus the coherent-renoising ablation.
#   B  Si 3x3x3 corrector-8 eval at tau=1.3 (c6 landed energy-KS 0.176;
#      the residual is a defect tail that corrector budget addresses).
#   C  Lattice-diffusion eval is already stable (5.34 +/- 0.11 A); retrain
#      the free-lattice model longer/bigger for L-head contraction.
set -u
cd /root/repo
mkdir -p out

log() { echo "[r5a $(date +%H:%M:%S)] $*" >> out/queue.log; }

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
    if [ "$tries" -ge 6 ]; then log "tpu unreachable"; return 1; fi
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

log "=== r5a queue start ==="
echo $$ > /tmp/queue.pid

# -------------------- A: repaint gate at scale (fixed epsilon is default)
run_job repaint_gate_r5 \
  timeout 2400 python experiments/repaint_si_2x2x2.py \
  --samples 64 --batch 32 --repaint_atoms 8 \
  --out experiments/repaint_si_2x2x2_r5.json

run_job repaint_gate_coherent_r5 \
  timeout 2400 python experiments/repaint_si_2x2x2.py \
  --samples 64 --batch 32 --repaint_atoms 8 --coherent \
  --out experiments/repaint_si_2x2x2_coherent_r5.json

# ------------------------------- B: Si 3x3x3 corrector-8 eval at tau=1.3
run_job eval_si3_c8_r5 \
  timeout 7200 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_3x3x3_checkpoint_r3l_fused --prefer last \
  --sweep custom --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 128 --correctors 8 --batch 16 --force_field 1.5 20.0 \
  --noise_temperature 1.3 --sigma_window 0.01332947938261649 \
  --output experiments/si_3x3x3_eval_c8_r5.json

log "=== r5a queue done ==="
