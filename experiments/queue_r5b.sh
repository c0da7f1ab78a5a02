#!/bin/bash
# r5b queue (round 5): after the r5a bisection+payload —
#   1  SiGe 2x2x2 dataset via the on-device MD generator (VERDICT #3)
#   2  Free-lattice EGNN (new L head) training on Si 1x1x1 + eval (VERDICT #2)
#   3  SiGe 2x2x2 EGNN training + two-species eval at 64 atoms (VERDICT #3)
#   4  Repaint gate r5 runs (fresh + coherent) + committed gate check (VERDICT #5)
set -u
cd /root/repo
mkdir -p out

log() { echo "[r5b $(date +%H:%M:%S)] $*" >> out/queue.log; }

wait_for_tpu() {
  local tries=0
  while true; do
    timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print(float((x @ x).sum()))
" > /dev/null 2>&1 && { log "tpu probe ok; settling 30s"; sleep 30; return 0; }
    tries=$((tries + 1))
    log "tpu probe wedged (try ${tries}); cooling 300s"
    sleep 300
    if [ "$tries" -ge 8 ]; then log "tpu unreachable"; return 1; fi
  done
}

run_job() {
  local name=$1; shift
  wait_for_tpu || { log "SKIP ${name}: no tpu"; return 1; }
  log "start ${name}"
  if "$@" >> "out/${name}.log" 2>&1; then
    log "done ${name}"; return 0
  else
    log "FAILED/timeout ${name} rc=$? (continuing)"; return 1
  fi
}

# Wait for the r5a queue (if still running) to release the TPU.
while [ -f /tmp/queue.pid ] && kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; do
  sleep 60
done
log "=== r5b queue start ==="
echo $$ > /tmp/queue.pid

# ------------------------------------------ 0a: repaint gate r5 (quick, ~5 min)
run_job repaint_gate_r5 \
  timeout 2400 python experiments/repaint_si_2x2x2.py \
  --samples 64 --batch 32 --repaint_atoms 8 \
  --out experiments/repaint_si_2x2x2_r5.json
run_job repaint_gate_coherent_r5 \
  timeout 2400 python experiments/repaint_si_2x2x2.py \
  --samples 64 --batch 32 --repaint_atoms 8 --coherent \
  --out experiments/repaint_si_2x2x2_coherent_r5.json
python experiments/repaint_gate.py \
  experiments/repaint_si_2x2x2_r5.json \
  experiments/repaint_si_2x2x2_coherent_r5.json >> out/repaint_gate_r5.log 2>&1 \
  && log "repaint gate PASS" || log "repaint gate FAIL (see out/repaint_gate_r5.log)"


# ------------------------------------------ 0b: MACE MXU-layout v1 arch timing
run_job arch_timing_r5 \
  timeout 2400 python experiments/arch_timing.py --batch 256 --mace_fused \
  --out experiments/arch_timing_r5.json


# ------------------------------------------ 1: SiGe 2x2x2 dataset (on-device MD)
if [ ! -f data/sige_diffusion_2x2x2/train_run_6.parquet ]; then
  run_job sige_datagen_r5 \
    timeout 3600 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.data.md_generator \
    --output data/sige_diffusion_2x2x2 --system sige --supercell_factor 2 \
    --train_runs 6 --valid_runs 2 --production_steps 10000 --seed 7
else
  log "sige 2x2x2 dataset already present"
fi

# ------------------------------------------ 2: free-lattice EGNN train + eval
run_job lattice_egnn_train_r5 \
  timeout 7200 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_lattice_egnn_si_1x1x1_r5.yaml \
  --output out/lattice_egnn_si_1x1x1_r5
if [ -d out/lattice_egnn_si_1x1x1_r5/best_model ]; then
  rm -rf experiments/lattice_egnn_si_1x1x1_r5_checkpoint
  cp -r out/lattice_egnn_si_1x1x1_r5 experiments/lattice_egnn_si_1x1x1_r5_checkpoint
  log "snapshot -> experiments/lattice_egnn_si_1x1x1_r5_checkpoint"
fi
run_job lattice_egnn_eval_r5 \
  timeout 3600 python experiments/eval_lattice_diffusion.py \
  --checkpoint experiments/lattice_egnn_si_1x1x1_r5_checkpoint --prefer best \
  --samples 256 --correctors 3 \
  --out experiments/lattice_diffusion_eval_r5.json

# ------------------------------------------ 3: SiGe 2x2x2 train + eval
run_job sige_2x2x2_train_r5 \
  timeout 10800 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_sige_2x2x2_r5.yaml \
  --output out/sige_2x2x2_r5
if [ -d out/sige_2x2x2_r5/best_model ]; then
  rm -rf experiments/sige_2x2x2_r5_checkpoint
  cp -r out/sige_2x2x2_r5 experiments/sige_2x2x2_r5_checkpoint
  log "snapshot -> experiments/sige_2x2x2_r5_checkpoint"
fi
run_job sige_2x2x2_eval_r5 \
  timeout 7200 python experiments/eval_sige.py \
  --checkpoint experiments/sige_2x2x2_r5_checkpoint --prefer best \
  --natoms 64 --cell 11.086 11.086 11.086 --samples 256 --steps 1000 \
  --out experiments/sige_2x2x2_eval_r5.json

log "=== r5b queue done ==="
