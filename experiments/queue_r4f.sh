#!/bin/bash
# r4f queue: restart of the r4d tail + r4e after the session cut them off,
# prioritized for the remaining round-4 wall clock.
#   A  Si 3x3x3 n=128 eval at the corrector-6 calibration (tau=1.3) — the
#      energy-KS parity gate (VERDICT #1 next-round item)
#   B  lattice-diffusion eval rerun with the VE-consistent L scaling + data
#      prior (the r4c run NaN'd on the reference-parity unscaled updates)
#   C  repaint: trajectory probe, reconstruction control (k=0), and the
#      hole/sites region-init variants at k=8
#   D  fused-MACE arch timing (MFU headline for the Pallas edge kernel)
#   E  adopt the pruned compile cache + warm-bench verify
set -u
cd /root/repo
mkdir -p out

log() { echo "[r4f $(date +%H:%M:%S)] $*" >> out/queue.log; }

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
  sleep 30
}

log "=== r4f queue start ==="
echo $$ > /tmp/queue.pid

# ------------------- A: Si 3x3x3 eval at the c6 probe calibration (tau=1.3)
TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_c6_r4.json'))['noise_temperature'])")
WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_c6_r4.json'))['temperature_sigma_max'])")
run_job eval_si3_c6_r4 \
  timeout 5400 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_3x3x3_checkpoint_r3l_fused --prefer last \
  --sweep custom --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 128 --correctors 6 --batch 16 --force_field 1.5 20.0 \
  --noise_temperature "${TAU}" --sigma_window "${WIN}" \
  --output experiments/si_3x3x3_eval_c6_r4.json

# ------------------- B: lattice-diffusion eval, scaled updates + data prior
run_job lattice_eval_r4f \
  timeout 1800 python experiments/eval_lattice_diffusion.py \
  --checkpoint experiments/lattice_si_1x1x1_r4_checkpoint --prefer best \
  --samples 256 --steps 500 --correctors 3 \
  --out experiments/lattice_diffusion_eval_r4f.json

# ----------------------------------------------- C: repaint probes + ladder
run_job repaint_trajectory_probe \
  timeout 2400 python experiments/repaint_trajectory_probe.py

run_job repaint_ladder_k0 \
  timeout 1500 python experiments/repaint_si_2x2x2.py \
  --samples 16 --batch 16 --repaint_atoms 0 \
  --out experiments/repaint_ladder_k0.json

for INIT in hole sites; do
  run_job "repaint_${INIT}" \
    timeout 1500 python experiments/repaint_si_2x2x2.py \
    --samples 32 --batch 32 --repaint_atoms 8 \
    --start_sigma 0.12 --region_init "${INIT}" \
    --out "experiments/repaint_si_2x2x2_${INIT}.json"
done

# ------------------------------------------- D: fused-MACE arch timing
run_job arch_timing_fused_r4 \
  timeout 2400 python experiments/arch_timing.py --batch 256 --mace_fused \
  --out experiments/arch_timing_r4.json

# -------------------------- E: adopt pruned cache + warm-bench verify
if [ -d .jax_compilation_cache.pruned ]; then
  N=$(ls .jax_compilation_cache.pruned | wc -l)
  if [ "${N}" -ge 3 ]; then
    rm -rf .jax_compilation_cache
    mv .jax_compilation_cache.pruned .jax_compilation_cache
    log "adopted pruned compile cache (${N} entries)"
    run_job bench_warm_verify_r4 timeout 1500 python bench.py
  else
    log "pruned cache too small (${N}); keeping the full cache"
  fi
fi

log "=== r4f queue done ==="
