#!/bin/bash
# r4e queue: repaint failure-scale ladder on the Si 2x2x2 checkpoint.
# Both repaint variants (full noise, start_sigma=0.1) leave the generated
# atoms near-uniform while the constraints are exact — run the size ladder
# (0 = pure reconstruction, then 1, 2, 4 repainted atoms) to find whether
# the machinery corrupts even a fully-constrained trajectory or the failure
# scales with the repainted fraction.
set -u
cd /root/repo
mkdir -p out

log() { echo "[r4e $(date +%H:%M:%S)] $*" >> out/queue.log; }

wait_for_r4d() {
  while ! grep -q "r4d queue done" out/queue.log 2>/dev/null; do sleep 120; done
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

wait_for_r4d
log "=== r4e queue start ==="
echo $$ > /tmp/queue.pid

wait_for_tpu || { log "ABORT: no tpu"; exit 1; }

log "repaint trajectory probe"
timeout 3600 python experiments/repaint_trajectory_probe.py \
  > out/repaint_trajectory_probe.log 2>&1
log "trajectory probe rc=$?"
sleep 60

for K in 0 1 2 4; do
  log "repaint ladder k=${K}"
  timeout 1800 python experiments/repaint_si_2x2x2.py \
    --samples 16 --batch 16 --repaint_atoms "${K}" \
    --out "experiments/repaint_ladder_k${K}.json" \
    > "out/repaint_ladder_k${K}.log" 2>&1
  log "ladder k=${K} rc=$?"
  sleep 30
done

# Hole-seeded partial denoising: the r4 score-field probe shows the learned
# low-sigma score cannot navigate atoms far from any site (VE sigma_max
# never erases positions), so seed the generated slots inside the carved
# sphere and let 500 steps of constrained denoising arrange them.
for INIT in hole sites; do
  log "repaint k=8 region_init=${INIT}"
  timeout 1800 python experiments/repaint_si_2x2x2.py \
    --samples 32 --batch 32 --repaint_atoms 8 \
    --start_sigma 0.12 --region_init "${INIT}" \
    --out "experiments/repaint_si_2x2x2_${INIT}.json" \
    > "out/repaint_${INIT}.log" 2>&1
  log "repaint ${INIT} rc=$?"
  sleep 30
done
log "=== r4e queue done ==="
