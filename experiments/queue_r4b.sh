#!/bin/bash
# r4b queue: the remaining round-4 TPU stages, serialized with claim-settle
# gaps (a clean axon exit frees the claim in ~1-2 min; attaching into the
# dirty window wedges the client — round-3 operational finding).
#
#   B  repaint gate on the Si 2x2x2 production checkpoint (VERDICT #3)
#   C  lattice-diffusion train + eval on Si 1x1x1 (VERDICT #4)
#   D  AL campaign rehearsal on SiGe with real repaint + SW labels (VERDICT #5)
#   E  MACE stage profile (VERDICT #6 measurement)
set -u
cd /root/repo
mkdir -p out

log() { echo "[r4b $(date +%H:%M:%S)] $*" >> out/queue.log; }

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

log "=== r4b queue start ==="
echo $$ > /tmp/queue.pid

# ---------------------------------------------- B: repaint fidelity gate
run_job repaint_si2_r4 \
  timeout 3600 python experiments/repaint_si_2x2x2.py \
  --samples 64 --batch 32 \
  --out experiments/repaint_si_2x2x2.json

# ------------------------------------- C: lattice-diffusion train + eval
rm -rf out/lattice_si_1x1x1
run_job lattice_train_r4 \
  timeout 4500 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_lattice_si_1x1x1_r4.yaml \
  --output out/lattice_si_1x1x1
if [ -d out/lattice_si_1x1x1/last_model ]; then
  rm -rf experiments/lattice_si_1x1x1_r4_checkpoint
  cp -r out/lattice_si_1x1x1 experiments/lattice_si_1x1x1_r4_checkpoint
  log "snapshot out/lattice_si_1x1x1 -> experiments/lattice_si_1x1x1_r4_checkpoint"
  run_job lattice_eval_r4 \
    timeout 3600 python experiments/eval_lattice_diffusion.py \
    --checkpoint experiments/lattice_si_1x1x1_r4_checkpoint --prefer best \
    --samples 256 \
    --out experiments/lattice_diffusion_eval_r4.json
fi

# ------------------------------------------- D: AL campaign rehearsal
run_job al_campaign_r4 \
  timeout 5400 python experiments/al_campaign_sige_r4.py

# ------------------------------------------------- E: MACE stage profile
run_job mace_profile_r4 \
  timeout 3600 python experiments/mace_profile.py --batch 256

# ------------- F: Si 3x3x3 corrector-budget probe (bistability follow-up)
# The r4a probe found a cliff at tau ~ 1.0006: the ensemble is a mixture of
# an ordered (cold, ratio 0.80) and a melted branch no tau can separate.
# More corrector substeps add thermalization budget at each noise level —
# probe whether correctors=6 moves the ordered branch's ratio toward 1.
run_job probe_si3_c6_r4 \
  timeout 4500 python experiments/probe_reheat.py \
  --checkpoint experiments/si_3x3x3_checkpoint_r3l_fused --prefer last \
  --data data/si_diffusion_3x3x3 --elements Si --sw Si.sw \
  --cell 16.29 16.29 16.29 --natoms 216 --steps 1000 --correctors 6 \
  --samples 16 --batch 16 --force_field 1.5 20.0 --max_probes 4 \
  --out experiments/reheat_probe_si3x3x3_c6_r4.json

log "=== r4b queue done ==="
