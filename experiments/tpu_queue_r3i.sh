#!/bin/bash
# Round-3 session-F queue (r3i). The environment restarted before
# tpu_queue_r3h.sh could run (out/ wiped, fresh 12h window ending 00:14
# UTC), so this queue re-plans stage H with the extra time:
#   1. MACE: resume 186 -> 500 epochs from the committed snapshot, then
#      the FF probe + 256-sample eval chain (VERDICT #4 gate: KS <= 0.2).
#   2. Si 3x3x3 insurance: FF probe + n=64 eval on the committed
#      40-epoch checkpoint (guarantees a VERDICT #3 number early).
#   3. Si 3x3x3: resume 40 -> 120 epochs (~3.4h), re-probe, eval n=64.
#   4. Adaptive corrector @ 5 substeps on the production Si 2x2x2
#      checkpoint (the exact-score convergence threshold, VERDICT #7).
#   5. Warm bench to refresh the compile cache for the driver capture.
# Resuming past a snapshot's max_epoch is a deliberate config change, so
# each resume deletes the stale config_backup.yaml (the strict diff check
# exists for accidental drift, not planned extensions).
set -u
cd /root/repo
mkdir -p out

START_DEADLINE=2250   # don't start a new job after 22:50 (watchdog 23:35)

log() { echo "[r3i $(date +%H:%M:%S)] $*" >> out/queue.log; }

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

log "=== r3i queue start ==="

# ---------------------------------------------------------- 1. MACE chain
# Seed out/ from the committed 186-epoch snapshot; drop the stale backup
# (max_epoch 200) so the 500-epoch resume is accepted.
if [ ! -d out/mace_si_1x1x1_r3b ]; then
  cp -r experiments/mace_si_1x1x1_r3_checkpoint out/mace_si_1x1x1_r3b
  rm -f out/mace_si_1x1x1_r3b/config_backup.yaml
  log "seeded out/mace_si_1x1x1_r3b from the 186-epoch snapshot"
fi

run_job mace_r3i \
  timeout 7200 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_mace_si_1x1x1_r3h.yaml \
  --output out/mace_si_1x1x1_r3b
snapshot out/mace_si_1x1x1_r3b experiments/mace_si_1x1x1_r3h_checkpoint

# Per-checkpoint FF probe on the resumed model.
run_job probe_mace_r3i \
  timeout 2400 python experiments/probe_reheat.py \
  --checkpoint out/mace_si_1x1x1_r3b --prefer last \
  --data data/si_diffusion_1x1x1 --elements Si --sw Si.sw \
  --cell 5.43 5.43 5.43 --natoms 8 --steps 500 --correctors 3 \
  --force_field 1.5 20.0 \
  --out experiments/reheat_probe_mace_r3h.json

# 256-sample eval at the probed tau.
MACE_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_mace_r3h.json'))['noise_temperature'])" 2>/dev/null || echo 1.44)
MACE_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_mace_r3h.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.0285)
run_job eval_mace_r3i \
  timeout 2400 python experiments/eval_checkpoint.py \
  --checkpoint out/mace_si_1x1x1_r3b --prefer last \
  --sweep custom --natoms 8 --cell 5.43 5.43 5.43 --steps 500 \
  --data data/si_diffusion_1x1x1 --samples 256 --correctors 3 \
  --noise_temperature "${MACE_TAU}" --sigma_window "${MACE_WIN}" \
  --force_field 1.5 20.0 \
  --output experiments/mace_si_1x1x1_eval_r3h.json

# ------------------------------------ 2. Si 3x3x3 insurance (40-epoch ckpt)
run_job probe_si3_ff \
  timeout 3000 python experiments/probe_reheat.py \
  --checkpoint experiments/si_3x3x3_checkpoint --prefer last \
  --data data/si_diffusion_3x3x3 --elements Si --sw Si.sw \
  --cell 16.29 16.29 16.29 --natoms 216 --steps 1000 --correctors 3 \
  --samples 16 --batch 16 --force_field 1.5 20.0 \
  --out experiments/reheat_probe_si3x3x3_ff.json

SI3_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_ff.json'))['noise_temperature'])" 2>/dev/null || echo 0.9)
SI3_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_ff.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.0133)
run_job eval_si3_ff \
  timeout 4200 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_3x3x3_checkpoint --prefer last --sweep custom \
  --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 64 --correctors 3 --batch 16 --force_field 1.5 20.0 \
  --noise_temperature "${SI3_TAU}" --sigma_window "${SI3_WIN}" \
  --output experiments/si_3x3x3_eval_ff.json

# -------------------------------------- 3. Si 3x3x3 resume 40 -> 120 epochs
if [ ! -d out/si_3x3x3 ]; then
  cp -r experiments/si_3x3x3_checkpoint out/si_3x3x3
  rm -f out/si_3x3x3/config_backup.yaml
  log "seeded out/si_3x3x3 from the 40-epoch snapshot"
fi

run_job si3_train_r3i \
  timeout 14400 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_si_3x3x3_r3i.yaml \
  --output out/si_3x3x3
snapshot out/si_3x3x3 experiments/si_3x3x3_checkpoint

run_job probe_si3_r3i \
  timeout 3000 python experiments/probe_reheat.py \
  --checkpoint out/si_3x3x3 --prefer last \
  --data data/si_diffusion_3x3x3 --elements Si --sw Si.sw \
  --cell 16.29 16.29 16.29 --natoms 216 --steps 1000 --correctors 3 \
  --samples 16 --batch 16 --force_field 1.5 20.0 \
  --out experiments/reheat_probe_si3x3x3_r3i.json

SI3B_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_r3i.json'))['noise_temperature'])" 2>/dev/null || echo "${SI3_TAU}")
SI3B_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_r3i.json'))['temperature_sigma_max'])" 2>/dev/null || echo "${SI3_WIN}")
run_job eval_si3_r3i \
  timeout 4200 python experiments/eval_checkpoint.py \
  --checkpoint out/si_3x3x3 --prefer last --sweep custom \
  --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 64 --correctors 3 --batch 16 --force_field 1.5 20.0 \
  --noise_temperature "${SI3B_TAU}" --sigma_window "${SI3B_WIN}" \
  --output experiments/si_3x3x3_eval_r3i.json

# ------------------- 4. Adaptive corrector @ 5 substeps, production ckpt
run_job adaptive5 \
  timeout 3600 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --sweep adaptive5 --natoms 64 --cell 10.86 10.86 10.86 \
  --data data/si_diffusion_2x2x2 \
  --output experiments/adaptive5_si_2x2x2.json

# ------------------------------------------------- 5. warm bench refresh
run_job bench_warm timeout 1800 python bench.py

log "=== r3i queue ALL DONE ==="
