#!/bin/bash
# Round-3 session-E stage H: runs after tpu_queue_r3g.sh drains (gated on
# /tmp/queue_r3e.pid). Two lessons from the r3g results feed this queue:
#   * The Si 3x3x3 reheat probe without the force field is non-monotone
#     below tau~0.8 (frozen-in defects heat the median, out/probe_si3_b16.log)
#     — exactly the MACE failure the FF probe fixed (ratio 1.0001 at
#     tau=1.438). Re-probe and re-eval Si 3x3x3 WITH the production FF.
#   * MACE r3b's residual 9% defect tail holds energy-KS at 0.238; the
#     loss was still descending at the 186-epoch cutoff. Resume to epoch
#     500 (~6.8 s/epoch) and re-run the FF probe/eval chain.
# Registered in /tmp/queue.pid so the 14:10 watchdog's PID-tree kill
# covers this queue.
set -u
cd /root/repo
mkdir -p out

START_DEADLINE=1345   # don't start a new job after 13:45 (watchdog 14:10)

log() { echo "[r3h $(date +%H:%M:%S)] $*" >> out/queue.log; }

while kill -0 "$(cat /tmp/queue_r3e.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
sleep 120

wait_for_tpu() {
  local tries=0
  while true; do
    timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); print(float((x @ x).sum()))
" > /dev/null 2>&1 && { log "tpu probe ok"; sleep 60; return 0; }
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

log "=== r3h queue start ==="

# 1a. Si 3x3x3 reheat probe WITH the production force field (chunk-guarded).
run_job probe_si3_ff \
  timeout 2400 python experiments/probe_reheat.py \
  --checkpoint experiments/si_3x3x3_checkpoint --prefer last \
  --data data/si_diffusion_3x3x3 --elements Si --sw Si.sw \
  --cell 16.29 16.29 16.29 --natoms 216 --steps 1000 --correctors 3 \
  --samples 16 --batch 16 --force_field 1.5 20.0 \
  --out experiments/reheat_probe_si3x3x3_ff.json

# 1b. Si 3x3x3 eval at the FF-probed tau, 64 samples in 16-sample chunks.
SI3_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_ff.json'))['noise_temperature'])" 2>/dev/null || echo 0.9)
SI3_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_ff.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.0133)
run_job eval_si3_ff \
  timeout 3600 python experiments/eval_checkpoint.py \
  --checkpoint experiments/si_3x3x3_checkpoint --prefer last --sweep custom \
  --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 64 --correctors 3 --batch 16 --force_field 1.5 20.0 \
  --noise_temperature "${SI3_TAU}" --sigma_window "${SI3_WIN}" \
  --output experiments/si_3x3x3_eval_ff.json

# 2a. Resume MACE training 186 -> 500 epochs (same run directory; the
#     trainer resumes from last_model, ~6.8 s/epoch).
run_job mace_r3h \
  timeout 2100 python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_mace_si_1x1x1_r3h.yaml \
  --output out/mace_si_1x1x1_r3b
rm -rf experiments/mace_si_1x1x1_r3h_checkpoint
cp -r out/mace_si_1x1x1_r3b experiments/mace_si_1x1x1_r3h_checkpoint 2>/dev/null \
  && log "snapshot out/mace_si_1x1x1_r3b -> experiments/mace_si_1x1x1_r3h_checkpoint"

# 2b. Per-checkpoint FF probe on the resumed model.
run_job probe_mace_r3h \
  timeout 2000 python experiments/probe_reheat.py \
  --checkpoint out/mace_si_1x1x1_r3b --prefer last \
  --data data/si_diffusion_1x1x1 --elements Si --sw Si.sw \
  --cell 5.43 5.43 5.43 --natoms 8 --steps 500 --correctors 3 \
  --force_field 1.5 20.0 \
  --out experiments/reheat_probe_mace_r3h.json

# 2c. 256-sample eval at the new tau.
MACE_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_mace_r3h.json'))['noise_temperature'])" 2>/dev/null || echo 1.44)
MACE_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_mace_r3h.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.0285)
run_job eval_mace_r3h \
  timeout 1800 python experiments/eval_checkpoint.py \
  --checkpoint out/mace_si_1x1x1_r3b --prefer last \
  --sweep custom --natoms 8 --cell 5.43 5.43 5.43 --steps 500 \
  --data data/si_diffusion_1x1x1 --samples 256 --correctors 3 \
  --noise_temperature "${MACE_TAU}" --sigma_window "${MACE_WIN}" \
  --force_field 1.5 20.0 \
  --output experiments/mace_si_1x1x1_eval_r3h.json

log "=== r3h queue ALL DONE ==="
