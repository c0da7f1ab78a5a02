#!/bin/bash
# r4d queue: round-4 tail, after r4c.
#   A  Si 3x3x3 eval at the corrector-6 probe's calibration (if the c6
#      probe improved the temperature ratio)
#   B  MACE fused-kernel arch timing (MFU headline with the Pallas edge
#      kernel, gated on the r4b profile having run it on hardware)
#   C  adopt the pruned compile cache + verify a warm bench from it
set -u
cd /root/repo
mkdir -p out

log() { echo "[r4d $(date +%H:%M:%S)] $*" >> out/queue.log; }

wait_for_r4c() {
  while ! grep -q "r4c queue done" out/queue.log 2>/dev/null; do sleep 120; done
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

wait_for_r4c
log "=== r4d queue start ==="
echo $$ > /tmp/queue.pid

# ------------------------- A: Si 3x3x3 eval at the c6 probe calibration
C6=experiments/reheat_probe_si3x3x3_c6_r4.json
if [ -f "${C6}" ]; then
  TAU=$(python -c "import json;print(json.load(open('${C6}'))['noise_temperature'])" 2>/dev/null)
  WIN=$(python -c "import json;print(json.load(open('${C6}'))['temperature_sigma_max'])" 2>/dev/null)
  RATIO=$(python -c "import json;r=json.load(open('${C6}'))['final_t_eff_over_t_data'];print(abs(r-1.0) if r is not None else 9)" 2>/dev/null)
  BETTER=$(python -c "print(1 if float('${RATIO:-9}') < 0.15 else 0)" 2>/dev/null)
  if [ "${BETTER}" = "1" ]; then
    log "c6 probe ratio within 15%: running n=128 eval at tau=${TAU}"
    run_job eval_si3_c6_r4 \
      timeout 9000 python experiments/eval_checkpoint.py \
      --checkpoint experiments/si_3x3x3_checkpoint_r3l_fused --prefer last \
      --sweep custom --natoms 216 --cell 16.29 16.29 16.29 \
      --data data/si_diffusion_3x3x3 \
      --samples 128 --correctors 6 --batch 16 --force_field 1.5 20.0 \
      --noise_temperature "${TAU}" --sigma_window "${WIN}" \
      --output experiments/si_3x3x3_eval_c6_r4.json
  else
    log "c6 probe did not reach a 15% ratio (|r-1|=${RATIO:-missing}); skipping eval"
  fi
fi

# ------------------------------------- B: fused-MACE arch timing rerun
if grep -q "full_fused_ms" experiments/mace_profile.json 2>/dev/null; then
  run_job arch_timing_fused_r4 \
    timeout 3600 python experiments/arch_timing.py --batch 256 --mace_fused \
    --out experiments/arch_timing_r4.json
fi

# -------------------------- C: adopt pruned cache + warm-bench verify
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

log "=== r4d queue done ==="
