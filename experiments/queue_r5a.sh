#!/bin/bash
# r5a queue (round 5): bisect the c8/n=216 TPU scan fault, then close the
# Si 3x3x3 energy gate at n=256 (VERDICT r4 #1).
#
# Bisection logic (experiments/repro_c8_fault.py):
#   t1 c8_b16_k250  — exact failing program class          (expect FAULT)
#   t2 c8_b8_k250   — same program size, half exec time    (discriminator:
#                     clean => TIME-bound; fault => SIZE-bound)
#   t3 c8_b16_auto  — auto chunk (194 steps, 1746 apps)    (fix candidate)
#   t4 c6_b16_k250  — known-good control                   (expect OK)
# Then, only if t3 passed: the n=256 c8 eval at tau=1.3.
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

log "=== r5a queue start (c8 bisection) ==="
echo $$ > /tmp/queue.pid
BIS=experiments/c8_bisection_r5.json

run_job bisect_t1 timeout 900 python experiments/repro_c8_fault.py \
  --name c8_b16_k250 --correctors 8 --chunk 250 --batch 16 --out "$BIS"
sleep 30
run_job bisect_t2 timeout 900 python experiments/repro_c8_fault.py \
  --name c8_b8_k250 --correctors 8 --chunk 250 --batch 8 --out "$BIS"
sleep 30
run_job bisect_t3 timeout 900 python experiments/repro_c8_fault.py \
  --name c8_b16_auto --correctors 8 --chunk 0 --batch 16 --out "$BIS"
T3_RC=$?
sleep 30
run_job bisect_t4 timeout 900 python experiments/repro_c8_fault.py \
  --name c6_b16_k250 --correctors 6 --chunk 250 --batch 16 --out "$BIS"
sleep 30

if [ "$T3_RC" -eq 0 ]; then
  log "t3 (auto chunk) clean — running the n=256 c8 eval payload"
  run_job eval_si3_c8_r5 \
    timeout 10800 python experiments/eval_checkpoint.py \
    --checkpoint experiments/si_3x3x3_checkpoint_r3l_fused --prefer last \
    --sweep custom --natoms 216 --cell 16.29 16.29 16.29 \
    --data data/si_diffusion_3x3x3 \
    --samples 256 --correctors 8 --batch 16 --force_field 1.5 20.0 \
    --noise_temperature 1.3 --sigma_window 0.01332947938261649 \
    --output experiments/si_3x3x3_eval_c8_r5.json
else
  log "t3 failed — SKIPPING the n=256 payload; bisection needs a new fix"
fi

log "=== r5a queue done ==="
