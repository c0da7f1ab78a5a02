#!/bin/bash
# r4a: close the Si 3x3x3 energy-parity gate (VERDICT round-3 item #1).
#
# The epoch-136 fused checkpoint (experiments/si_3x3x3_checkpoint_r3l_fused)
# plateaued in loss; what failed in r3k was the reheat calibration — the
# argmin probe rule picked the frozen side of a cliff (t_eff/t_data 3.55 at
# tau=0.41 -> 0.084 at 0.33) and the eval sampled cold. The probe now keeps
# a sliding bracket, regula-falsis inside it, and verifies any interpolated
# tau with reserved probes. This stage re-probes the checkpoint and runs the
# n=256 force-field-wrapped eval VERDICT asks for (chance floor ~0.085-0.12).
set -u
cd /root/repo
mkdir -p out

log() { echo "[r4a $(date +%H:%M:%S)] $*" >> out/queue.log; }

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
    if [ "$tries" -ge 3 ]; then log "tpu unreachable after ${tries} tries"; return 1; fi
  done
}

log "=== r4a stage start ==="
echo $$ > /tmp/queue.pid

CKPT=experiments/si_3x3x3_checkpoint_r3l_fused
wait_for_tpu || { log "ABORT: no tpu"; exit 1; }

log "probe start (epoch-136 fused ckpt)"
timeout 6600 python experiments/probe_reheat.py \
  --checkpoint "${CKPT}" --prefer last \
  --data data/si_diffusion_3x3x3 --elements Si --sw Si.sw \
  --cell 16.29 16.29 16.29 --natoms 216 --steps 1000 --correctors 3 \
  --samples 16 --batch 16 --force_field 1.5 20.0 --max_probes 7 \
  --out experiments/reheat_probe_si3x3x3_r4.json \
  > out/probe_si3_r4.log 2>&1
RC=$?
log "probe exited rc=${RC}"

TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_r4.json'))['noise_temperature'])" 2>/dev/null)
WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_si3x3x3_r4.json'))['temperature_sigma_max'])" 2>/dev/null)
if [ -z "${TAU}" ]; then
  # Fallback: the r3k cliff bracket midpoint (the diagnosed-correct region).
  TAU=0.37; WIN=0.0076
  log "probe json missing; falling back to tau=${TAU}"
fi
log "eval start: tau=${TAU} window=${WIN} n=256"

timeout 10800 python experiments/eval_checkpoint.py \
  --checkpoint "${CKPT}" --prefer last --sweep custom \
  --natoms 216 --cell 16.29 16.29 16.29 \
  --data data/si_diffusion_3x3x3 \
  --samples 256 --correctors 3 --batch 16 --force_field 1.5 20.0 \
  --noise_temperature "${TAU}" --sigma_window "${WIN}" \
  --output experiments/si_3x3x3_eval_r4.json \
  > out/eval_si3_r4.log 2>&1
RC=$?
log "eval exited rc=${RC}"
log "=== r4a stage done ==="
