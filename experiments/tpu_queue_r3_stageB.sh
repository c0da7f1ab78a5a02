#!/bin/bash
# Follow-up: rerun the (now chunked) SiGe 256-sample eval after the final
# queue drains.
set -u
cd /root/repo
while kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; do sleep 60; done
sleep 120
echo "[stageB $(date +%H:%M:%S)] start eval_sige_r3_retry" >> out/queue.log
SIGE_TAU=$(python -c "import json;print(json.load(open('experiments/reheat_probe_sige.json'))['noise_temperature'])" 2>/dev/null || echo 1.0)
SIGE_WIN=$(python -c "import json;print(json.load(open('experiments/reheat_probe_sige.json'))['temperature_sigma_max'])" 2>/dev/null || echo 0.02)
timeout 2400 python experiments/eval_sige.py \
  --checkpoint out/sige_1x1x1_r3 --prefer last \
  --data data/sige_diffusion_1x1x1_r3 --samples 256 \
  --noise_temperature "${SIGE_TAU}" --temperature_sigma_max "${SIGE_WIN}" \
  >> out/eval_sige_r3.log 2>&1 \
  && echo "[stageB] eval_sige_r3_retry done" >> out/queue.log \
  || echo "[stageB] eval_sige_r3_retry FAILED" >> out/queue.log
