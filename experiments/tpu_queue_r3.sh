#!/bin/bash
# Round-3 TPU job queue: waits for the currently running trainings, then runs
# the queued jobs sequentially, retrying each on TPU-worker crashes (training
# resumes from its orbax last_model checkpoint, so a retry only repeats the
# epochs since the last save).
set -u
cd /root/repo

wait_pid() {
  local pid=$1
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
}

run_with_retry() {
  local name=$1; shift
  local attempts=0
  until "$@" >> "out/${name}.log" 2>&1; do
    attempts=$((attempts + 1))
    echo "[queue] ${name} exited nonzero (attempt ${attempts})" >> out/queue.log
    if [ "$attempts" -ge 3 ]; then
      echo "[queue] ${name} FAILED after 3 attempts" >> out/queue.log
      return 1
    fi
    sleep 300  # let the axon tunnel unwedge after a client crash
  done
  echo "[queue] ${name} done" >> out/queue.log
}

echo "[queue] waiting for running sige training: $(cat /tmp/sige_train.pid 2>/dev/null)" > out/queue.log
[ -f /tmp/sige_train.pid ] && wait_pid "$(cat /tmp/sige_train.pid)"
echo "[queue] sige finished at $(date)" >> out/queue.log
sleep 120  # let the axon worker release the previous client session

# 0. Si 3x3x3 training, solo on the device (a second concurrent axon client
#    wedges after a worker restart); resumes from the epoch-9 checkpoint.
run_with_retry si_3x3x3_b \
  python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_si_3x3x3.yaml \
  --output out/si_3x3x3

# 1. MACE retrain with the image-expanded trunk (fresh output dir: the
#    network changed, old checkpoints are incompatible).
run_with_retry mace_si_1x1x1_r3b \
  python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
  --config experiments/config_mace_si_1x1x1_round3.yaml \
  --output out/mace_si_1x1x1_r3b

# 2. Empirical reheat probe on the shipped Si 2x2x2 checkpoint (validates the
#    probe recovers the round-2 sweep optimum tau ~ 1.2).
run_with_retry reheat_probe_si \
  python experiments/probe_reheat.py \
  --checkpoint experiments/si_2x2x2_round2_checkpoint --prefer last \
  --data data/si_diffusion_2x2x2 --elements Si --sw Si.sw \
  --cell 10.86 10.86 10.86 --natoms 64 --steps 1000 --correctors 3 \
  --out experiments/reheat_probe_si.json

echo "[queue] ALL DONE at $(date)" >> out/queue.log
