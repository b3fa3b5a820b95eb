#!/bin/bash
# Round-5 TPU work queue — run top-to-bottom when the axon tunnel is back.
# Each stage logs under experiments/; later stages only run if the gate
# passes.  Usage: bash experiments/r5_tpu_queue.sh
set -u
cd /root/repo
mkdir -p experiments/logs

echo "=== stage 0: tunnel probe ==="
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel still down"; exit 1; }

echo "=== stage 1: on-chip gate (REQUIRED after driver changes) ==="
MPBQR_REQUIRE_TPU=1 timeout 3000 python -m pytest tests_tpu/ -q \
  2>&1 | tee experiments/logs/tpu_gate_r5b.log
grep -q " passed" experiments/logs/tpu_gate_r5b.log || {
  echo "GATE DID NOT PASS"; exit 1; }

echo "=== stage 2: trailing-carry A/B (3 interleaved reps) ==="
timeout 3000 python experiments/r5_carry_ab.py 3 \
  2>&1 | tee experiments/logs/carry_ab_r5.log

echo "=== stage 3: cold headline runs (3x fresh process) ==="
for i in 1 2 3; do
  timeout 1500 python bench.py 2>&1 | tee -a experiments/logs/bench_cold_r5b.log
done

echo "=== queue done ==="
