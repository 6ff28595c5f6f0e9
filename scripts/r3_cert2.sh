#!/bin/bash
# Cert round 2: fused rowwise-adagrad convergence at full products scale
# (f32 and bf16) - the fused-SGD cert showed plain SGD at lr=0.003 moves
# the cores ~1000x slower than adam (stalls at chance on hard graphs,
# where ALL signal flows through the cores); adagrad is scale-invariant.
set -u
cd "$(dirname "$0")/.."
L=logs/r3_cert2.log
while ! grep -q "ADAGRAD PROBE DONE" logs/r3_bisect.log 2>/dev/null; do sleep 30; done
run() {
  t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}
run 3600 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 12 --mode puregpu --sparse \
  --tt-optimizer rowwise_adagrad --log-every 500
run 3600 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 12 --mode puregpu --sparse \
  --tt-optimizer rowwise_adagrad --bf16 --log-every 500
echo "CERT2 DONE $(date -u)" >> "$L"
