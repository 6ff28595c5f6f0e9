#!/bin/bash
# Round-3 full chip queue: step-time measurements (VERDICT item 5) first
# (short), then the accuracy-closure queue (items 1 + 6, long).  One JAX
# process owns the chip at a time; everything here is strictly sequential.
#
#   bash scripts/r3_chip_queue.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
L=logs/r3_step_probe.log
run() {
  t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}
# Baseline reconfirm + the bf16 conv-tower measurement (target <=28 ms/step
# from 33.5; the conv tower was the dominant HBM traffic in the ~14 ms
# convs/dropout/optimizer bucket).
run 1200 python scripts/step_probe.py 48 4 --sparse
run 1200 python scripts/step_probe.py 48 4 --sparse --bf16
# Accuracy closure: products 20-epoch TT run, dense control, GAT re-cert.
bash scripts/r3_accuracy_queue.sh
echo "R3 CHIP QUEUE DONE $(date -u)" >> "$L"
