#!/bin/bash
# Round-3 accuracy-closure queue (VERDICT.md items 1 + 6).  Exactly ONE
# JAX process may own the chip, so these run strictly sequentially:
#
#   1. hard-ogbn-products SAGE+TT to convergence (20 epochs; the round-2
#      run stopped at 5 epochs / 0.7918 "still climbing").
#   2. Dense-embedding control at the SAME scale/split/config (--no-tt,
#      980 MB table in HBM) — the TT-vs-dense acc/memory/time row that
#      anchors the TT number the way /root/reference README.md:88-101
#      anchors 69.34% against 70.46%.
#   3. GAT budget run on hard-ogbn-arxiv with the corrected "both" norm
#      (replaces the stale pre-fix chip number; CPU re-cert crossed 0.99
#      by epoch 139, so 400 epochs ~17 min suffices).
#
#   bash scripts/r3_accuracy_queue.sh [logfile]
set -u
cd "$(dirname "$0")/.."
L=${1:-logs/r3_accuracy_queue.log}
run() {
  t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}
run 5400 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --log-every 500
run 6000 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --log-every 500 \
  --no-tt
run 1800 python -m falcon_ttdforgnns_tpu.cli --model gat \
  --dataset hard-ogbn-arxiv --use-tt --tt-rank 16,16 \
  --p-shapes 50,60,60 --q-shapes 8,4,4 --epochs 400 --lr 0.002 \
  --num-heads 3 --use-labels --use-linear
echo "R3 ACCURACY QUEUE DONE $(date -u)" >> "$L"
