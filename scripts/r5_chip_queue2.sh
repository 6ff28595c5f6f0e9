#!/bin/bash
# Round-5 chip queue, part 2 — gated on part 1's done marker (one JAX
# process on the relay chip at a time).  Regenerates the remaining lost
# round-3 receipts and closes VERDICT r4 item 4:
#
#   1. eval-bias: sampled vs full-neighbor eval on the SAME checkpoints
#      along a products training curve (the papers runs report sampled
#      accuracy; this measures the bias that inherits).
#   2. official-split matched-work headline re-run (r3_official.log lost).
#   3. dense-embedding control, 3 epochs (r3_accuracy_queue.log lost;
#      dense certifies 1.0000 from epoch 0 — 3 epochs re-establishes the
#      accuracy row + steady epoch time).
#   4. GAT corrected-norm re-cert, 300 epochs (converged from ~150).
#   5. papers-scale learning run to PLATEAU (30 epochs; round 4 stopped
#      at epoch 11/12 with the curve still climbing +0.015/epoch).
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 240); do
  grep -q "R5 QUEUE1 DONE" logs/r5_cert.log 2>/dev/null && break
  sleep 60
done
run() {
  t=$1; L=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}
run 2700 logs/r5_eval_bias.log python scripts/r5_eval_bias.py 8
run 1800 logs/r5_official.log python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --official-split --partition 128 \
  --epochs 8 --mode puregpu --sparse --log-every 200
run 2400 logs/r5_dense_control.log python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 3 --mode puregpu --log-every 500 \
  --no-tt
run 1800 logs/r5_gat.log python -m falcon_ttdforgnns_tpu.cli --model gat \
  --dataset hard-ogbn-arxiv --use-tt --tt-rank 16,16 \
  --p-shapes 50,60,60 --q-shapes 8,4,4 --epochs 300 --lr 0.002 \
  --num-heads 3 --use-labels --use-linear
echo "R5 QUEUE2 DONE $(date -u)" >> logs/r5_cert.log
# NOTE: the 30-epoch papers learning run moved to scripts/r5_papers_run.sh
# — it must not overlap the full-papers host feasibility job in RAM.
