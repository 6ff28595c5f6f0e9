#!/bin/bash
# Round-5 papers learning run to PLATEAU (VERDICT r4 item 4): 30 epochs
# of hard-ogbn-papers100M at half scale (55.5M nodes / 1.67B edges) with
# the cached 128-way partition; round 4 stopped at epoch 11/12 with the
# curve still climbing (+0.015/epoch, best 0.840).
#
# Launch ONLY when (a) the chip is free (no other JAX process) and
# (b) the full-papers host feasibility job is not in a >60 GB phase.
set -u
cd "$(dirname "$0")/.."
L=logs/r5_papers_run.log
echo "=== $(date -u +%H:%M:%S) papers 30-epoch run" >> "$L"
timeout 12000 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-papers100M --synthetic-scale 0.5 --official-split \
  --partition 128 --mode puregpu --sparse --steps-per-call 48 \
  --batch 1024 --fan-out 5,10,15 --epochs 30 \
  --eval-sampled --eval-every 2 --log-every 500 >> "$L" 2>&1
echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
echo "R5 PAPERS RUN DONE $(date -u)" >> "$L"
