#!/bin/bash
# Round-5 papers run #2: same 1.67B-edge partition-128 config as run #1
# but full --bf16 — with the round-5 plateau auto-disable this is the
# recommended mode (products cert 0.99975 ABOVE f32+plateau).  Tests the
# fix where it matters: papers scale, where round 4's f32+plateau curve
# was still climbing at budget end.  Gated on run #1 releasing the chip.
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 720); do
  grep -q "R5 PAPERS RUN DONE" logs/r5_papers_run.log 2>/dev/null && break
  sleep 60
done
L=logs/r5_papers_run2.log
echo "=== $(date -u +%H:%M:%S) papers 30-epoch bf16 run" >> "$L"
timeout 12000 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-papers100M --synthetic-scale 0.5 --official-split \
  --partition 128 --mode puregpu --sparse --bf16 --steps-per-call 48 \
  --batch 1024 --fan-out 5,10,15 --epochs 30 \
  --eval-sampled --eval-every 2 --log-every 500 >> "$L" 2>&1
echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
echo "R5 PAPERS RUN2 DONE $(date -u)" >> "$L"
