#!/bin/bash
# Round-4 chip queue, part 3: supersedes r4_chip_queue2.sh, whose probe
# phase overran (the --bf16-tower probe spent >28 min in compile and hit
# its timeout; the half-cert epoch logs provide the same steady-epoch
# timing anyway).  Certs first, papers next, fix probe if time allows.
#
#   1-2. bf16 attribution certs (20 epochs each): --bf16-kernel,
#        --bf16-tower — which half of --bf16 costs convergence epochs?
#   3.   papers-scale LEARNING run (gated on the partition-128 perm).
#   4.   bf16 fix probe (8 epochs) chosen by the r4_fix_probe.sh caller —
#        left OUT of this queue: launch manually once 1-2 attribute.
set -u
cd "$(dirname "$0")/.."
L=logs/r4_chip_queue3.log
run() {
  t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}

run 4800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse \
  --bf16-kernel --log-every 500
run 4800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse \
  --bf16-tower --log-every 500

# papers gate: wait for the measurement job to write the partition perm
# (done line in its log), cap the wait at 45 min, then run regardless —
# the CLI recomputes via the same memory-lean native path if cold.
for i in $(seq 1 90); do
  grep -q "partition_s" logs/r4_papers_reorder.log 2>/dev/null && break
  sleep 30
done
echo "papers reorder gate: $(tail -1 logs/r4_papers_reorder.log 2>/dev/null)" >> "$L"
run 9000 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-papers100M --synthetic-scale 0.5 --official-split \
  --partition 128 --mode puregpu --sparse --steps-per-call 48 \
  --batch 1024 --fan-out 5,10,15 --epochs 20 \
  --eval-sampled --eval-every 2 --log-every 500
echo "R4 QUEUE3 DONE $(date -u)" >> "$L"
