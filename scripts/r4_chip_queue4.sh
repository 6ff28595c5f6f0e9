#!/bin/bash
# Round-4 chip queue, part 4 (post-11:41 extension — round-3 precedent
# says the driver allows ~10 h): the papers LEARNING run with the now-
# cached 128-way partition, then the 35-epoch full-bf16 parity run.
set -u
cd "$(dirname "$0")/.."
L=logs/r4_chip_queue4.log
run() {
  t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}
run 7200 python scripts/r4_papers_run.py 12 0
run 4500 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 35 --mode puregpu --sparse \
  --bf16 --log-every 500
echo "R4 QUEUE4 DONE $(date -u)" >> "$L"
