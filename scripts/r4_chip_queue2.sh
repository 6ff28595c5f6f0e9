#!/bin/bash
# Round-4 chip queue, part 2 (rewritten): supersedes r4_after_cert.sh +
# r4_bf16_queue.sh (their watchers were stopped when the papers-scale
# partitioner OOM-killed the host job — the original part-2 papers run
# would have re-hit the same OOM in-process; the partitioner is now
# memory-lean and re-running host-side).
#
# Order puts the bf16 half-certs BEFORE the papers run so the chip stays
# busy while the 1.67B-edge partition finishes host-side:
#   1-4. non-puregpu fused-Adam step probes: f32 / bf16 / tower-half /
#        kernel-half (comparable to the round-3 33.5 / 27.4 ms scale)
#   5-6. bf16 attribution certs (20 epochs each): --bf16-kernel,
#        --bf16-tower
#   7.   papers-scale LEARNING run (gated on the partition-128 perm
#        landing in reorder_cache/)
#   8.   full --bf16 at 40 epochs: parity-at-more-epochs question
set -u
cd "$(dirname "$0")/.."
L=logs/r4_chip_queue2.log
run() {
  t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}

run 1800 python scripts/step_probe.py 48 4 --sparse
run 1800 python scripts/step_probe.py 48 4 --sparse --bf16
run 1800 python scripts/step_probe.py 48 4 --sparse --bf16-tower
run 1800 python scripts/step_probe.py 48 4 --sparse --bf16-kernel
run 4800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse \
  --bf16-kernel --log-every 500
run 4800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse \
  --bf16-tower --log-every 500

# papers gate: the measurement job writes reorder_cache/perm_*.npy when the
# 128-way partition of the 55.5M-node graph completes (plus a done line in
# its log).  Cap the wait at 90 min, then run regardless — the CLI
# recomputes via the same (now memory-lean) native path if the cache is
# cold.
for i in $(seq 1 180); do
  grep -q "partition_s" logs/r4_papers_reorder.log 2>/dev/null && break
  sleep 30
done
echo "papers reorder gate: $(tail -1 logs/r4_papers_reorder.log 2>/dev/null)" >> "$L"
run 10800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-papers100M --synthetic-scale 0.5 --official-split \
  --partition 128 --mode puregpu --sparse --steps-per-call 48 \
  --batch 1024 --fan-out 5,10,15 --epochs 20 \
  --eval-sampled --eval-every 2 --log-every 500

run 7200 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 40 --mode puregpu --sparse \
  --bf16 --log-every 500
echo "R4 QUEUE2 DONE $(date -u)" >> "$L"
