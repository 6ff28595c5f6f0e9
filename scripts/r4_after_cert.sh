#!/bin/bash
# Round-4 chip queue, part 2 (launch alongside r4_cert_queue.sh — it
# self-sequences by polling for the part-1 DONE marker):
#
#   0. non-puregpu fused-ADAM step probes (f32 + bf16): the numbers
#      directly comparable to the round-3 fused-SGD 33.5/27.4 ms
#      headline (the puregpu probes in part 1 include ~20 ms of in-jit
#      sampling).
#   1. papers-scale LEARNING run (VERDICT r3 item 5): half-scale
#      hard-ogbn-papers100M (55.5M nodes / 1.67B edges — the single-chip
#      int32 ceiling) with the partition-128 locality reorder (perm
#      disk-cached by scripts/papers_reorder_measure.py) + fused-Adam
#      sparse cores, official 1.2M-seed split, 20 epochs, sampled eval.
#      Round 3's run was throughput-only (chance after 2 epochs, no
#      reorder, fixed-lr fused SGD); this run is the accuracy curve.
set -u
cd "$(dirname "$0")/.."
L=logs/r4_after_cert.log
run() {
  t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}

# gate on part 1 releasing the chip (two JAX processes deadlock the relay)
for i in $(seq 1 720); do
  grep -q "R4 CERT QUEUE DONE" logs/r4_cert.log 2>/dev/null && break
  sleep 30
done
echo "part-1 gate released at $(date -u)" >> "$L"

run 1800 python scripts/step_probe.py 48 4 --sparse
run 1800 python scripts/step_probe.py 48 4 --sparse --bf16
run 9000 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-papers100M --synthetic-scale 0.5 --official-split \
  --partition 128 --mode puregpu --sparse --steps-per-call 48 \
  --batch 1024 --fan-out 5,10,15 --epochs 20 \
  --eval-sampled --eval-every 2 --log-every 500
echo "R4 AFTER-CERT QUEUE DONE $(date -u)" >> "$L"
