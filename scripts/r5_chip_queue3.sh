#!/bin/bash
# Round-5 chip queue, part 3 — gated on part 2 (VERDICT r4 items 3b + 6):
#   1. MFU model-vs-trace cross-check (mixed-mode fused-sparse step)
#   2. puregpu-step trace: attribute the in-jit sampler's ~21 ms/step
#   3-4. bf16 tower-ceiling mechanism arms (8 epochs): f32 logits head,
#        f32 first conv — interpreted against queue1's plateau-off run.
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 360); do
  grep -q "R5 QUEUE2 DONE" logs/r5_cert.log 2>/dev/null && break
  sleep 60
done
run() {
  t=$1; L=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}
run 2400 logs/r5_mfu_xcheck.log python scripts/r5_mfu_xcheck.py 48
run 2400 logs/r5_puregpu_trace.log python scripts/r5_puregpu_trace.py 48
run 2400 logs/r5_bf16_arms.log python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 8 --mode puregpu --sparse --bf16 \
  --bf16-f32-head --log-every 500
run 2400 logs/r5_bf16_arms.log python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 8 --mode puregpu --sparse --bf16 \
  --bf16-f32-first --log-every 500
echo "R5 QUEUE3 DONE $(date -u)" >> logs/r5_cert.log
