#!/bin/bash
# Round-4 chip certification queue (VERDICT r3 items 1+2+4):
#
#   0. step-time probe: the fused-ADAM sparse step (f32 + bf16) vs the
#      round-3 fused-SGD 27.4 ms headline — the adaptive update must not
#      give the speed back (only +6 tiny core-tensor I/Os in finalize).
#   1. hard-ogbn-products partition 0, 60% split, 20 epochs,
#      --sparse (fused adam) f32  -> expect ~routed-Adam 0.9862
#   2. same with --bf16           -> the bf16 cost-no-accuracy cert,
#      re-run on a configuration that CONVERGES (r3's void cert ran on
#      the stalled fused-SGD path)
#   3. routed-Adam control (no --sparse), same 20 epochs — the r3 0.9862
#      reference curve reproduced in-session so the comparison table in
#      PERFORMANCE.md shares one chip/session.
#
# One run at a time — two JAX processes on the relay chip deadlock.
set -u
cd "$(dirname "$0")/.."
L=logs/r4_cert.log
run() {
  t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}
run 1800 python scripts/step_probe.py 48 4 --sparse --puregpu
run 1800 python scripts/step_probe.py 48 4 --sparse --puregpu --bf16
run 4800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse \
  --log-every 500
run 4800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse --bf16 \
  --log-every 500
run 4800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu \
  --log-every 500
echo "R4 CERT QUEUE DONE $(date -u)" >> "$L"
