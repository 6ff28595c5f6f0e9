#!/bin/bash
# Round-5 chip queue, part 1 (VERDICT r4 items 2 + 3a):
#
#   1. fused-Adam f32 cert, 20 epochs — regenerates the lost
#      logs/r4_cert.log receipt (its 0.9916 @ 54.8 ms/step headline had
#      no surviving artifact after the round-4 container reset).
#   2. full --bf16 with the plateau scheduler DISABLED, 20 epochs — the
#      cheapest tower-ceiling probe: round 4's own log blames the
#      reduce-on-plateau halvings for freezing full-bf16 at its ~0.933
#      noise floor; if the ceiling lifts, the fix is a config rule.
#   3. routed-Adam control (no --sparse), 20 epochs — the 0.9863
#      comparison curve, re-run so the cert table shares one session.
#
# One run at a time — two JAX processes on the relay chip deadlock.
set -u
cd "$(dirname "$0")/.."
L=logs/r5_cert.log
run() {
  t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}
run 4800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse \
  --log-every 500
run 4800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse --bf16 \
  --plateau-patience 0 --log-every 500
run 4800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu \
  --log-every 500
echo "R5 QUEUE1 DONE $(date -u)" >> "$L"
python scripts/audit_log_citations.py >> "$L" 2>&1 || true
