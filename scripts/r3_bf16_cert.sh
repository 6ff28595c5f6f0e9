#!/bin/bash
# bf16 accuracy certification at full products scale: the fused-sparse
# trainer with and without --bf16 at otherwise identical configs (60%
# split, puregpu, 20 epochs — the round-3 accuracy-closure regime).
# Certifies (a) the fused-SGD core updates converge at full scale and
# (b) the bf16 kernel-I/O path costs no accuracy.
set -u
cd "$(dirname "$0")/.."
L=${1:-logs/r3_bf16_cert.log}
run() {
  t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}
run 4200 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse \
  --log-every 500
run 4200 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse --bf16 \
  --log-every 500
echo "BF16 CERT DONE $(date -u)" >> "$L"
