#!/bin/bash
# Round-4 chip queue, part 3 — bf16 convergence attribution (launch any
# time; self-sequences by polling for the part-2 DONE marker).
#
# Part-1 finding: fused-Adam sparse converges 0.9916 in f32 (beats the
# routed 0.9862) but --bf16 sits at 0.9335 at epoch 19 (still climbing,
# ~6-8 epochs behind).  CPU-scale arms (scripts/bf16_diagnosis.py) show
# NO bf16 cost at 20K nodes — the lag is scale-dependent, so attribute
# on chip at products scale:
#
#   1-2. step probes of the halves (--bf16-tower / --bf16-kernel),
#        non-puregpu — comparable to the 33.5 (f32) / 27.4 (bf16) ms
#        headline scale.
#   3.   cert --bf16-kernel (bf16 h_all/d_h, f32 tower), 20 epochs
#   4.   cert --bf16-tower (bf16 tower, f32 kernel I/O), 20 epochs
#   5.   cert --bf16 full, 40 epochs — does full bf16 reach f32 parity
#        at ~2x the epochs, or plateau short?
set -u
cd "$(dirname "$0")/.."
L=logs/r4_bf16_queue.log
run() {
  t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}

for i in $(seq 1 960); do
  grep -q "R4 AFTER-CERT QUEUE DONE" logs/r4_after_cert.log 2>/dev/null && break
  sleep 30
done
echo "part-2 gate released at $(date -u)" >> "$L"

run 1800 python scripts/step_probe.py 48 4 --sparse --bf16-tower
run 1800 python scripts/step_probe.py 48 4 --sparse --bf16-kernel
run 4800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse \
  --bf16-kernel --log-every 500
run 4800 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse \
  --bf16-tower --log-every 500
run 7200 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 40 --mode puregpu --sparse \
  --bf16 --log-every 500
echo "R4 BF16 QUEUE DONE $(date -u)" >> "$L"
