#!/bin/bash
# Round-5 papers run #2 — two chip runs, in value order:
#
#   0. f32 + plateau-OFF products cert (20 ep): completes the 2x2 the
#      round-5 bf16 finding opened.  bf16+plateau-off certified 0.99975
#      vs f32+plateau's 0.9923 — but the f32+plateau curve peaks at
#      epoch 11 and flatlines, which suggests the plateau ratchet also
#      freezes f32.  Without this arm the docs' "bf16 ABOVE f32" line
#      could be a plateau artifact, not a precision statement.
#   1. papers-scale full --bf16 (30 ep): same 1.67B-edge partition-128
#      config as run #1 but bf16 — with the plateau auto-disable this is
#      the recommended mode; tests the fix where it matters.  Gated on
#      run #1 releasing the chip (caller serializes).
set -u
cd "$(dirname "$0")/.."
export PATH=/opt/venv/bin:$PATH

L0=logs/r5_f32_noplateau.log
echo "=== $(date -u +%H:%M:%S) f32 plateau-off 20ep control" >> "$L0"
timeout 2700 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 20 --mode puregpu --sparse \
  --plateau-patience 0 --log-every 500 >> "$L0" 2>&1
echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L0"
git add -f "$L0" 2>/dev/null
git commit -q -m "Receipt: f32 plateau-off 20-epoch control (completes the plateau 2x2)

No-Verification-Needed: measurement log artifact only, no code change" || true

L=logs/r5_papers_run2.log
# Cap so the chip is FREE before the driver's round-end bench.py — a
# second JAX process on the relay deadlocks, and the round ends ~00:14.
now=$(date -u +%s); end=$(date -u -d '23:52' +%s)
[ "$end" -le "$now" ] && end=$((now + 600))
cap=$((end - now)); [ "$cap" -gt 12000 ] && cap=12000
echo "=== $(date -u +%H:%M:%S) papers 30-epoch bf16 run (cap ${cap}s)" >> "$L"
timeout "$cap" python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-papers100M --synthetic-scale 0.5 --official-split \
  --partition 128 --mode puregpu --sparse --bf16 --steps-per-call 48 \
  --batch 1024 --fan-out 5,10,15 --epochs 30 \
  --eval-sampled --eval-every 2 --log-every 500 >> "$L" 2>&1
echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
echo "R5 PAPERS RUN2 DONE $(date -u)" >> "$L"
