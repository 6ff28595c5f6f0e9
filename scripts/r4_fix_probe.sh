#!/bin/bash
# 8-epoch bf16 convergence-lag fix probe (run AFTER the r4_chip_queue2
# half-certs attribute the lag).  The known 20-epoch curves separate hard
# by epoch 4/8: f32 0.722/0.983 vs full-bf16 0.284/0.582 — 8 epochs is
# enough to see whether a candidate closes the gap.
#
# Usage: r4_fix_probe.sh <extra flags>
#   tower half implicated:  r4_fix_probe.sh --bf16 --bf16-mean-f32
#   kernel half implicated: r4_fix_probe.sh --bf16 --bf16-sr
set -u
cd "$(dirname "$0")/.."
L=logs/r4_fix_probe.log
echo "=== $(date -u +%H:%M:%S) [fix probe: $*]" >> "$L"
timeout 3000 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 8 --mode puregpu --sparse \
  --log-every 500 "$@" >> "$L" 2>&1
echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
