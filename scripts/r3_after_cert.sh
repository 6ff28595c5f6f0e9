#!/bin/bash
# After the bf16 cert queue: chip-time the fused rowwise-adagrad step.
set -u
cd "$(dirname "$0")/.."
while ! grep -q "BF16 CERT DONE" logs/r3_bf16_cert.log 2>/dev/null; do
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) fused adagrad step probe" >> logs/r3_bisect.log
timeout 1800 python scripts/step_probe.py 48 4 --sparse --adagrad >> logs/r3_bisect.log 2>&1
timeout 1800 python scripts/step_probe.py 48 4 --sparse --adagrad --bf16 >> logs/r3_bisect.log 2>&1
echo "ADAGRAD PROBE DONE exit $? $(date -u)" >> logs/r3_bisect.log
