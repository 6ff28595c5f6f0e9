#!/bin/bash
# Waits for the r3 chip queue to finish, then runs the step-bisection
# probes on the chip (VERDICT item 5 attribution).
set -u
cd "$(dirname "$0")/.."
while ! grep -q "R3 CHIP QUEUE DONE" logs/r3_step_probe.log 2>/dev/null; do
  sleep 60
done
L=logs/r3_bisect.log
echo "=== $(date -u +%H:%M:%S) step_bisect_r3 all variants" >> "$L"
timeout 5400 python scripts/step_bisect_r3.py 48 4 >> "$L" 2>&1
echo "R3 BISECT DONE exit $? $(date -u)" >> "$L"
