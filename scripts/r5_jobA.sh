#!/bin/bash
# Full-papers build+partition (host-only), gated on the int32 big test
# (pid passed as $1) releasing its ~98 GB.
set -u
cd "$(dirname "$0")/.."
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
L=logs/r5_full_papers.log
echo "=== $(date -u +%H:%M:%S) full-papers build_partition" >> "$L"
FALCON_PART_DEBUG=1 timeout 21600 python scripts/r5_full_papers.py build_partition 128 >> "$L" 2>&1
echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
echo "R5 JOBA DONE $(date -u)" >> "$L"
