#!/bin/bash
# Round-5 papers learning run to PLATEAU (VERDICT r4 item 4): 30 epochs
# of hard-ogbn-papers100M at half scale (55.5M nodes / 1.67B edges) with
# the cached 128-way partition; round 4 stopped at epoch 11/12 with the
# curve still climbing (+0.015/epoch, best 0.840).
#
# Launch ONLY when (a) the chip is free (no other JAX process) and
# (b) the full-papers host feasibility job is not in a >60 GB phase.
set -u
cd "$(dirname "$0")/.."
# eval_bias retry first (its first slot crashed on a scoped-VMEM compile
# OOM from the default TT shapes — now pinned to the certified config);
# the papers run still fits before its wall-clock cap.
timeout 3000 python scripts/r5_eval_bias.py 8 >> logs/r5_eval_bias.log 2>&1
echo "--- eval_bias retry exit $? at $(date -u +%H:%M:%S)" >> logs/r5_eval_bias.log
git add -f logs/r5_eval_bias.log 2>/dev/null
git commit -q -m "Receipt: sampled vs full-neighbor eval bias (retry with pinned TT shapes)

No-Verification-Needed: measurement log artifact only" || true

# mfu_xcheck re-run with the fixed xplane aggregation (first capture
# double-counted nested events into a 154 ms "total" for a 33 ms step)
timeout 1800 python scripts/r5_mfu_xcheck.py 48 >> logs/r5_mfu_xcheck.log 2>&1
echo "--- mfu retry exit $? at $(date -u +%H:%M:%S)" >> logs/r5_mfu_xcheck.log
git add -f logs/r5_mfu_xcheck.log 2>/dev/null
git commit -q -m "Receipt: MFU model-vs-trace cross-check (fixed leaf-only aggregation)

No-Verification-Needed: measurement log artifact only" || true

L=logs/r5_papers_run.log
# Cap so the follow-on arms (f32 plateau-off, papers bf16) get chip time
# before the round ends ~00:14 (see r5_papers_run2.sh for the deadlock
# rationale).
now=$(date -u +%s); end=$(date -u -d '23:15' +%s)
[ "$end" -le "$now" ] && end=$((now + 600))
cap=$((end - now)); [ "$cap" -gt 12000 ] && cap=12000
echo "=== $(date -u +%H:%M:%S) papers 30-epoch run (cap ${cap}s)" >> "$L"
timeout "$cap" python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-papers100M --synthetic-scale 0.5 --official-split \
  --partition 128 --mode puregpu --sparse --steps-per-call 48 \
  --batch 1024 --fan-out 5,10,15 --epochs 30 \
  --eval-sampled --eval-every 2 --log-every 500 >> "$L" 2>&1
echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
echo "R5 PAPERS RUN DONE $(date -u)" >> "$L"
