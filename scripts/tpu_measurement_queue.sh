#!/bin/bash
# Round-2 TPU measurement plan — everything blocked by the 2026-08-18
# relay outage, runnable as one sequential queue (exactly ONE JAX process
# may own the chip; see docs/PERFORMANCE.md + .claude/skills/verify).
#
#   bash scripts/tpu_measurement_queue.sh [logfile]
#
# Results to record in docs/PERFORMANCE.md:
#   - bench.py sanity (headline TT-lookup JSON line)
#   - products kernel re-bench (validates the fused-SGD f32-master fix
#     and the q=(5,5,4) reference pairing cost nothing)
#   - step times for --sparse / --sampler table / --rng-impl rbg
#     (paths built + unit-tested but never timed on the chip)
#   - 5-epoch hard-ogbn-products SAGE accuracy run
#   - window-blocked SpMM vs chunked-XLA vs tiled (spmm_eval_bench)
set -u
cd "$(dirname "$0")/.."
L=${1:-logs/tpu_queue_manual.log}
run() {
  t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [$*]" >> "$L"
  timeout "$t" "$@" >> "$L" 2>&1
  echo "--- exit $? at $(date -u +%H:%M:%S)" >> "$L"
}
run 900  python bench.py
run 1800 env PROBE_CFG=products python scripts/kernel_bench.py
run 2400 python scripts/step_probe.py 48 4 --sparse
run 2400 python scripts/step_probe.py 48 4 --table
run 2400 python scripts/step_probe.py 48 4 --puregpu --rbg
run 3600 python scripts/spmm_eval_bench.py
run 5400 python -m falcon_ttdforgnns_tpu.cli --model sage \
  --dataset hard-ogbn-products --epochs 5 --mode puregpu --log-every 200
echo "MEASUREMENT QUEUE DONE $(date -u)" >> "$L"
