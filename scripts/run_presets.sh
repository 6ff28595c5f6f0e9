#!/usr/bin/env bash
# Experiment preset launcher — parity with the reference's run_script.sh
# (`run_script.sh:71-555`): named presets bundling dataset / TT-shape /
# rank / cache / partition configs.  Usage: scripts/run_presets.sh <preset>
set -euo pipefail
cd "$(dirname "$0")/.."

PRESET="${1:-baseline}"
PY=(python -m falcon_ttdforgnns_tpu.cli)

case "$PRESET" in
  baseline)           # dense-embedding GraphSAGE, products scale (README.md:92)
    "${PY[@]}" --model sage --dataset ogbn-products --no-tt \
      --batch 1024 --fan-out 5,10,15 --epochs 2 ;;
  fbtt-products)      # TT rank 16,16 products (run_script.sh fbtt-products)
    "${PY[@]}" --model sage --dataset ogbn-products --use-tt \
      --tt-rank 16,16 --p-shapes 125,140,140 --q-shapes 5,5,4 \
      --batch 1024 --fan-out 5,10,15 --epochs 2 ;;
  final-p)            # METIS partition reorder + cache (README.md:100)
    "${PY[@]}" --model sage --dataset ogbn-products --use-tt \
      --tt-rank 16,16 --p-shapes 125,140,140 --q-shapes 5,5,4 \
      --partition 128 --use-cached --cache-size 100000 \
      --batch 1024 --fan-out 5,10,15 --epochs 2 ;;
  final-p2)           # RCMK reorder (README.md:101); --sparse like the
    # reference final presets (run_script.sh:432-453) — and it is the
    # measured-fastest step here (fused Pallas SGD 33.5 ms vs routed 35.5)
    "${PY[@]}" --model sage --dataset ogbn-products --use-tt \
      --tt-rank 16,16 --p-shapes 125,140,140 --q-shapes 5,5,4 \
      --partition -2 --sparse --batch 1024 --fan-out 5,10,15 --epochs 2 ;;
  final-p2-bf16)      # fastest measured step: + bf16 kernel-I/O tower
    # (27.4 ms/step vs 33.5 f32, round 3; opt-in precision contract)
    "${PY[@]}" --model sage --dataset ogbn-products --use-tt \
      --tt-rank 16,16 --p-shapes 125,140,140 --q-shapes 5,5,4 \
      --partition -2 --sparse --bf16 --batch 1024 --fan-out 5,10,15 \
      --epochs 2 ;;
  gcn)                # full-graph GCN arxiv (run_script.sh gcn preset)
    "${PY[@]}" --model gcn --dataset ogbn-arxiv --use-tt \
      --tt-rank 16,16 --p-shapes 50,60,60 --q-shapes 8,4,4 \
      --use-linear --use-labels --epochs 200 --lr 0.005 ;;
  gat)                # full-graph GAT arxiv
    "${PY[@]}" --model gat --dataset ogbn-arxiv --use-tt \
      --tt-rank 16,16 --p-shapes 50,60,60 --q-shapes 8,4,4 \
      --epochs 200 --lr 0.002 --num-heads 3 ;;
  final-papers)       # papers100M: big p-shapes + cache + sparse TT updates
    "${PY[@]}" --model sage --dataset ogbn-papers100M --use-tt \
      --tt-rank 16,16 --p-shapes 400,500,600 --q-shapes 4,4,8 \
      --sparse --use-cached --cache-size 500000 \
      --batch 1024 --fan-out 5,10,15 --epochs 2 ;;
  papers-rehearsal)   # papers100M dress rehearsal (VERDICT r2 item 7):
                      # the full papers pipeline shape at reduced node
                      # count on an 8-device virtual mesh — real TT config
                      # p=400,500,600 / q=4,4,8, node-sharded ragged-ring
                      # full-neighbor training on the hybrid data x node
                      # mesh, sparse + cache flags on
    XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8 --xla_cpu_enable_concurrency_optimized_scheduler=false" \
    "${PY[@]}" --model sage --dataset hard-ogbn-papers100M \
      --synthetic-scale 0.0001 --device cpu --use-tt \
      --tt-rank 16,16 --p-shapes 400,500,600 --q-shapes 4,4,8 \
      --full-neighbor --node-shard --dist --sparse \
      --use-cached --cache-size 256 --batch 512 --epochs 1 ;;
  autotuning)         # nevergrad/ES TT-rank search (tuning_SAGE.py parity)
    "${PY[@]}" --model sage --dataset ogbn-products --use-tt --autotune \
      --tune-budget 20 --batch 1024 --fan-out 5,10,15 ;;
  dist)               # data-parallel over all local devices
    "${PY[@]}" --model sage --dataset ogbn-products --use-tt \
      --tt-rank 16,16 --dist --batch 1024 --fan-out 5,10,15 --epochs 2 ;;
  p3|run-one)         # single fwd/bwd step (profiling, run_script.sh:201-222)
    "${PY[@]}" --model sage --dataset ogbn-products --use-tt --run-one \
      --tt-rank 16,16 --batch 1024 --fan-out 5,10,15 ;;
  puregpu)            # device-resident graph + on-device sampling (fastest
                      # TPU path: per-dispatch transfer is seeds+labels only)
    "${PY[@]}" --model sage --dataset ogbn-products --use-tt \
      --tt-rank 16,16 --p-shapes 125,140,140 --q-shapes 5,5,4 \
      --mode puregpu --steps-per-call 48 --partition 128 \
      --batch 1024 --fan-out 5,10,15 --epochs 2 ;;
  sparse-fused)       # fused Pallas backward+SGD TT-core updates
    "${PY[@]}" --model sage --dataset ogbn-products --use-tt \
      --tt-rank 16,16 --p-shapes 125,140,140 --q-shapes 5,5,4 \
      --sparse --partition 128 \
      --batch 1024 --fan-out 5,10,15 --epochs 2 ;;
  full-neighbor)      # exact-aggregation training (NoTT-FullNeighbor rows)
    "${PY[@]}" --model sage --dataset ogbn-products --no-tt \
      --full-neighbor --batch 1024 --epochs 2 ;;
  node-shard)         # node-space-sharded layer-wise inference (multi-chip)
    "${PY[@]}" --model sage --dataset ogbn-papers100M --use-tt \
      --tt-rank 16,16 --p-shapes 400,500,600 --q-shapes 4,4,8 \
      --node-shard --sparse --batch 1024 --fan-out 5,10,15 --epochs 2 ;;
  smoke)              # tiny CPU smoke run (partition 4: locality reorder —
                      # the default 0 random-permutes ids, reference parity)
    "${PY[@]}" --device cpu --model sage --dataset smoke --synthetic-scale 1 \
      --batch 128 --fan-out 4,4 --num-hidden 32 --num-layers 2 \
      --tt-rank 4,4 --init normal --epochs 2 --eval-every 2 --partition 4 ;;
  *)
    echo "unknown preset: $PRESET" >&2
    echo "presets: baseline fbtt-products final-p final-p2 final-p2-bf16 gcn gat final-papers papers-rehearsal autotuning dist puregpu sparse-fused full-neighbor node-shard run-one smoke" >&2
    exit 1 ;;
esac
