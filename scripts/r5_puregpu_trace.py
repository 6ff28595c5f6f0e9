"""Xplane trace of the PUREGPU train step (in-jit sampling) — round-5
perf attribution.  The certified fused-sparse step runs 54.8 ms/step in
puregpu mode vs 33.9 ms with host-loaded batches: ~21 ms/step is the
device-side CSR fanout sampler.  This captures one steady epoch group
dispatch and aggregates XLA op times so the sampler's cost is
attributed op-by-op (gather? sort? rng?) instead of inferred by
subtraction.

Usage: python scripts/r5_puregpu_trace.py [S=48] [--bf16]  (chip)
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bf16 = "--bf16" in sys.argv
    S = int(args[0]) if args else 48
    logdir = args[1] if len(args) > 1 else "/tmp/jax_trace_r5pg"

    import jax
    from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
    from train_bench import get_products_scale_dataset

    ds = get_products_scale_dataset()
    cfg = TrainConfig(batch_size=1024, fanouts=(5, 10, 15),
                      hidden_dim=256, num_layers=3, use_tt=True,
                      tt_ranks=(16, 16), p_shapes=(125, 140, 140),
                      q_shapes=(5, 5, 4), weight_dist="approx-normal",
                      steps_per_call=S, sparse=True, bf16=bf16,
                      mode="puregpu",
                      eval_every=10**9, log_every=10**9)
    tr = SageTrainer(ds, cfg)
    t0 = time.time()
    tr.train_epoch(0)  # compile + first epoch
    print(f"epoch 0 (compile): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    with jax.profiler.trace(logdir):
        tr.train_epoch(1)
    print(f"epoch 1 (traced): {time.time() - t0:.1f}s, steps {tr.step}",
          flush=True)

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        sys.exit(f"no xplane files under {logdir}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    n_steps = tr.step // 2  # two epochs' steps; epoch 1 traced
    # leaf ops from the "XLA Ops" line only (control-flow parents
    # excluded); module line separately for the honest device total —
    # summing every XLA line double-counts nested events (the bug the
    # first session-2 mfu_xcheck capture hit)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    module_ms = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        meta = {k: m.name for k, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_ms += sum(ev.duration_ps / 1e9 for ev in line.events)
            elif line.name == "XLA Ops":
                for ev in line.events:
                    name = meta.get(ev.metadata_id, "?")
                    if name.lstrip("%").startswith(("while.", "conditional.",
                                                    "call.")):
                        continue
                    agg[name] += ev.duration_ps / 1e9
                    cnt[name] += 1
    total = sum(agg.values())
    print(f"\ndevice module total {module_ms / max(n_steps, 1):.2f} ms/step; "
          f"leaf-op total {total:.1f} ms over ~{n_steps} steps "
          f"({total / max(n_steps, 1):.2f} ms/step)")
    for n, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:35]:
        print(f"  {ms / max(n_steps, 1):7.3f} ms/step x{cnt[n]:<6d} {n[:110]}")


if __name__ == "__main__":
    main()
