"""Op-level profile of the --sparse train step (round-3 attribution).

Captures a jax.profiler trace of one 48-step fused-sparse dispatch at
products scale and aggregates the TPU device plane's XLA-op events by
name — the op-by-op account of the step the bisection variants
(step_bisect_r3.py) bracket from outside.

The xplane protobuf is parsed directly (tensorflow.tsl proto; the
tensorboard_plugin_profile converter in this image is version-mismatched
with its TF).

Usage: python scripts/step_profile_r3.py [S] [logdir]
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bf16 = "--bf16" in sys.argv
    S = int(args[0]) if args else 48
    logdir = args[1] if len(args) > 1 else "/tmp/jax_trace_r3"

    import jax
    import jax.numpy as jnp
    from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
    from train_bench import get_products_scale_dataset

    ds = get_products_scale_dataset()
    cfg = TrainConfig(batch_size=1024, fanouts=(5, 10, 15),
                      hidden_dim=256, num_layers=3, use_tt=True,
                      tt_ranks=(16, 16), p_shapes=(125, 140, 140),
                      q_shapes=(5, 5, 4), weight_dist="approx-normal",
                      steps_per_call=S, sparse=True, bf16=bf16,
                      eval_every=10**9, log_every=10**9)
    tr = SageTrainer(ds, cfg)
    it = iter(tr.loader)
    group = [next(it) for _ in range(S)]
    packed = jnp.asarray(tr._pack_group(group))
    rng = tr._epoch_rng(0)

    t0 = time.time()
    v, o, loss, acc = tr._multi_fn(tr.variables, tr.opt_state, packed, rng)
    float(loss)
    print(f"compile+warmup: {time.time() - t0:.1f}s", flush=True)

    with jax.profiler.trace(logdir):
        v, o, loss, acc = tr._multi_fn(v, o, packed,
                                       jax.random.fold_in(rng, 1))
        float(loss)
    print("trace captured", flush=True)

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("NO XPLANE FILES under", logdir)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    print("planes:", [p.name for p in xs.planes])
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        meta = {k: m.name for k, m in plane.event_metadata.items()}
        agg = defaultdict(float)
        cnt = defaultdict(int)
        total = 0.0
        for line in plane.lines:
            lname = line.name
            if "XLA Ops" not in lname and "XLA" not in lname:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # ms
                agg[name] += dur
                cnt[name] += 1
                total += dur
        print(f"\n== plane {plane.name}: XLA-op total {total:.2f} ms over "
              f"{S} steps ({total / S:.2f} ms/step)")
        rows = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
        for name, ms in rows:
            print(f"  {ms / S:7.3f} ms/step  x{cnt[name] // S:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
