"""Cross-check the analytic MFU model against an xplane trace (VERDICT r4
item 6): `scripts/mfu_report.py` counts FLOPs/bytes from program
structure; this captures ONE device trace of the same fused-sparse
products step and reconciles the model's two dominant terms —

  - TT kernel time: modeled kernel FLOPs at the measured custom-call
    duration -> implied TFLOP/s (sanity: must be below MXU peak)
  - conv tower time: modeled tower FLOPs over the measured
    fusion/convolution op durations
  - total step: modeled HBM bytes at the measured non-kernel time

and prints modeled-vs-measured ratios.  ±20% is acceptance; the point is
that the published MFU table's inputs are traceable to op-level
measurement, not just arithmetic.

Usage: python scripts/r5_mfu_xcheck.py [S=48] [--bf16]  (chip; serialized)
"""

import glob
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np

from mfu_report import products_step_model, PEAK_BF16, HBM_BW


def capture(S: int, bf16: bool, logdir: str):
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
    t0 = time.time()
    v, o, loss, acc = tr._multi_fn(v, o, packed, jax.random.fold_in(rng, 1))
    float(loss)
    wall = time.time() - t0
    print(f"steady dispatch: {wall:.2f}s for {S} steps "
          f"({wall / S * 1e3:.1f} ms/step incl. relay)", flush=True)

    with jax.profiler.trace(logdir):
        v, o, loss, acc = tr._multi_fn(v, o, packed, jax.random.fold_in(rng, 2))
        float(loss)
    print("trace captured", flush=True)


def aggregate(logdir: str, S: int):
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        sys.exit(f"no xplane files under {logdir}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    # Two disjoint views (the first session-2 capture summed EVERY event
    # on every XLA line, so nested parents — jit module, while bodies —
    # double-counted into a 154 ms "total" for a 33 ms step):
    #   module_ms: the "XLA Modules" line's whole-program events — the
    #              honest device total per dispatch
    #   agg:       leaf ops from the "XLA Ops" line only, control-flow
    #              parents (while./conditional./call.) excluded
    agg = defaultdict(float)
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
                    n = meta.get(ev.metadata_id, "?")
                    if n.lstrip("%").startswith(("while.", "conditional.",
                                                 "call.")):
                        continue
                    agg[n] += ev.duration_ps / 1e9
    return agg, module_ms  # ms over the S-step dispatch


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bf16 = "--bf16" in sys.argv
    S = int(args[0]) if args else 48
    logdir = args[1] if len(args) > 1 else "/tmp/jax_trace_r5"

    capture(S, bf16, logdir)
    agg, module_ms = aggregate(logdir, S)

    kern = sum(ms for n, ms in agg.items()
               if "custom-call" in n or "closed_call" in n or "tt_" in n
               or "pallas" in n)
    # tower GEMMs land in XLA fusions named after dots/convolutions
    tower = sum(ms for n, ms in agg.items()
                if ("fusion" in n or "dot" in n or "convolution" in n)
                and not ("custom-call" in n or "closed_call" in n
                         or "tt_" in n))
    total = module_ms if module_ms else sum(agg.values())
    other = total - kern - tower

    m = products_step_model(bf16)
    kern_ms, tower_ms = kern / S, tower / S
    total_ms = total / S
    out = {
        "bf16": bf16, "steps": S,
        "measured_ms_per_step": {"tt_kernel": round(kern_ms, 2),
                                 "tower+fusions": round(tower / S, 2),
                                 "other": round(other / S, 2),
                                 "device_total": round(total_ms, 2)},
        # modeled TT FLOPs at measured kernel time -> implied TFLOP/s
        "tt_implied_tflops": round(m["tt_flops"] / (kern_ms / 1e3) / 1e12, 1)
        if kern_ms else None,
        "tower_implied_tflops": round(
            m["tower_flops"] / (tower_ms / 1e3) / 1e12, 1) if tower_ms else None,
        "model_total_flops": m["flops"],
        "model_bytes": m["bytes"],
        "model_mfu_at_measured_total_pct": round(
            100 * m["flops"] / (total_ms / 1e3) / PEAK_BF16, 2),
        "model_hbm_util_at_measured_total_pct": round(
            100 * m["bytes"] / (total_ms / 1e3) / HBM_BW, 1),
    }
    print(json.dumps(out, indent=1))
    print("\ntop ops (ms/step):")
    for n, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms / S:7.3f}  {n[:110]}")


if __name__ == "__main__":
    main()
