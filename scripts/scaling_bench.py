"""Scaling-efficiency harness: edges/s for DP training at 1..N devices
(BASELINE.json north star: >=80% efficiency at 1 chip / 1 host / N hosts).

On a multi-chip host this measures real ICI scaling; on the dev box it
runs against the 8-device virtual CPU mesh (methodology check, not a perf
claim).  Prints one JSON line per device count plus the efficiency table.

Usage: python scripts/scaling_bench.py [--devices 1,2,4,8] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=str, default="1,2,4,8")
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--fanouts", type=str, default="5,10,15")
    ap.add_argument("--num-nodes", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from falcon_ttdforgnns_tpu.graph import synthetic_dataset, sample_block
    from falcon_ttdforgnns_tpu.models import SAGE
    from falcon_ttdforgnns_tpu.parallel import (make_mesh, make_dp_train_step,
                                                shard_batch, replicate,
                                                scaling_efficiency)
    from falcon_ttdforgnns_tpu.train.optim import make_optimizer

    fanouts = tuple(int(x) for x in args.fanouts.split(","))
    ds = synthetic_dataset(num_nodes=args.num_nodes, avg_degree=10,
                           num_classes=16, feat_dim=64, seed=0)
    # edges "processed" per step = sampled edges in the fanout tree
    edges_per_batch = args.batch * sum(
        int(np.prod(fanouts[len(fanouts) - l - 1:])) for l in range(len(fanouts)))

    model = SAGE(num_nodes=ds.num_nodes, in_dim=64, hidden_dim=128,
                 num_classes=16, num_layers=len(fanouts), use_tt=True,
                 tt_ranks=(8, 8), weight_dist="normal", dropout=0.5)
    tx = make_optimizer(lr=1e-3, plateau=False)

    rng = np.random.default_rng(0)
    results = {}
    for n in [int(x) for x in args.devices.split(",")]:
        if n > jax.device_count():
            continue
        mesh = make_mesh(n_data=n, devices=jax.devices()[:n])
        step = make_dp_train_step(model, tx, mesh)
        batch = sample_block(ds.graph, rng.integers(0, ds.num_nodes, args.batch),
                             fanouts, rng)
        seeds = jnp.asarray(batch.seeds)
        layers = tuple(jnp.asarray(l) for l in batch.layers)
        labels = jnp.asarray(ds.labels[np.asarray(batch.seeds)].astype(np.int32))
        key = jax.random.PRNGKey(0)
        variables = model.init({"params": key, "dropout": key}, seeds, layers)
        vs = replicate(mesh, variables)
        os_ = replicate(mesh, tx.init(variables["params"]))
        s, y = shard_batch(mesh, seeds, labels)
        ls = tuple(shard_batch(mesh, l) for l in layers)
        k = replicate(mesh, key)

        vs, os_, loss, _ = step(vs, os_, s, ls, y, k)  # compile
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            vs, os_, loss, _ = step(vs, os_, s, ls, y, k)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.steps
        eps = edges_per_batch / dt
        results[n] = eps
        print(json.dumps({"devices": n, "step_ms": round(dt * 1e3, 2),
                          "edges_per_s": round(eps)}))

    eff = scaling_efficiency(results)
    print(json.dumps({"scaling_efficiency": {str(k): round(v, 3)
                                             for k, v in eff.items()}}))


if __name__ == "__main__":
    main()
