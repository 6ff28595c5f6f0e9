"""Device-limited train-step timing at products scale.

Packs S sampled batches once, then dispatches the jitted S-step
fori_loop R times back-to-back (one host readback at the end) — the
per-dispatch relay overhead amortizes over R*S optimizer steps, so
wall/(R*S) approaches the true device step time (round-1 methodology;
see docs/PERFORMANCE.md).

Usage: python scripts/step_probe.py [S] [R] [--sparse] [--puregpu]
                                    [--table] [--dropout0]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sparse = "--sparse" in sys.argv
    puregpu = "--puregpu" in sys.argv
    table = "--table" in sys.argv      # --sampler table (implies puregpu)
    dropout0 = "--dropout0" in sys.argv  # isolate dropout PRNG+mask cost
    rbg = "--rbg" in sys.argv          # TPU hardware RNG for in-step bits
    bf16 = "--bf16" in sys.argv        # bf16 conv-tower activations
    bf16_tower = "--bf16-tower" in sys.argv    # attribution halves
    bf16_kernel = "--bf16-kernel" in sys.argv
    # fused rowwise-adagrad core updates (vs the default fused SGD)
    adagrad = "--adagrad" in sys.argv
    puregpu = puregpu or table

    import jax
    import jax.numpy as jnp
    import numpy as np
    from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
    from train_bench import get_products_scale_dataset

    ds = get_products_scale_dataset()
    cfg = TrainConfig(batch_size=1024, fanouts=(5, 10, 15),
                      hidden_dim=256, num_layers=3, use_tt=True,
                      tt_ranks=(16, 16), p_shapes=(125, 140, 140),
                      q_shapes=(5, 5, 4), weight_dist="approx-normal",
                      steps_per_call=S, sparse=sparse,
                      mode="puregpu" if puregpu else "mixed",
                      sampler="table" if table else "csr",
                      dropout=0.0 if dropout0 else 0.5,
                      rng_impl="rbg" if rbg else "threefry",
                      bf16=bf16, bf16_tower=bf16_tower,
                      bf16_kernel=bf16_kernel,
                      tt_optimizer="rowwise_adagrad" if adagrad else "adam",
                      eval_every=10**9, log_every=10**9)
    t0 = time.time()
    tr = SageTrainer(ds, cfg)
    print(f"trainer init {time.time() - t0:.0f}s (sparse={tr._fused_sparse} "
          f"mode={cfg.mode})", flush=True)

    rng = tr._epoch_rng(0)
    if puregpu:
        B = cfg.batch_size
        pick = np.random.default_rng(0).choice(ds.train_idx, S * B)
        packed_np = np.empty((S, B, 2), np.int32)
        packed_np[:, :, 0] = pick.reshape(S, B)
        packed_np[:, :, 1] = ds.labels[pick].reshape(S, B)
        packed = jnp.asarray(packed_np)

        idx_arg = (tr._table_dev if getattr(tr, "_table_dev", None)
                   is not None else tr._indices_dev)

        def dispatch(v, o, k):
            return tr._device_multi_fn(v, o, packed, k,
                                       tr._indptr_dev, idx_arg)
    else:
        it = iter(tr.loader)
        group = [next(it) for _ in range(S)]
        packed = jnp.asarray(tr._pack_group(group))

        def dispatch(v, o, k):
            return tr._multi_fn(v, o, packed, k)

    t0 = time.time()
    v, o, loss, acc = dispatch(tr.variables, tr.opt_state, rng)
    float(loss)
    print(f"compile+first dispatch ({S} steps): {time.time() - t0:.1f}s",
          flush=True)

    t0 = time.time()
    for r in range(R):
        v, o, loss, acc = dispatch(v, o, jax.random.fold_in(rng, r))
    loss_f = float(loss)  # forces the chain (relay block_until_ready lies)
    dt = time.time() - t0
    print(f"{R} dispatches x {S} steps: {dt:.2f}s -> "
          f"{dt / (R * S) * 1e3:.1f} ms/step  (loss {loss_f:.3f})", flush=True)


if __name__ == "__main__":
    main()
