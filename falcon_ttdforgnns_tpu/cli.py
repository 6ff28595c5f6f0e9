"""Unified CLI driver.

Replaces the reference's three entry scripts (`sage_dgl_partition.py`,
`gcn_gat_partition.py`, `tuning_SAGE.py`) behind one flag-compatible
command:

    python -m falcon_ttdforgnns_tpu.cli --model sage --dataset ogbn-products \
        --use-tt --tt-rank 16,16 --partition 128 --batch 1024 --fan-out 5,10,15

Dispatch: sampled SAGE training (--model sage), full-graph GCN/GAT
(--model gcn|gat), --autotune wraps either in the TT-rank tuner,
--run-one executes a single fwd/bwd step (profiling parity,
`sage_profiler.py:715-787`).
"""

from __future__ import annotations

import json
import sys
import time
from typing import Optional

import numpy as np


def main(argv=None):
    from .utils.config import parse_args, apply_preset
    from .utils.logger import get_logger

    args = apply_preset(parse_args(argv))
    logger = get_logger("falcon_tpu", args.log_dir)

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.multihost:
        # DCN-spanning multi-host bootstrap (SURVEY §2.4 TPU-native DDP
        # analog of `dist.init_process_group`, sage_dgl_partition.py:203)
        from .parallel.mesh import init_multihost
        init_multihost(logger=logger)

    if args.emb_name == "dense":
        args.use_tt = False

    from .graph import get_dataset
    from .graph.reorder import reorder_permutation_cached
    from .train import (SageTrainer, TrainConfig, FullGraphTrainer,
                        FullGraphConfig)
    from .train.checkpoint import save_checkpoint
    from .utils import metrics as M

    t0 = time.time()
    ds = get_dataset(args.dataset, synthetic_scale=args.synthetic_scale,
                     seed=args.seed, official_split=args.official_split)
    logger.info(f"dataset {ds.name}: {ds.num_nodes} nodes, "
                f"{ds.graph.num_edges} edges ({time.time() - t0:.1f}s)")

    # partition semantics mirror `graphloader.py:399-454` exactly — the
    # default 0 RANDOM-PERMUTES node ids (the reference's baseline), >0 is
    # METIS-k, -1 multilevel, -2 RCMK, -3 degree, -4 louvain.
    # disk-cached: partitioning papers100M-scale graphs is a multi-hour
    # job; the permutation is keyed on graph shape + flags
    t0 = time.time()
    perm = reorder_permutation_cached(ds.graph, args.partition,
                                      levels=args.p_shapes, seed=args.seed)
    if perm is not None:
        ds = ds.permute(perm)
        logger.info(f"reorder partition={args.partition}: {time.time() - t0:.1f}s")

    precomputed = _maybe_init_cores(args, ds, logger)

    def run_once(tt_ranks):
        if args.model == "sage":
            cfg = TrainConfig(
                batch_size=args.batch, fanouts=tuple(args.fan_out),
                epochs=args.epochs, lr=args.lr, dropout=args.dropout,
                weight_decay=args.wd,
                hidden_dim=args.num_hidden, num_layers=args.num_layers,
                use_tt=args.use_tt, tt_ranks=tuple(tt_ranks),
                p_shapes=tuple(args.p_shapes) if args.p_shapes else None,
                q_shapes=tuple(args.q_shapes) if args.q_shapes else None,
                weight_dist=args.init if args.init in (
                    "normal", "uniform", "naive-uniform", "approx-normal",
                    "approx-uniform") else "approx-normal",
                cache_size=args.cache_size if args.use_cached else 0,
                tt_optimizer=args.tt_optimizer,
                plateau_patience=args.plateau_patience,
                plateau_rtol=args.plateau_rtol,
                plateau_smooth=args.plateau_smooth,
                sparse=args.sparse,
                batch_count=args.batch_count,
                spmm=args.spmm,
                mode=args.mode,
                sampler=args.sampler,
                table_width=args.table_width,
                rng_impl=args.rng_impl,
                num_workers=args.num_workers,
                use_sample=args.use_sample,
                grouped=(args.emb_name == "eff"),
                node_shard=args.node_shard,
                steps_per_call=args.steps_per_call,
                access_counts=args.access_counts and not args.use_tt,
                skip_eval=args.skip_eval,
                eval_sampled=args.eval_sampled,
                eval_sample_max=args.eval_sample_max,
                eval_every=args.eval_every,
                log_every=args.log_every,
                seed=args.seed, dist=args.dist, num_chips=args.num_chips,
                data_shards=args.data_shards, bf16=args.bf16,
                bf16_tower=args.bf16_tower, bf16_kernel=args.bf16_kernel,
                bf16_mean_f32=args.bf16_mean_f32, bf16_sr=args.bf16_sr,
                bf16_f32_head=args.bf16_f32_head,
                bf16_f32_first=args.bf16_f32_first)
            trainer = SageTrainer(ds, cfg, logger=logger,
                                  precomputed_cores=precomputed)
        else:
            cfg = FullGraphConfig(
                model=args.model, epochs=args.epochs, lr=args.lr,
                weight_decay=args.wd, dropout=args.dropout,
                hidden_dim=args.num_hidden, num_layers=args.num_layers,
                num_heads=args.num_heads, use_linear=args.use_linear,
                use_labels=args.use_labels, use_tt=args.use_tt,
                tt_ranks=tuple(tt_ranks),
                p_shapes=tuple(args.p_shapes) if args.p_shapes else None,
                q_shapes=tuple(args.q_shapes) if args.q_shapes else None,
                weight_dist=args.init if args.init in (
                    "normal", "uniform", "naive-uniform", "approx-normal",
                    "approx-uniform") else "approx-normal",
                spmm=args.spmm,  # trainer validates (gat+blocked raises)
                eval_every=args.eval_every, seed=args.seed)
            trainer = FullGraphTrainer(ds, cfg, logger=logger,
                                       precomputed_cores=precomputed)

        if args.run_one:
            stats = trainer.train_epoch(0) if args.model != "sage" else None
            if args.model == "sage":
                batch = next(iter(trainer.loader))
                import jax, jax.numpy as jnp
                rng = jax.random.PRNGKey(0)
                t1 = time.perf_counter()
                trainer.variables, trainer.opt_state, loss, acc = trainer._step_fn(
                    trainer.variables, trainer.opt_state,
                    jnp.asarray(batch.seeds),
                    [jnp.asarray(l) for l in batch.layers],
                    jnp.asarray(batch.labels), rng)
                jax.block_until_ready(loss)
                stats = {"loss": float(loss), "step_time": time.perf_counter() - t1}
            logger.info(f"run-one: {stats}")
            return stats

        with M.profile_trace(args.profile_dir if args.profile else None):
            result = trainer.fit()
        logger.info(f"best: {result['best']}")
        if args.save_pred and not args.skip_eval:
            # per-node prediction dump (`sage_dgl_partition.py:373-374`)
            import numpy as _np
            logits = trainer.infer_full() if hasattr(trainer, "infer_full") else None
            if logits is not None:
                _np.savez(f"{args.ckpt_dir}/pred_{args.model}_{args.dataset}.npz",
                          pred=logits.argmax(-1), logits=logits)
                logger.info("saved predictions")
        if args.store_emb and args.use_tt:
            # final embedding-table dump (`gcn_gat_partition.py:341-344`),
            # chunk-materialized via TT
            import numpy as _np
            import jax.numpy as _jnp
            from .graph.sampler import full_neighbor_chunks as _chunks
            from .models.sage import SAGE as _SAGE
            import jax as _jax
            mat = _jax.jit(lambda v, ids: trainer.model.apply(
                v, ids, method=type(trainer.model).materialize_features))
            rows = [
                _np.asarray(mat(trainer.variables, _jnp.asarray(ids)))
                for ids in _chunks(ds.num_nodes, 65536)
            ]
            emb = _np.concatenate(rows, axis=0)[: ds.num_nodes]
            _np.save(f"{args.ckpt_dir}/emb_{args.init}_tt{args.tt_rank[0]}"
                     f"_part{args.partition}.npy", emb)
            logger.info("stored embedding table")
        if args.access_counts or args.plot:
            stats = trainer.access_count_stats() if hasattr(
                trainer, "access_count_stats") else None
            if stats:
                logger.info(f"access skew (top-x%% of rows -> %% of accesses): "
                            f"{stats['percentages']}")
                if args.plot:
                    M.plot_access_cdf(stats["counts"],
                                      f"{args.log_dir}/access_cdf.png")
        logger.info(f"embed params MB: "
                    f"{M.model_size_mb(trainer.variables['params'].get('embed', {})):.2f}")
        if args.save_model:
            path = save_checkpoint(args.ckpt_dir, trainer_step(trainer),
                                   trainer.variables, trainer.opt_state,
                                   {"best": result["best"]})
            logger.info(f"checkpoint: {path}")
        return result

    if args.autotune:
        from .utils.tuner import tune_tt_rank

        def tput_of(ranks):
            args_epochs = args.epochs
            args.epochs = 1
            try:
                res = run_once(ranks)
            finally:
                args.epochs = args_epochs
            hist = res["history"][-1] if isinstance(res, dict) and "history" in res else res
            return hist.get("samples_per_s", hist.get("edges_per_s", 1.0))

        tr = tune_tt_rank(tput_of, budget=args.tune_budget, seed=args.seed)
        print(json.dumps({"best_ranks": tr.best_params,
                          "objective": tr.best_value}))
        return

    best = None
    base_seed = args.seed
    for run in range(args.n_runs):
        args.seed = base_seed + run
        result = run_once(args.tt_rank)
        if isinstance(result, dict) and "best" in result:
            if best is None or result["best"]["test_acc"] > best["test_acc"]:
                best = result["best"]
    if best:
        print(json.dumps({"best": best}))


def trainer_step(trainer) -> int:
    return getattr(trainer, "step", 0)


def _maybe_init_cores(args, ds, logger):
    """ortho/eigen/dortho core init (gnn_model.py:129-178)."""
    if not args.use_tt or args.init in ("normal", "uniform", "naive-uniform",
                                        "approx-normal", "approx-uniform"):
        return None
    from .ops import make_tt_shapes, tt_init

    shapes = make_tt_shapes(ds.num_nodes, ds.feat_dim, tuple(args.tt_rank),
                            tuple(args.p_shapes) if args.p_shapes else None,
                            tuple(args.q_shapes) if args.q_shapes else None)
    t0 = time.time()
    if args.init == "ortho":
        cores = tt_init.init_ortho(shapes, seed=args.seed)
    elif args.init == "dortho":
        cores = tt_init.init_dortho(shapes, seed=args.seed)
    elif args.init == "eigen":
        cores = tt_init.init_eigen(shapes, ds.graph.indptr, ds.graph.indices,
                                   seed=args.seed)
    else:
        return None
    logger.info(f"init={args.init} cores in {time.time() - t0:.1f}s")
    return tuple(cores)


if __name__ == "__main__":
    main()
