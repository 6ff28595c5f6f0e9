"""Sampled-minibatch GraphSAGE training driver.

Re-design of the reference's single-device driver
(`sage_dgl_partition.py:257-423` ``run_single`` + ``train``): host-side
neighbor sampler feeds static-shape batches into one jitted train step;
the LFU cache follows the warmup -> populate -> cached-serving lifecycle
(`sage_dgl_partition.py:350-361`); evaluation is layer-wise full-neighbor
inference (`gnn_model.py:220-253`).  Data parallelism is a sharding
annotation, not a code path (parallel/data_parallel.py).
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..graph.csr import NodeDataset
from ..graph.sampler import NeighborLoader, full_neighbor_chunks
from ..models.sage import SAGE
from .optim import make_optimizer, cache_populate_apply


@dataclass
class TrainConfig:
    """Mirrors the reference flag system (`tt_utils.py:17-85`); see
    utils/config.py for the CLI mapping."""

    batch_size: int = 1024
    fanouts: Tuple[int, ...] = (5, 10, 15)
    epochs: int = 2
    lr: float = 0.003
    weight_decay: float = 0.0
    dropout: float = 0.5
    hidden_dim: int = 256
    num_layers: int = 3
    use_tt: bool = True
    tt_ranks: Tuple[int, ...] = (16, 16)
    p_shapes: Optional[Tuple[int, ...]] = None
    q_shapes: Optional[Tuple[int, ...]] = None
    weight_dist: str = "approx-normal"
    cache_size: int = 0
    tt_optimizer: str = "adam"
    # ReduceLROnPlateau patience in steps; 0 disables it entirely; -1 =
    # AUTO: 800 (reference parity) in f32, DISABLED under a bf16 tower —
    # the round-4 full-bf16 ~0.933 accuracy ceiling was the plateau
    # ratchet reading bf16 loss noise as no-improvement and halving the
    # lr into the noise floor (round-5 chip probe: plateau-off bf16
    # restores the f32 convergence pace; logs/r5_cert.log)
    plateau_patience: int = -1
    plateau_rtol: float = 1e-4   # torch ReduceLROnPlateau threshold parity
    # EMA smoothing of the plateau's loss input (manual knob; 0 = raw
    # torch parity).  Synthetic sweeps show the EMA's autocorrelation can
    # itself trip the patience on slow trends, so it is NOT auto-enabled.
    plateau_smooth: float = 0.0
    eval_every: int = 1
    log_every: int = 20
    seed: int = 0
    inference_chunk: int = 65536
    edge_chunk: int = 1 << 22
    # Full-graph aggregation backend for evaluation: "xla" (chunked
    # gather+segment-sum — measured fastest at products scale on v5e:
    # 2.33 s vs 6.04 s/pass for the Pallas tiled kernel, which pays the
    # same HBM gather PLUS one-hot matmul work; scripts/spmm_eval_bench.py)
    # or "pallas" (opt-in tiled segment-matmul kernel).
    spmm: str = "xla"
    access_counts: bool = False  # LoggingEmbedding analytics (no-TT mode)
    skip_eval: bool = False      # skip evaluation entirely (--skip-eval)
    dist: bool = False          # data-parallel over the device mesh
    num_chips: int = -1         # -1 = all devices
    # hybrid data x node mesh width (--dist --node-shard); -1 = one data
    # group per host (DCN data x ICI node), or 2 on a single host
    data_shards: int = -1
    # --bf16: conv tower activations in bfloat16 (params and TT cores stay
    # f32) — halves the step's dominant HBM traffic
    bf16: bool = False
    # precision-attribution knobs (r4 bf16-convergence diagnosis): enable
    # HALF of what --bf16 covers.  bf16_tower runs the conv tower in bf16
    # with f32 kernel I/O; bf16_kernel stores h_all / consumes d_h in bf16
    # under an f32 tower.  cfg.bf16 implies both.
    bf16_tower: bool = False
    bf16_kernel: bool = False
    # f32-accumulated fanout means under a bf16 tower (candidate fix for
    # the bf16 convergence lag; see models/sage.py mean_acc_f32)
    bf16_mean_f32: bool = False
    # stochastic rounding on the fused kernel's bf16 h_all store (candidate
    # fix for the kernel half of the lag; ops/tt_pallas.py _sr_cast)
    bf16_sr: bool = False
    # tower-ceiling mechanism probes (r5): f32 last / first conv layer
    # under a bf16 tower (models/sage.py bf16_f32_head / bf16_f32_first)
    bf16_f32_head: bool = False
    bf16_f32_first: bool = False
    # Device-resident multi-step: stack S sampled batches host-side and run
    # S optimizer steps inside one jitted fori_loop per dispatch.  Amortizes
    # host/dispatch overhead (essential under remote-attached TPUs; measured
    # 95 ms/step in-loop vs seconds when dispatched singly) and is the
    # TPU-idiomatic trainer shape.  1 = classic per-step dispatch.
    steps_per_call: int = 8
    # --sparse: fused Pallas backward+SGD on the TT cores (the functional
    # analog of `Fused_Efficient_TT_backward_sgd_cuda`, ecu:718-904).
    # Requires 3-core TT and no row cache; falls back to routed optax SGD
    # otherwise (EXACT_SGD semantics either way).
    sparse: bool = False
    # --batch-count: TT lookup chunk size / VMEM budget knob (cu:1027).
    batch_count: int = 131072
    # --mode: 'mixed' = host-side sampling (UVA analog); 'puregpu' = CSR
    # arrays in HBM, sampling runs INSIDE the jitted step (device_sampler).
    mode: str = "mixed"
    # --sampler (puregpu only): 'csr' = per-edge gathers from the CSR
    # indices array; 'table' = prebuilt (N, table_width) iid-uniform
    # neighbor table — one contiguous row-gather per frontier node instead
    # of `fanout` scalar gathers (exact marginal distribution, bounded
    # per-run neighbor diversity; see device_sampler.build_neighbor_table).
    sampler: str = "csr"
    table_width: int = 32
    # In-step PRNG implementation: 'threefry' (JAX default, counter-based
    # software PRNG) or 'rbg' (TPU hardware RNG instruction — cheaper bits
    # for dropout masks / sampling randints at identical statistics).
    rng_impl: str = "threefry"
    # --num-workers: host sampler thread-pool width (graphloader.py:261).
    num_workers: int = 1
    # --full-neighbor (use_sample=False): exact-aggregation training via
    # differentiable full-graph propagation (README NoTT-FullNeighbor rows).
    use_sample: bool = True
    # --emb-name eff: Efficient_TT grouped (prefix-dedup) lookup.
    grouped: bool = False
    # node-space sharding for layer-wise inference (papers100M scale-out).
    node_shard: bool = False
    # --eval-sampled: held-out accuracy via the sampled fanout forward
    # instead of full layer-wise inference.  The only feasible eval at
    # papers scale on ONE chip: full inference materializes the (N, D)
    # f32 activations (28 GB at 55.5M nodes — exceeds a v5e's HBM), while
    # sampled eval streams batches through the training forward.
    eval_sampled: bool = False
    # cap on evaluated seeds per split under --eval-sampled (subsample —
    # a 131K sample bounds the split-accuracy standard error under 0.2%)
    eval_sample_max: int = 131072


class _EpochMeter:
    """Per-epoch bookkeeping shared by every train-epoch variant: loss/acc
    device scalars accumulate unsynced (one host sync per log window), a
    throttled throughput log line, and the epoch summary dict."""

    def __init__(self, trainer: "SageTrainer", epoch: int, tag: str = ""):
        self._tr, self._epoch, self._tag = trainer, epoch, tag
        self._losses: List = []
        self._accs: List = []
        self._n_seen = 0
        self._window = 0
        self._t_epoch = time.perf_counter()
        self._t0 = self._t_epoch

    def record(self, loss, acc, n_samples: int, log_now: bool) -> None:
        self._losses.append(loss)
        self._accs.append(acc)
        self._n_seen += n_samples
        self._window += n_samples
        if not log_now:
            return
        jax.block_until_ready(loss)
        dt = time.perf_counter() - self._t0
        tput = self._window / max(dt, 1e-9)
        tr = self._tr
        tr._metrics["loss"].append(float(loss))
        tr._metrics["throughput"].append(tput)
        if tr.logger:
            tr.logger.info(
                f"epoch {self._epoch} step {tr.step} loss {float(loss):.4f} "
                f"acc {float(acc):.4f} {tput:.0f} samples/s{self._tag}")
        self._t0 = time.perf_counter()
        self._window = 0

    def summary(self) -> Dict[str, float]:
        losses = [float(l) for l in self._losses]
        accs = [float(a) for a in self._accs]
        epoch_time = time.perf_counter() - self._t_epoch
        return {
            "loss": float(np.mean(losses)) if losses else float("nan"),
            "train_acc": float(np.mean(accs)) if accs else float("nan"),
            "epoch_time": epoch_time,
            "samples_per_s": self._n_seen / epoch_time,
        }


class SageTrainer:
    def __init__(self, dataset: NodeDataset, config: TrainConfig,
                 logger=None, precomputed_cores=None):
        self.ds = dataset
        self.cfg = config
        self.logger = logger
        cfg = config
        # bf16 sub-mode flags are refinements of a bf16 base mode; a probe
        # run that sets one without its prerequisite would silently train
        # an unchanged config (ADVICE r4) — warn loudly instead
        warn = logger.warning if logger else (lambda m: print(m, file=sys.stderr))
        if cfg.bf16_sr and not (cfg.bf16 or cfg.bf16_kernel):
            warn("--bf16-sr has no effect without --bf16/--bf16-kernel "
                 "(the SR store targets the bf16 h_all); running unchanged")
        elif cfg.bf16_sr and not cfg.sparse:
            warn("--bf16-sr only applies to the fused --sparse path; the "
                 "dense path ignores it and runs unchanged")
        if cfg.bf16_mean_f32 and not (cfg.bf16 or cfg.bf16_tower):
            warn("--bf16-mean-f32 has no effect without --bf16/--bf16-tower "
                 "(the tower means are already f32); running unchanged")
        if (cfg.bf16_f32_head or cfg.bf16_f32_first) and not (
                cfg.bf16 or cfg.bf16_tower):
            warn("--bf16-f32-head/--bf16-f32-first have no effect without "
                 "--bf16/--bf16-tower (the tower is already f32); "
                 "running unchanged")
        self.model = SAGE(
            num_nodes=dataset.num_nodes,
            in_dim=dataset.feat_dim,
            hidden_dim=cfg.hidden_dim,
            num_classes=dataset.num_classes,
            num_layers=cfg.num_layers,
            dropout=cfg.dropout,
            use_tt=cfg.use_tt,
            tt_ranks=cfg.tt_ranks,
            p_shapes=cfg.p_shapes,
            q_shapes=cfg.q_shapes,
            weight_dist=cfg.weight_dist,
            cache_size=cfg.cache_size,
            access_counts=cfg.access_counts,
            precomputed_cores=precomputed_cores,
            batch_count=cfg.batch_count,
            grouped=cfg.grouped,
            # --bf16's precision contract covers the sampled tower only
            # (<=15-term fanout means); full-neighbor training aggregates
            # over TRUE node degrees (thousands of bf16 sum terms at scale)
            # and the ring-SpMM accumulates f32 into the carry — scope the
            # flag to the sampled trainers and run full-neighbor in f32
            bf16=(cfg.bf16 or cfg.bf16_tower) and cfg.use_sample,
            mean_acc_f32=cfg.bf16_mean_f32,
            bf16_f32_head=cfg.bf16_f32_head,
            bf16_f32_first=cfg.bf16_f32_first,
            # with in-jit sampling the host loader never runs, so the
            # device-side LFU counters are the only frequency source
            device_freq=(cfg.mode == "puregpu" and cfg.cache_size > 0),
        )
        patience = cfg.plateau_patience
        if patience < 0:  # AUTO: parity in f32, off under a bf16 tower
            if cfg.bf16 or cfg.bf16_tower:
                patience = 0
                if logger:
                    logger.info(
                        "bf16 tower: reduce-on-plateau auto-disabled (its "
                        "ratchet reads bf16 loss noise as a plateau and "
                        "halves lr into the noise floor — the r4 accuracy "
                        "ceiling); pass --plateau-patience to force it on")
            else:
                patience = 800
        self.tx = make_optimizer(
            lr=cfg.lr, weight_decay=cfg.weight_decay,
            tt_optimizer=cfg.tt_optimizer,
            plateau=patience > 0,
            plateau_patience=max(patience, 1),
            plateau_rtol=cfg.plateau_rtol,
            plateau_smoothing=cfg.plateau_smooth)
        self.loader = NeighborLoader(
            dataset.graph, dataset.train_idx, dataset.labels,
            cfg.fanouts, cfg.batch_size, seed=cfg.seed,
            num_workers=cfg.num_workers)

        rng = jax.random.PRNGKey(cfg.seed)
        dummy = self._dummy_batch()
        self.variables = self.model.init(
            {"params": rng, "dropout": rng}, dummy[0], dummy[1], train=False)
        params = self.variables["params"]
        self.opt_state = self.tx.init(params)
        # Resolve the fused-sparse routing BEFORE optimizer-state creation
        # so the tt_opt collection exists iff a fused step will consume it
        # (a dormant always-zero tt_opt would otherwise ride in variables,
        # DP replication, and checkpoints on branches that train cores via
        # routed optax — e.g. --dist sampled non-puregpu, --full-neighbor).
        # Mirrors the step-fn dispatch below exactly.
        self._fused_sparse = (
            self._want_fused_sparse() and cfg.use_sample
            and (cfg.mode == "puregpu"
                 or not (cfg.dist and jax.device_count() > 1)))
        if self._fused_sparse and cfg.tt_optimizer in ("adagrad",
                                                       "rowwise_adagrad"):
            # fused-adagrad accumulator state rides in the variables pytree
            # (it must flow through every jitted trainer shape — multi-step
            # fori carries, DP replication — and checkpoint like any other
            # collection).  Rowwise keeps one accumulator per p-row
            # (EXACT_ROWWISE_ADAGRAD, cu:1746-1846); per-element matches
            # `update_tt_cores_adagrad_kernel` (cu:399-419).
            embed = params["embed"]
            rw = cfg.tt_optimizer == "rowwise_adagrad"
            self.variables = {**self.variables, "tt_opt": {
                f"acc_{k}": jnp.zeros(
                    embed[f"tt_core_{k}"].shape[:1] if rw
                    else embed[f"tt_core_{k}"].shape, jnp.float32)
                for k in range(len([n for n in embed
                                    if n.startswith("tt_core_")]))}}
        elif self._fused_sparse and cfg.tt_optimizer == "adam":
            # fused-Adam moments + step count (the adaptive fused sparse
            # update — the round-3 certs showed fixed-lr fused SGD stalls
            # at chance on hard graphs; see ops/tt_pallas.py:_adam_kernel)
            embed = params["embed"]
            nc = len([n for n in embed if n.startswith("tt_core_")])
            self.variables = {**self.variables, "tt_opt": {
                **{f"m_{k}": jnp.zeros(embed[f"tt_core_{k}"].shape,
                                       jnp.float32) for k in range(nc)},
                **{f"v_{k}": jnp.zeros(embed[f"tt_core_{k}"].shape,
                                       jnp.float32) for k in range(nc)},
                "t": jnp.zeros((), jnp.int32)}}

        self.mesh = None
        self._multi_fn = None
        self._device_multi_fn = None
        self._full_step_fn = None
        if cfg.dist and not cfg.use_sample and not cfg.node_shard:
            # train_epoch dispatches on use_sample first, so the DP branch's
            # step fns would never be reached — fail loudly instead of
            # crashing on a None _full_step_fn at the first batch
            raise ValueError("--dist is a sampled-minibatch DP path; "
                             "full-neighbor training scales out via "
                             "--node-shard (optionally combined with "
                             "--dist for the hybrid data x node mesh)")
        if cfg.dist and cfg.use_sample and jax.device_count() > 1:
            # DDP analog (`sage_dgl_partition.py:198-255`): mesh DP — params
            # replicated, batch sharded, grads psum'd by XLA.
            from ..parallel import (make_mesh, make_dp_train_step,
                                    make_dp_multi_step, replicate)
            n = cfg.num_chips if cfg.num_chips > 0 else jax.device_count()
            if cfg.batch_size % n:
                raise ValueError(f"batch size {cfg.batch_size} must divide "
                                 f"by the data axis ({n})")
            self.mesh = make_mesh(n_data=n, devices=jax.devices()[:n])
            if cfg.mode == "puregpu":
                # DP x in-jit sampling (VERDICT r2 item 4): the CSR is
                # replicated in every chip's HBM and each chip samples its
                # own batch shard inside the jitted multi-step — the TPU
                # counterpart of the reference's per-rank UVA sampling
                # (`sage_dgl_partition.py:153,164`), instead of N chips
                # funneling through one host sampler.
                self._step_fn = (self._build_fused_sparse_step()
                                 if self._fused_sparse
                                 else self._build_step())
                self._device_multi_fn = self._build_device_multi_step(
                    dp_mesh=self.mesh)
            else:
                self._step_fn = make_dp_train_step(self.model, self.tx,
                                                   self.mesh)
                if cfg.steps_per_call > 1:
                    self._multi_fn = make_dp_multi_step(
                        self.model, self.tx, self.mesh, cfg.steps_per_call,
                        self._layer_widths())
            self.variables = replicate(self.mesh, self.variables)
            self.opt_state = replicate(self.mesh, self.opt_state)
        elif not cfg.use_sample:
            # full-neighbor training (`--full-neighbor`); with --node-shard
            # on a multi-device mesh the activations are row-sharded and
            # aggregation runs as ring SpMM (papers100M training regime).
            # --dist --node-shard additionally shards the minibatch over a
            # 'data' mesh axis (hybrid DCN data x ICI node, SURVEY §2.4).
            self._step_fn = self._build_step()       # run-one compatibility
            self._nshard_train = cfg.node_shard and jax.device_count() > 1
            if self._nshard_train:
                from ..parallel import make_mesh
                n = cfg.num_chips if cfg.num_chips > 0 else jax.device_count()
                n_data = self._resolve_data_shards(n) if cfg.dist else 1
                self._nshard_mesh = make_mesh(n_data=n_data,
                                              n_node=n // n_data,
                                              devices=jax.devices()[:n])
                self._full_step_fn = None  # built after graph placement
            else:
                self._full_step_fn = self._build_full_neighbor_step()
        elif cfg.mode == "puregpu":
            # device-side sampling composes with the fused-sparse body
            self._step_fn = (self._build_fused_sparse_step()
                             if self._fused_sparse else self._build_step())
            self._device_multi_fn = self._build_device_multi_step()
        elif self._fused_sparse:
            self._step_fn = self._build_fused_sparse_step()
            if cfg.steps_per_call > 1:
                self._multi_fn = self._build_multi_step(fused=True)
        elif cfg.steps_per_call > 1:
            self._step_fn = self._build_step()       # eval/run-one path
            self._multi_fn = self._build_multi_step()
        else:
            self._step_fn = self._build_step()
        if cfg.mode == "puregpu" or not cfg.use_sample:
            self._put_graph_on_device()
        if getattr(self, "_nshard_train", False):
            from ..parallel.node_sharding import make_node_sharded_full_step
            self._full_step_fn = make_node_sharded_full_step(
                self.model, self.tx, self._nshard_mesh, cfg.num_layers,
                self._nshard_layout.max_chunks, self._nshard_layout.chunk,
                data_axis="data" if self._nshard_mesh.shape["data"] > 1
                else None)
        if cfg.mode == "puregpu" and cfg.cache_size > 0 and logger:
            logger.warning("--mode puregpu samples on device; host LFU "
                           "frequencies are unavailable (cache populate "
                           "will use device-side counters if enabled)")
        self._metrics: Dict[str, List[float]] = {"loss": [], "throughput": []}
        self.step = 0

    def _resolve_data_shards(self, n_devices: int) -> int:
        """Split n_devices into (data, node) for the hybrid mesh: explicit
        --data-shards wins; else one data group per host (the DCN(data) x
        ICI(node) layout, SURVEY §2.4); single-host defaults to 2 when the
        device count allows (so --dist --node-shard means something)."""
        cfg = self.cfg
        if cfg.data_shards > 0:
            if n_devices % cfg.data_shards:
                raise ValueError(f"--data-shards {cfg.data_shards} does not "
                                 f"divide {n_devices} devices")
            n_data = cfg.data_shards
        elif jax.process_count() > 1 and n_devices % jax.process_count() == 0:
            n_data = jax.process_count()
        else:
            n_data = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
        if cfg.batch_size % n_data:
            raise ValueError(f"batch size {cfg.batch_size} must divide by "
                             f"the data axis ({n_data})")
        return n_data

    def _want_fused_sparse(self) -> bool:
        """--sparse routes TT-core updates through a fused Pallas kernel —
        backward+Adam (`tt_fused_adam_pallas`, the default: the adaptive
        update hard graphs require), backward+SGD (`tt_fused_sgd_pallas`,
        EXACT_SGD parity), or backward+adagrad / rowwise-adagrad
        (`tt_fused_adagrad_pallas`) — when the config supports it
        (2-4-core TT, no row cache); otherwise sparse mode falls back to
        the routed optax optimizer."""
        cfg = self.cfg
        if not (cfg.sparse and cfg.use_tt and cfg.cache_size == 0):
            return False
        if cfg.tt_optimizer not in ("adam", "sgd", "adagrad",
                                    "rowwise_adagrad"):
            return False
        from ..ops.tt_shapes import make_tt_shapes
        shapes = make_tt_shapes(self.ds.num_nodes, self.ds.feat_dim,
                                cfg.tt_ranks, cfg.p_shapes, cfg.q_shapes)
        return shapes.ndim in (2, 3, 4)

    def _put_graph_on_device(self) -> None:
        """Graph placement for puregpu sampling / full-neighbor training
        (`--mode puregpu` placement semantics, `sage_dgl_partition.py:211`).
        Each path places only what it consumes: the node-sharded trainer
        never materializes the full CSR/COO on one device (that is the
        OOM the sharding exists to avoid), and the 2^31-edge int32 guard
        applies only to single-device placements."""
        g = self.ds.graph
        cfg = self.cfg
        self._table_dev = None

        def guard_int32(path_hint: str):
            # jnp.asarray silently truncates int64 -> int32 (x64 is never
            # enabled), so single-device indptr/COO would wrap negative
            # past 2^31 edges and silently read node 0's rows.
            if g.num_edges >= 2**31:
                raise NotImplementedError(
                    f"single-device graph placement needs < 2^31 edges, got "
                    f"{g.num_edges}; use {path_hint}")

        if cfg.use_sample:  # --mode puregpu in-jit sampling: CSR in HBM
            guard_int32("--node-shard --dist (multi-chip ragged edge "
                        "blocks, block-local int32 indices — see "
                        "tests/test_parallel.py int64-global-edge cases) "
                        "or host sampling (--mode mixed)")
            # --dist: replicate the CSR into every chip's HBM so each chip
            # samples its own batch shard (per-rank sampling)
            if getattr(self, "mesh", None) is not None and cfg.dist:
                from jax.sharding import NamedSharding, PartitionSpec as P
                put = partial(jax.device_put,
                              device=NamedSharding(self.mesh, P()))
            else:
                put = jnp.asarray
            self._indptr_dev = put(g.indptr.astype(np.int32))
            self._indices_dev = put(g.indices.astype(np.int32))
            if cfg.sampler == "table":
                from ..graph.device_sampler import build_neighbor_table
                self._table_dev = put(build_neighbor_table(
                    g.indptr, g.indices, cfg.table_width, cfg.seed))
            return

        # full-neighbor training
        if cfg.node_shard and jax.device_count() > 1:
            # sharded placement only — the ragged layout stores O(E + S^2 *
            # chunk) edges with block-LOCAL (int32-safe) indices, per-shard
            # totals balanced by in-degree so papers100M skew cannot blow
            # up memory (VERDICT r2 item 2).
            # Ring width = the mesh's 'node' axis (on a hybrid data x node
            # mesh that is fewer than the device count).
            n_ring = (self._nshard_mesh.shape["node"]
                      if getattr(self, "_nshard_mesh", None) is not None
                      else (cfg.num_chips if cfg.num_chips > 0
                            else jax.device_count()))
            self._ensure_nshard_layout(n_ring)
            return

        guard_int32("--node-shard (per-shard edge blocks stay below 2^31)")
        src, dst = g.to_coo()
        self._src_dev = jnp.asarray(src.astype(np.int32))
        self._dst_dev = jnp.asarray(dst.astype(np.int32))
        self._indeg_dev = jnp.asarray(g.degrees.astype(np.float32))

    def _ensure_nshard_layout(self, n_ring: int):
        """Build (once) the ragged node-sharded edge layout + device
        arrays + padded degrees for ``n_ring`` shards.  Shared by training
        placement and sampled-mode sharded inference so the two paths can
        never diverge on chunk sizing / balance flags."""
        lay = getattr(self, "_nshard_layout", None)
        if lay is not None:
            if lay.num_shards != n_ring:
                raise ValueError(
                    f"cached node-shard layout was built for "
                    f"{lay.num_shards} shards, requested {n_ring} — "
                    f"training placement and sharded inference must agree "
                    f"on the ring width")
            return lay
        from ..parallel.node_sharding import partition_edges_ragged
        g = self.ds.graph
        src, dst = g.to_coo()
        lay = partition_edges_ragged(src.astype(np.int64),
                                     dst.astype(np.int64),
                                     g.num_nodes, n_ring)
        self._nshard_layout = lay
        self._nshard_dev = (jnp.asarray(lay.src_r),
                            jnp.asarray(lay.dst_r),
                            jnp.asarray(lay.nreal),
                            jnp.asarray(lay.chunk_offs),
                            jnp.asarray(lay.node_at))
        deg_pad = np.ones((lay.num_rows_padded,), np.float32)
        deg_pad[lay.row_of] = g.degrees
        self._nshard_deg = jnp.asarray(deg_pad)
        self._nshard_pad = lay.num_rows_padded
        return lay

    def _dummy_batch(self):
        B = self.cfg.batch_size
        seeds = jnp.zeros((B,), jnp.int32)
        layers, f = [], 1
        for fo in reversed(self.cfg.fanouts):
            f *= fo
            layers.append(jnp.zeros((B, f), jnp.int32))
        return seeds, layers

    @staticmethod
    def _wrap_full(pick: np.ndarray, order: np.ndarray, size: int) -> np.ndarray:
        """Extend a ragged tail to exactly ``size`` ids by wrapping around
        the epoch order — cyclically, so it stays full-size even when the
        whole index set is smaller than one group (tiny --synthetic-scale)."""
        if len(pick) == size:
            return pick
        return np.resize(np.concatenate([pick, order]), size)

    def _epoch_rng(self, epoch: int) -> jax.Array:
        """Per-epoch in-step PRNG key honoring cfg.rng_impl ('rbg' = the
        TPU hardware RNG — cheaper dropout/randint bits, same statistics)."""
        seed = self.cfg.seed + 1000 + epoch
        if self.cfg.rng_impl == "rbg":
            return jax.random.key(seed, impl="rbg")
        return jax.random.PRNGKey(seed)

    def _make_step_body(self, fused: bool = False):
        """The one-optimizer-step body shared by every trainer shape
        (single dispatch, multi-step fori_loop, device-sampling).  With
        ``fused`` the TT cores are updated by the fused Pallas
        backward+SGD kernel instead of autograd+optax."""
        model, tx, cfg = self.model, self.tx, self.cfg
        if not fused:
            def body(variables, opt_state, seeds, layers, labels, rng):
                params = variables["params"]
                aux_cols = {k: v for k, v in variables.items() if k != "params"}

                def loss_fn(p):
                    out, mutated = model.apply(
                        {"params": p, **aux_cols}, seeds, layers, train=True,
                        rngs={"dropout": rng},
                        mutable=["ttcache", "batch_stats", "access_counts"])
                    loss = optax.softmax_cross_entropy_with_integer_labels(
                        out, labels).mean()
                    return loss, (out, mutated)

                (loss, (logits, mutated)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, new_opt_state = tx.update(grads, opt_state, params,
                                                   value=loss)
                new_params = optax.apply_updates(params, updates)
                acc = jnp.mean(jnp.argmax(logits, -1) == labels)
                new_vars = {"params": new_params, **{**aux_cols, **mutated}}
                return new_vars, new_opt_state, loss, acc

            return body

        # fused-sparse body: lookup + conv tower forward; autograd stops at
        # the embedding output; one Pallas kernel recomputes the TT chain,
        # backprops, and applies the optimizer to the cores (functional
        # analog of the reference's in-kernel sparse optimizer,
        # ecu:1011-1247, without its double-lr bug).  Default core update
        # is fused ADAM with the plateau scale coupled into the kernel's
        # traced lr — the round-3 certs showed fixed-lr fused SGD stalls
        # at chance on hard graphs where all signal flows through the
        # cores (the reference's sparse presets only converged through the
        # accidental Adam-over-cores double update); sgd/adagrad remain
        # the EXACT_SGD / EXACT_ADAGRAD parity modes with the reference's
        # fixed in-kernel lr.
        from ..models.sage import SAGE, collect_level_ids
        from ..ops.tt_pallas import (tt_lookup_fused, tt_lookup_fused_bf16,
                                     tt_lookup_fused_bf16_sr,
                                     tt_fused_sgd_pallas,
                                     tt_fused_adagrad_pallas,
                                     tt_fused_adam_pallas)
        from ..ops.tt_shapes import make_tt_shapes
        from .optim import (plateau_scale, ADAGRAD_EPS, ROWWISE_ADAGRAD_EPS,
                            ADAM_B1, ADAM_B2, ADAM_EPS)
        shapes = make_tt_shapes(self.ds.num_nodes, self.ds.feat_dim,
                                cfg.tt_ranks, cfg.p_shapes, cfg.q_shapes)
        block, lr = 1024, cfg.lr
        use_adam = cfg.tt_optimizer == "adam"
        use_adagrad = cfg.tt_optimizer in ("adagrad", "rowwise_adagrad")
        rowwise = cfg.tt_optimizer == "rowwise_adagrad"
        adagrad_eps = ROWWISE_ADAGRAD_EPS if rowwise else ADAGRAD_EPS

        def fused_body(variables, opt_state, seeds, layers, labels, rng):
            params = variables["params"]
            aux_cols = {k: v for k, v in variables.items()
                        if k not in ("params", "tt_opt")}
            cores = tuple(params["embed"][f"tt_core_{k}"]
                          for k in range(shapes.ndim))
            all_ids, _, _ = collect_level_ids(seeds, layers)
            # --bf16: the kernel stores h_all in bf16 and the backward
            # consumes the bf16 d_h natively — halves the HBM bytes of the
            # step's dominant non-kernel traffic (the 375 MB h_all/d_h
            # tensors and their layout copies; measured round 3, log lost
            # to a container reset — re-capture: logs/r5_puregpu_trace.log)
            if (cfg.bf16 or cfg.bf16_kernel) and cfg.bf16_sr:
                # --bf16-sr: stochastic rounding on the bf16 h_all store —
                # per-step seed from the dropout rng so the dither never
                # repeats across steps (repeating dither = frozen bias)
                sr_seed = jax.random.randint(
                    jax.random.fold_in(rng, 0x5EED), (), 0, 2**31 - 1)
                h_all = jax.lax.stop_gradient(tt_lookup_fused_bf16_sr(
                    shapes, block, cores, all_ids.astype(jnp.int32),
                    sr_seed))
            else:
                lookup = (tt_lookup_fused_bf16
                          if (cfg.bf16 or cfg.bf16_kernel)
                          else tt_lookup_fused)
                h_all = jax.lax.stop_gradient(
                    lookup(shapes, block, cores, all_ids.astype(jnp.int32)))

            def loss_fn(p, h):
                out, mutated = model.apply(
                    {"params": p, **aux_cols}, h, seeds, layers, train=True,
                    rngs={"dropout": rng},
                    mutable=["ttcache", "batch_stats", "access_counts"],
                    method=SAGE.forward_from_embeddings)
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    out, labels).mean()
                return loss, (out, mutated)

            (loss, (logits, mutated)), (grads, d_h) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, h_all)
            # dense params via the routed optimizer (core grads are zero
            # here — cores are untouched by forward_from_embeddings)
            updates, new_opt_state = tx.update(grads, opt_state, params,
                                               value=loss)
            new_params = optax.apply_updates(params, updates)
            new_tt_opt = None
            if use_adam:
                ms = tuple(variables["tt_opt"][f"m_{k}"]
                           for k in range(shapes.ndim))
                vs = tuple(variables["tt_opt"][f"v_{k}"]
                           for k in range(shapes.ndim))
                t_new = variables["tt_opt"]["t"] + 1
                tf = t_new.astype(jnp.float32)
                # [lr_eff, c1, c2]: plateau-coupled lr + bias corrections,
                # computed here so the kernel stays schedule-free.  Using
                # new_opt_state's scale matches the routed path exactly
                # (reduce_on_plateau scales THIS step's updates by the
                # scale derived from this step's loss).
                scal = jnp.stack([
                    lr * plateau_scale(new_opt_state),
                    1.0 / (1.0 - jnp.power(ADAM_B1, tf)),
                    1.0 / (1.0 - jnp.power(ADAM_B2, tf))])
                new_cores, new_ms, new_vs = tt_fused_adam_pallas(
                    shapes, cores, ms, vs, all_ids.astype(jnp.int32),
                    d_h, scal, ADAM_B1, ADAM_B2, ADAM_EPS, block)
                new_tt_opt = {
                    **{f"m_{k}": new_ms[k] for k in range(shapes.ndim)},
                    **{f"v_{k}": new_vs[k] for k in range(shapes.ndim)},
                    "t": t_new}
            elif use_adagrad:
                accs = tuple(variables["tt_opt"][f"acc_{k}"]
                             for k in range(shapes.ndim))
                new_cores, new_accs = tt_fused_adagrad_pallas(
                    shapes, cores, accs, all_ids.astype(jnp.int32),
                    d_h, lr, adagrad_eps, block, rowwise=rowwise)
                new_tt_opt = {f"acc_{k}": new_accs[k]
                              for k in range(shapes.ndim)}
            else:
                new_cores = tt_fused_sgd_pallas(shapes, cores,
                                                all_ids.astype(jnp.int32),
                                                d_h, lr, block)
            embed = dict(new_params["embed"])
            for k in range(shapes.ndim):
                embed[f"tt_core_{k}"] = new_cores[k]
            new_params = {**new_params, "embed": embed}
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            new_vars = {"params": new_params, **{**aux_cols, **mutated}}
            if new_tt_opt is not None:
                new_vars["tt_opt"] = new_tt_opt
            return new_vars, new_opt_state, loss, acc

        return fused_body

    def _build_step(self):
        return partial(jax.jit, donate_argnums=(0, 1))(self._make_step_body())

    def _build_fused_sparse_step(self):
        """`--sparse` per-dispatch step with the fused Pallas TT-SGD."""
        return partial(jax.jit, donate_argnums=(0, 1))(
            self._make_step_body(fused=True))

    def _build_full_neighbor_step(self):
        """`--full-neighbor` step: differentiable full-graph propagation,
        loss on the minibatch seeds (exact L-hop aggregation — the TPU
        formulation of the reference's full-neighbor sampler,
        `graphloader.py:245-251`)."""
        model, tx, cfg = self.model, self.tx, self.cfg
        from ..models.sage import SAGE

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(variables, opt_state, src, dst, in_deg, seeds, labels, rng):
            params = variables["params"]
            aux_cols = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                logits_all, mutated = model.apply(
                    {"params": p, **aux_cols}, src, dst, in_deg, True,
                    chunk=cfg.edge_chunk,
                    rngs={"dropout": rng},
                    mutable=["ttcache", "batch_stats", "access_counts"],
                    method=SAGE.forward_full_graph)
                logits = jnp.take(logits_all, seeds, axis=0)
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
                return loss, (logits, mutated)

            (loss, (logits, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params,
                                               value=loss)
            new_params = optax.apply_updates(params, updates)
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            new_vars = {"params": new_params, **{**aux_cols, **mutated}}
            return new_vars, new_opt_state, loss, acc

        return step

    def _layer_widths(self):
        widths, f = [], 1
        for fo in reversed(self.cfg.fanouts):
            f *= fo
            widths.append(f)
        return widths

    def _build_multi_step(self, fused: bool = False):
        """S optimizer steps per dispatch.  Batches arrive as ONE packed
        int32 array (S, B, 2 + sum(F_l)): [seed, label, layer ids...] —
        a single host->device transfer per dispatch (the per-buffer
        round-trip cost on remote-attached TPUs dominates otherwise)."""
        S = self.cfg.steps_per_call
        widths = self._layer_widths()
        step_body = self._make_step_body(fused=fused)

        # No donation: param/opt trees are a few MB (double-buffering is
        # free), and on the remote-attached dev TPU a controlled
        # back-to-back measurement completed 48-step dispatches in ~4 s
        # without donation while the donating variant showed host-memory
        # copy stalls in traces.  (Wall-clock through that relay is noisy
        # — 64-225 s/epoch across identical runs — so this is the simpler
        # configuration, not a strong perf claim; see docs/PERFORMANCE.md.)
        @jax.jit
        def multi_step(variables, opt_state, packed, rng):
            def body(i, carry):
                variables, opt_state, loss_sum, acc_sum = carry
                row = packed[i]                      # (B, 2 + sum(F))
                seeds = row[:, 0]
                labels = row[:, 1]
                layers, off = [], 2
                for w in widths:
                    layers.append(row[:, off:off + w])
                    off += w
                new_vars, new_opt, loss, acc = step_body(
                    variables, opt_state, seeds, layers, labels,
                    jax.random.fold_in(rng, i))
                return (new_vars, new_opt, loss_sum + loss, acc_sum + acc)

            variables, opt_state, loss_sum, acc_sum = jax.lax.fori_loop(
                0, S, body, (variables, opt_state, jnp.float32(0),
                             jnp.float32(0)))
            return variables, opt_state, loss_sum / S, acc_sum / S

        return multi_step

    def _build_device_multi_step(self, dp_mesh=None):
        """`--mode puregpu`: the CSR graph lives in HBM and each in-loop
        step SAMPLES ON DEVICE (graph/device_sampler.py) — the packed
        host->device transfer shrinks to (S, B, 2) [seed, label].

        With ``dp_mesh`` (--dist --mode puregpu) the packed seeds shard
        over the 'data' axis while the CSR stays replicated: every chip
        samples its own batch shard in-jit and the global loss mean makes
        XLA psum the grads — numerically identical to the single-device
        program (jit shardings don't change semantics)."""
        S = self.cfg.steps_per_call
        fanouts = self.cfg.fanouts
        use_table = self.cfg.sampler == "table"
        step_body = self._make_step_body(fused=self._fused_sparse)
        from ..graph.device_sampler import (device_sample_block,
                                            device_sample_block_table)

        def multi_step(variables, opt_state, packed, rng, indptr, indices):
            def body(i, carry):
                variables, opt_state, loss_sum, acc_sum = carry
                seeds = packed[i, :, 0]
                labels = packed[i, :, 1]
                k_sample = jax.random.fold_in(rng, 2 * i)
                k_drop = jax.random.fold_in(rng, 2 * i + 1)
                if use_table:
                    # `indices` is the (N, W) neighbor table here
                    layers = device_sample_block_table(indices, seeds,
                                                       fanouts, k_sample)
                else:
                    layers = device_sample_block(indptr, indices, seeds,
                                                 fanouts, k_sample)
                new_vars, new_opt, loss, acc = step_body(
                    variables, opt_state, seeds, layers, labels, k_drop)
                return (new_vars, new_opt, loss_sum + loss, acc_sum + acc)

            variables, opt_state, loss_sum, acc_sum = jax.lax.fori_loop(
                0, S, body, (variables, opt_state, jnp.float32(0),
                             jnp.float32(0)))
            return variables, opt_state, loss_sum / S, acc_sum / S

        if dp_mesh is None:
            return jax.jit(multi_step)
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(dp_mesh, P())
        packed_sh = NamedSharding(dp_mesh, P(None, "data", None))
        return jax.jit(multi_step,
                       in_shardings=(repl, repl, packed_sh, repl, repl, repl),
                       out_shardings=(repl, repl, repl, repl))

    def _pack_group(self, group) -> np.ndarray:
        """(S, B, 2 + sum(F)) int32: [seed, label, layer ids...]."""
        S, B = len(group), self.cfg.batch_size
        widths = self._layer_widths()
        packed = np.empty((S, B, 2 + sum(widths)), np.int32)
        for s, b in enumerate(group):
            packed[s, :, 0] = b.seeds
            packed[s, :, 1] = b.labels
            off = 2
            for li, w in enumerate(widths):
                packed[s, :, off:off + w] = b.layers[li]
                off += w
        return packed

    def _grouped_batches(self):
        """Yield lists of S batches (cycling into the epoch start to fill
        the final ragged group, mirroring the loader's tail-wrap)."""
        S = self.cfg.steps_per_call
        group: List = []
        first: List = []
        for batch in self.loader:
            group.append(batch)
            if len(first) < S:
                first.append(batch)
            if len(group) == S:
                yield group
                group = []
        if group:
            i = 0
            while len(group) < S:
                group.append(first[i % len(first)])
                i += 1
            yield group

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        if not cfg.use_sample:
            return self._train_epoch_full_neighbor(epoch)
        if self._device_multi_fn is not None:
            return self._train_epoch_device(epoch)
        if self._multi_fn is not None:
            return self._train_epoch_multi(epoch)
        rng = self._epoch_rng(epoch)
        meter = _EpochMeter(self, epoch)
        for it, batch in enumerate(self.loader):
            rng, sub = jax.random.split(rng)
            if self.mesh is not None:
                from ..parallel import shard_batch, replicate
                seeds, labels = shard_batch(self.mesh, batch.seeds,
                                            batch.labels)
                layers = [shard_batch(self.mesh, l) for l in batch.layers]
                sub = replicate(self.mesh, sub)
            else:
                seeds = jnp.asarray(batch.seeds)
                layers = [jnp.asarray(l) for l in batch.layers]
                labels = jnp.asarray(batch.labels)
            self.variables, self.opt_state, loss, acc = self._step_fn(
                self.variables, self.opt_state, seeds, layers, labels, sub)
            self.step += 1
            meter.record(loss, acc, cfg.batch_size,
                         log_now=(it + 1) % cfg.log_every == 0)
        return meter.summary()

    def _train_epoch_multi(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        S = cfg.steps_per_call
        rng = self._epoch_rng(epoch)
        meter = _EpochMeter(self, epoch)
        # background prefetch: sample + pack + device_put group g+1 while
        # the device executes group g
        import concurrent.futures as _cf

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            packed_sh = NamedSharding(self.mesh, P(None, "data", None))

            def prepare(group):
                return jax.device_put(self._pack_group(group), packed_sh)
        else:
            def prepare(group):
                return jax.device_put(self._pack_group(group))

        pool = _cf.ThreadPoolExecutor(1)
        groups = self._grouped_batches()
        pending = None
        for group in groups:
            fut = pool.submit(prepare, group)
            if pending is None:
                pending = fut
                continue
            packed = pending.result()
            pending = fut
            rng, sub = jax.random.split(rng)
            self.variables, self.opt_state, loss, acc = self._multi_fn(
                self.variables, self.opt_state, packed, sub)
            gi = self.step // S
            self.step += S
            meter.record(loss, acc, S * cfg.batch_size,
                         log_now=(gi + 1) * S % cfg.log_every < S)
        if pending is not None:  # flush the last prefetched group
            packed = pending.result()
            rng, sub = jax.random.split(rng)
            self.variables, self.opt_state, loss, acc = self._multi_fn(
                self.variables, self.opt_state, packed, sub)
            self.step += S
            meter.record(loss, acc, S * cfg.batch_size, log_now=False)
        pool.shutdown(wait=False)
        return meter.summary()

    def _train_epoch_device(self, epoch: int) -> Dict[str, float]:
        """`--mode puregpu`: iterate shuffled seed groups; sampling happens
        inside the jitted multi-step on the device-resident CSR."""
        cfg = self.cfg
        S, B = cfg.steps_per_call, cfg.batch_size
        rng = self._epoch_rng(epoch)
        host_rng = np.random.default_rng(cfg.seed + 31 * epoch)
        order = host_rng.permutation(self.ds.train_idx)
        per_group = S * B
        # ceil: the ragged tail wraps (host _grouped_batches cycles the
        # same way) — flooring silently dropped up to S*B-1 seeds/epoch
        n_groups = max(1, -(-len(order) // per_group))
        meter = _EpochMeter(self, epoch)
        for g in range(n_groups):
            pick = self._wrap_full(order[g * per_group:(g + 1) * per_group],
                                   order, per_group)
            packed = np.empty((S, B, 2), np.int32)
            packed[:, :, 0] = pick.reshape(S, B)
            packed[:, :, 1] = self.ds.labels[pick].reshape(S, B)
            rng, sub = jax.random.split(rng)
            idx_arg = (self._table_dev if self._table_dev is not None
                       else self._indices_dev)
            # np array straight into the jitted fn: with DP in_shardings the
            # packed seeds land sharded over 'data' without a host detour
            self.variables, self.opt_state, loss, acc = self._device_multi_fn(
                self.variables, self.opt_state, packed, sub,
                self._indptr_dev, idx_arg)
            self.step += S
            meter.record(loss, acc, per_group,
                         log_now=(g + 1) % max(1, cfg.log_every // S) == 0)
        return meter.summary()

    def _train_epoch_full_neighbor(self, epoch: int) -> Dict[str, float]:
        """`--full-neighbor`: per-minibatch steps with EXACT neighborhood
        aggregation (full-graph propagation, loss on the batch's seeds) —
        the README NoTT-FullNeighbor training regime."""
        cfg = self.cfg
        B = cfg.batch_size
        rng = self._epoch_rng(epoch)
        host_rng = np.random.default_rng(cfg.seed + 31 * epoch)
        order = host_rng.permutation(self.ds.train_idx)
        n_batches = max(1, len(order) // B)
        meter = _EpochMeter(self, epoch, tag=" (full-nbr)")
        for b in range(n_batches):
            pick = self._wrap_full(order[b * B:(b + 1) * B], order, B)
            seeds = jnp.asarray(pick.astype(np.int32))
            labels = jnp.asarray(self.ds.labels[pick].astype(np.int32))
            rng, sub = jax.random.split(rng)
            if getattr(self, "_nshard_train", False):
                seed_rows = jnp.asarray(
                    self._nshard_layout.row_of[pick].astype(np.int32))
                self.variables, self.opt_state, loss, acc = self._full_step_fn(
                    self.variables, self.opt_state, *self._nshard_dev,
                    self._nshard_deg, seed_rows, labels, sub)
            else:
                self.variables, self.opt_state, loss, acc = self._full_step_fn(
                    self.variables, self.opt_state, self._src_dev,
                    self._dst_dev, self._indeg_dev, seeds, labels, sub)
            self.step += 1
            meter.record(loss, acc, B,
                         log_now=(b + 1) % cfg.log_every == 0)
        return meter.summary()

    def maybe_populate_cache(self):
        """After warmup epoch(s): build the hot-row cache
        (`sage_dgl_partition.py:350-361`)."""
        if self.cfg.use_tt and self.cfg.cache_size > 0:
            freq = getattr(self.loader, "freq", None)
            # with in-jit sampling the host loader never ran: its all-zero
            # freq would clobber the device-side counters (update_freq)
            # and populate an empty cache
            if self.cfg.mode == "puregpu" or (
                    freq is not None and not freq.any()):
                freq = None
            self.variables = cache_populate_apply(self.model, self.variables,
                                                  freq=freq)
            # slot->id assignments changed; stale per-slot accumulators
            # would scale the wrong rows' updates
            from .optim import reset_cache_opt_state
            self.opt_state = reset_cache_opt_state(
                self.tx, self.opt_state, self.variables["params"])

    # ------------------------------------------------------------------
    def infer_full(self) -> np.ndarray:
        """Layer-wise full-neighbor inference over all nodes
        (`gnn_model.py:220-253`): materialize features chunk-wise via TT,
        then propagate each conv layer over the full COO edge list."""
        if self.cfg.node_shard and jax.device_count() > 1:
            return self.infer_full_sharded()
        ds, cfg = self.ds, self.cfg
        n = ds.num_nodes

        mat = jax.jit(lambda v, ids: self.model.apply(
            v, ids, method=SAGE.materialize_features))
        chunks = [
            np.asarray(mat(self.variables, jnp.asarray(ids)))
            for ids in full_neighbor_chunks(n, cfg.inference_chunk)
        ]
        h = jnp.asarray(np.concatenate(chunks, axis=0)[:n])

        if cfg.spmm == "blocked":
            # share the evaluate() tiling (built lazily there)
            from ..ops.spmm_blocked import (build_window_tiles,
                                            check_blocked_supported,
                                            chunk_tiles_host,
                                            default_blocked_tiling,
                                            spmm_sum_blocked_dev)
            check_blocked_supported()
            if not hasattr(self, "_eval_blocked_tile"):
                src, dst = ds.graph.to_coo()
                tile_e, ct = default_blocked_tiling()
                ts = build_window_tiles(src.astype(np.int64),
                                        dst.astype(np.int64), n,
                                        tile=tile_e, dst_buckets=16,
                                        chunk_tiles=ct)
                self._eval_blocked_tile = ts.tile
                self._infer_blocked_args = tuple(
                    jnp.asarray(a) for a in chunk_tiles_host(ts, ct))
            targs = getattr(self, "_infer_blocked_args",
                            self._eval_args[:4] if hasattr(self, "_eval_args")
                            else None)
            T = self._eval_blocked_tile
            interp = jax.default_backend() != "tpu"
            deg = jnp.asarray(ds.graph.degrees.astype(np.float32))

            fwd_b = jax.jit(
                lambda v, h, w2, i2, d2, ww2, deg, li: self.model.apply(
                    v, h,
                    spmm_sum_blocked_dev(h, w2, i2, d2, ww2, T, n,
                                         interpret=interp)
                    / jnp.maximum(deg, 1.0)[:, None],
                    li, method=SAGE.apply_conv),
                static_argnums=(7,))
            for li in range(cfg.num_layers):
                h = fwd_b(self.variables, h, *targs, deg, li)
            return np.asarray(h)

        src, dst = ds.graph.to_coo()
        src_d, dst_d = jnp.asarray(src), jnp.asarray(dst)
        in_deg = jnp.asarray(ds.graph.degrees.astype(np.float32))
        # edge arrays must be ARGUMENTS, not closure captures — jit bakes
        # captured arrays into the program as constants (60M-edge graphs
        # blow up the compile payload)
        fwd = jax.jit(
            lambda v, h, s, d, deg, li: self.model.apply(
                v, h, s, d, deg, n, li,
                chunk=cfg.edge_chunk, method=SAGE.forward_full),
            static_argnums=(5,))
        for li in range(cfg.num_layers):
            h = fwd(self.variables, h, src_d, dst_d, in_deg, li)
        return np.asarray(h)

    def infer_full_sharded(self) -> np.ndarray:
        """Node-sharded layer-wise inference (papers100M scale-out,
        SURVEY §2.4): activations row-sharded over a 'node' mesh axis,
        aggregation via ring SpMM (``ppermute`` rotations over ICI), conv
        transforms row-parallel.  Numerically matches :meth:`infer_full`
        (tests/test_parallel.py)."""
        from ..models.sage import SAGE
        from ..parallel import make_mesh
        from ..parallel.node_sharding import sharded_layerwise_inference_ragged
        ds, cfg = self.ds, self.cfg
        n_dev = cfg.num_chips if cfg.num_chips > 0 else jax.device_count()
        mesh = getattr(self, "_nshard_mesh", None)
        if mesh is None:
            mesh = make_mesh(n_data=1, n_node=n_dev,
                             devices=jax.devices()[:n_dev])
        lay = self._ensure_nshard_layout(mesh.shape["node"])
        mat = jax.jit(lambda v, ids: self.model.apply(
            v, ids, method=SAGE.materialize_features))
        chunks = [
            np.asarray(mat(self.variables, jnp.asarray(ids)))
            for ids in full_neighbor_chunks(ds.num_nodes, cfg.inference_chunk)
        ]
        h_nodes = np.concatenate(chunks, axis=0)[:ds.num_nodes]
        # storage-row order (balanced assignment), pad rows zero
        h = np.zeros((lay.num_rows_padded, h_nodes.shape[1]), h_nodes.dtype)
        h[lay.row_of] = h_nodes
        deg = np.ones((lay.num_rows_padded,), np.float32)
        deg[lay.row_of] = ds.graph.degrees

        def model_apply(variables, h_dst, agg, li):
            return self.model.apply(variables, h_dst, agg, li,
                                    method=SAGE.apply_conv)

        src_r, dst_r, nreal, chunk_offs, _ = self._nshard_dev
        out = sharded_layerwise_inference_ragged(
            mesh, model_apply, self.variables, jnp.asarray(h),
            src_r, dst_r, nreal, chunk_offs, lay.max_chunks, lay.chunk,
            jnp.asarray(deg), cfg.num_layers)
        return np.asarray(out)[lay.row_of]

    def evaluate_sampled(self, seed: int = 1234) -> Dict[str, float]:
        """Split accuracies via the SAMPLED fanout forward (--eval-sampled):
        each evaluated seed runs through the same static-shape fanout
        forward training uses (dropout off).  An approximation of
        full-neighbor inference (the fanout bounds each hop), but the only
        eval that fits one chip at papers scale, where layer-wise inference
        must materialize (N, D) f32 activations (28 GB at 55.5M nodes).
        Splits larger than ``eval_sample_max`` are subsampled."""
        cfg = self.cfg
        from ..graph.sampler import sample_block
        rng = np.random.default_rng(seed)
        if not hasattr(self, "_sampled_eval_fn"):
            @jax.jit
            def fwd(variables, seeds, layers):
                out = self.model.apply(variables, seeds, list(layers),
                                       train=False)
                return jnp.argmax(out, -1)
            self._sampled_eval_fn = fwd
        B = cfg.batch_size
        res = {}
        for name, idx in [("train", self.ds.train_idx),
                          ("val", self.ds.val_idx),
                          ("test", self.ds.test_idx)]:
            if len(idx) > cfg.eval_sample_max:
                idx = rng.choice(idx, cfg.eval_sample_max, replace=False)
            correct = total = 0
            n_batches = max(1, len(idx) // B)
            for b in range(n_batches):
                pick = self._wrap_full(idx[b * B:(b + 1) * B], idx, B)
                blk = sample_block(self.ds.graph, pick, cfg.fanouts, rng)
                pred = self._sampled_eval_fn(
                    self.variables, jnp.asarray(blk.seeds),
                    tuple(jnp.asarray(l) for l in blk.layers))
                correct += int((np.asarray(pred) ==
                                self.ds.labels[pick]).sum())
                total += B
            res[f"{name}_acc"] = correct / max(total, 1)
        return res

    def evaluate(self) -> Dict[str, float]:
        """Split accuracies via fully-on-device inference: one jitted
        full-graph propagation (materialize + L aggregation layers) and
        three scalar accuracies come back to the host — round 1 pulled
        the whole (N, C) logits + pushed (N, D) activations through the
        host per eval (~1 GB at products scale; tens of seconds through
        a remote-attached TPU).  --eval-sampled swaps in the sampled
        fanout eval (papers-scale single-chip regime)."""
        if self.cfg.eval_sampled:
            return self.evaluate_sampled()
        if self.cfg.node_shard and jax.device_count() > 1:
            logits = self.infer_full_sharded()
            pred = logits.argmax(-1)
            return {
                f"{s}_acc": float((pred[i] == self.ds.labels[i]).mean())
                for s, i in [("train", self.ds.train_idx),
                             ("val", self.ds.val_idx),
                             ("test", self.ds.test_idx)]
            }
        ds, cfg = self.ds, self.cfg
        n = ds.num_nodes
        from ..models.sage import SAGE
        # Default: chunked XLA gather+segment-sum (the measured winner on
        # v5e; the gather is the wall for every formulation — see
        # docs/PERFORMANCE.md).  cfg.spmm == "pallas" opts into the tiled
        # segment-matmul kernel (ops/spmm_pallas.py); "blocked" into the
        # window-blocked VMEM-gather kernel (ops/spmm_blocked.py).
        use_tiled = cfg.spmm == "pallas" and jax.default_backend() == "tpu"
        # blocked: interpret-mode off-TPU only (wiring-parity tests); on
        # real TPUs it raises — measured dead end (docs/PERFORMANCE.md)
        use_blocked = cfg.spmm == "blocked"
        if use_blocked:
            from ..ops.spmm_blocked import check_blocked_supported
            check_blocked_supported()
        if not hasattr(self, "_eval_args"):
            src, dst = ds.graph.to_coo()
            common = (
                jnp.asarray(ds.graph.degrees.astype(np.float32)),
                jnp.asarray(ds.labels.astype(np.int32)),
                jnp.asarray(ds.train_idx), jnp.asarray(ds.val_idx),
                jnp.asarray(ds.test_idx),
            )
            if use_blocked:
                from ..ops.spmm_blocked import (build_window_tiles,
                                                chunk_tiles_host,
                                                default_blocked_tiling)
                tile_e, ct = default_blocked_tiling()
                ts = build_window_tiles(src.astype(np.int64),
                                        dst.astype(np.int64), n,
                                        tile=tile_e, dst_buckets=16,
                                        chunk_tiles=ct)
                self._eval_blocked_tile = ts.tile
                chunks = chunk_tiles_host(ts, ct)
                self._eval_args = tuple(
                    jnp.asarray(a) for a in chunks) + common
            elif use_tiled:
                from ..ops.spmm_pallas import (auto_tile_edges,
                                               build_spmm_tiles_uniform)
                e_t = auto_tile_edges(len(src), n)
                # bound the per-chunk gathered msgs to ~1 GB bf16 at the
                # widest feature dim the propagation actually uses
                D = max(ds.feat_dim, cfg.hidden_dim)
                tpc = max(256, (1 << 30) // (e_t * D * 2))
                tu = build_spmm_tiles_uniform(src.astype(np.int32), dst, n,
                                              tile_edges=e_t,
                                              tiles_per_chunk=tpc)
                self._eval_tiles_meta = (tu.num_blocks_padded,
                                         tu.blocks_per_chunk,
                                         tu.block_rows, tu.tile_edges)
                self._eval_args = (
                    jnp.asarray(tu.src), jnp.asarray(tu.dstl),
                    jnp.asarray(tu.w), jnp.asarray(tu.blkl),
                    jnp.asarray(tu.first), jnp.asarray(tu.blk0)) + common
            else:
                self._eval_args = (
                    jnp.asarray(src.astype(np.int32)),
                    jnp.asarray(dst.astype(np.int32))) + common

        if not hasattr(self, "_eval_fn"):
            if use_blocked:
                from ..ops.spmm_blocked import spmm_sum_blocked_dev
                T = self._eval_blocked_tile
                interp = jax.default_backend() != "tpu"

                @jax.jit
                def eval_fn(variables, win2, idx2, dst2, w2, deg, labels,
                            tr_i, va_i, te_i):
                    ids = jnp.arange(n, dtype=jnp.int32)
                    h = self.model.apply(variables, ids,
                                         method=SAGE.materialize_features)
                    degc = jnp.maximum(deg, 1.0)[:, None]
                    for li in range(cfg.num_layers):
                        agg = spmm_sum_blocked_dev(
                            h, win2, idx2, dst2, w2, T, n,
                            interpret=interp) / degc
                        h = self.model.apply(variables, h, agg, li,
                                             method=SAGE.apply_conv)
                    pred = jnp.argmax(h, -1)

                    def acc(idx):
                        return jnp.mean((jnp.take(pred, idx) ==
                                         jnp.take(labels, idx))
                                        .astype(jnp.float32))
                    return acc(tr_i), acc(va_i), acc(te_i)
            elif use_tiled:
                from ..ops.spmm_pallas import spmm_sum_tiled_uniform
                nbp, nbc, NR, E_t = self._eval_tiles_meta

                @jax.jit
                def eval_fn(variables, tsrc, tdstl, tw, tblkl, tfirst,
                            tblk0, deg, labels, tr_i, va_i, te_i):
                    ids = jnp.arange(n, dtype=jnp.int32)
                    h = self.model.apply(variables, ids,
                                         method=SAGE.materialize_features)
                    degc = jnp.maximum(deg, 1.0)[:, None]
                    for li in range(cfg.num_layers):
                        agg = spmm_sum_tiled_uniform(
                            h, tsrc, tdstl, tw, tblkl, tfirst, tblk0,
                            nbp, nbc, NR, E_t, n) / degc
                        h = self.model.apply(variables, h, agg, li,
                                             method=SAGE.apply_conv)
                    pred = jnp.argmax(h, -1)

                    def acc(idx):
                        return jnp.mean((jnp.take(pred, idx) ==
                                         jnp.take(labels, idx))
                                        .astype(jnp.float32))
                    return acc(tr_i), acc(va_i), acc(te_i)
            else:
                @jax.jit
                def eval_fn(variables, src, dst, deg, labels, tr_i, va_i,
                            te_i):
                    logits = self.model.apply(
                        variables, src, dst, deg, False,
                        chunk=cfg.edge_chunk,
                        method=SAGE.forward_full_graph)
                    pred = jnp.argmax(logits, -1)

                    def acc(idx):
                        return jnp.mean((jnp.take(pred, idx) ==
                                         jnp.take(labels, idx))
                                        .astype(jnp.float32))
                    return acc(tr_i), acc(va_i), acc(te_i)
            self._eval_fn = eval_fn
        tr_a, va_a, te_a = self._eval_fn(self.variables, *self._eval_args)
        return {"train_acc": float(tr_a), "val_acc": float(va_a),
                "test_acc": float(te_a)}

    # ------------------------------------------------------------------
    def fit(self, epochs: Optional[int] = None) -> Dict[str, Any]:
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        best = {"val_acc": 0.0, "test_acc": 0.0}
        history = []
        for epoch in range(epochs):
            stats = self.train_epoch(epoch)
            if epoch == 0:
                self.maybe_populate_cache()
            if not cfg.skip_eval and (
                    (epoch + 1) % cfg.eval_every == 0 or epoch == epochs - 1):
                stats.update(self.evaluate())
                if stats.get("val_acc", 0) >= best["val_acc"]:
                    best = {"val_acc": stats["val_acc"],
                            "test_acc": stats["test_acc"], "epoch": epoch}
            history.append(stats)
            if self.logger:
                self.logger.info(f"epoch {epoch}: {stats}")
        return {"history": history, "best": best, "metrics": self._metrics}


    def access_count_stats(self):
        """Per-row access counters + skew summary when access counting is
        on (`LoggingEmbedding` analytics, `sage_dgl_partition.py:350-357`).
        With the default host-tracked frequencies, uses the loader's LFU
        counters instead."""
        from ..utils import metrics as M
        counts = None
        ac = self.variables.get("access_counts")
        if ac is not None:
            counts = np.asarray(jax.tree.leaves(ac)[0])
        elif getattr(self.loader, "freq", None) is not None:
            counts = np.asarray(self.loader.freq)
        if counts is None:
            return None
        return {"counts": counts,
                "percentages": M.access_percentages(counts)}

    # ------------------------------------------------------------------
    # checkpoint / resume (the reference only saved state dicts,
    # `sage_dgl_partition.py:385-394`; restore is new capability)
    # ------------------------------------------------------------------
    def save(self, ckpt_dir: str) -> str:
        from .checkpoint import save_checkpoint
        return save_checkpoint(ckpt_dir, self.step, self.variables,
                               self.opt_state, extra={"step": self.step})

    def restore(self, path: Optional[str] = None,
                ckpt_dir: Optional[str] = None) -> None:
        """Restore params + mutable collections + optimizer state + step."""
        from .checkpoint import restore_checkpoint, latest_checkpoint
        if path is None:
            path = latest_checkpoint(ckpt_dir or "./checkpoints")
            if path is None:
                raise FileNotFoundError("no checkpoint found")
        state = restore_checkpoint(path, {"variables": self.variables,
                                          "opt_state": self.opt_state,
                                          "extra": {"step": self.step}})
        self.variables = jax.tree.map(jnp.asarray, state["variables"])
        self.opt_state = jax.tree.map(
            lambda a, b: jnp.asarray(b) if hasattr(b, "shape") else b,
            self.opt_state, state["opt_state"])
        self.step = int(state["extra"].get("step", 0))
