"""Full-graph GCN/GAT training driver.

Re-design of `gcn_gat_partition.py` (the arxiv recipe): the embedding
layer materializes the full feature table from node ids every epoch
(`:85-121` — for TT that's the whole-table reconstruction, the hot path),
optional label-as-feature trick with 50% train-mask split (`:71-76`,
``add_labels``), log-eps-smoothed cross entropy (`:53-58`), linear lr
warmup over the first 50 epochs (`:79-82` ``adjust_learning_rate``),
AdamW over model + embedding params (`:273-274`).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..graph.csr import NodeDataset
from ..models.gcn import GCN
from ..models.gat import GAT
from ..models.sage import make_embed_layer
import flax.linen as nn


def log_eps_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """loss = mean(log(eps + CE) - log(eps)), eps = 1 - log 2 — the
    reference's smoothed CE (`gcn_gat_partition.py:53-58`)."""
    eps = 1 - math.log(2)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.mean(jnp.log(eps + ce) - math.log(eps))


class FullGraphModel(nn.Module):
    """Embedding layer + full-graph GNN, one module so a single param tree
    covers both (the reference keeps them separate and concatenates param
    groups, `gcn_gat_partition.py:273-274`)."""

    model_type: str  # gcn | gat
    num_nodes: int
    in_dim: int
    hidden_dim: int
    num_classes: int
    num_layers: int = 3
    num_heads: int = 3
    dropout: float = 0.5
    use_linear: bool = False
    use_labels: bool = False
    use_tt: bool = True
    tt_ranks: Tuple[int, ...] = (16, 16)
    p_shapes: Optional[Tuple[int, ...]] = None
    q_shapes: Optional[Tuple[int, ...]] = None
    weight_dist: str = "approx-normal"
    cache_size: int = 0
    precomputed_cores: Optional[tuple] = None

    blocked_tile: int = 0  # >0 (gcn only): convs take blocked-SpMM args

    def setup(self):
        self.embed_layer = make_embed_layer(
            self.num_nodes, self.in_dim, self.use_tt, self.tt_ranks,
            self.p_shapes, self.q_shapes, self.weight_dist, self.cache_size,
            False, self.precomputed_cores)
        in_dim = self.in_dim + (self.num_classes if self.use_labels else 0)
        if self.model_type == "gcn":
            self.gnn = GCN(in_dim, self.hidden_dim, self.num_classes,
                           self.num_layers, self.dropout, self.use_linear,
                           blocked_tile=self.blocked_tile)
        else:
            self.gnn = GAT(in_dim, self.hidden_dim, self.num_classes,
                           self.num_layers, self.num_heads, self.dropout,
                           use_linear=self.use_linear)

    def __call__(self, src, dst, in_deg, label_onehot=None, train=False,
                 spmm_args=None):
        """Materialize ALL rows via the embedding, optionally concat the
        masked label onehots, run the GNN over the full COO graph."""
        ids = jnp.arange(self.num_nodes, dtype=jnp.int32)
        feat = self.embed_layer(ids, None, train)
        if self.use_labels:
            feat = jnp.concatenate([feat, label_onehot], axis=-1)
        if self.model_type == "gcn":
            return self.gnn(feat, src, dst, in_deg, train=train,
                            spmm_args=spmm_args)
        return self.gnn(feat, src, dst, in_deg, train=train)

    def materialize_features(self, ids: jax.Array) -> jax.Array:
        """Embedding rows for arbitrary ids — same contract as
        ``SAGE.materialize_features`` (used by --store-emb,
        `gcn_gat_partition.py:341-344`)."""
        return self.embed_layer(ids, None, False)


@dataclass
class FullGraphConfig:
    model: str = "gcn"
    epochs: int = 200
    lr: float = 0.005
    weight_decay: float = 0.0
    dropout: float = 0.5
    hidden_dim: int = 256
    num_layers: int = 3
    num_heads: int = 3
    use_linear: bool = False
    use_labels: bool = False
    use_tt: bool = True
    tt_ranks: Tuple[int, ...] = (16, 16)
    p_shapes: Optional[Tuple[int, ...]] = None
    q_shapes: Optional[Tuple[int, ...]] = None
    weight_dist: str = "approx-normal"
    warmup_epochs: int = 50
    mask_rate: float = 0.5
    eval_every: int = 10
    # full-graph aggregation backend (gcn only): "xla" gather+segment-sum
    # or "blocked" (ops/spmm_blocked.py window-gather kernel)
    spmm: str = "xla"
    seed: int = 0


class FullGraphTrainer:
    def __init__(self, dataset: NodeDataset, config: FullGraphConfig,
                 logger=None, precomputed_cores=None):
        self.ds = dataset
        self.cfg = config
        self.logger = logger
        cfg = config
        if cfg.spmm not in ("xla", "blocked"):
            raise ValueError(f"full-graph trainer supports spmm 'xla' or "
                             f"'blocked', got {cfg.spmm!r} ('pallas' is the "
                             f"SAGE eval tiled kernel)")
        use_blocked = cfg.spmm == "blocked"
        if use_blocked and cfg.model != "gcn":
            raise ValueError("--spmm blocked serves GCN; GAT attention is "
                             "per-step-weighted (static tilings cannot "
                             "carry the softmax weights)")
        if use_blocked:
            from ..ops.spmm_blocked import check_blocked_supported
            check_blocked_supported()  # measured dead end on real TPUs
        from ..ops.spmm_blocked import default_blocked_tiling
        tile_d, ct = default_blocked_tiling()
        self._blocked_tile = tile_d if use_blocked else 0
        self.model = FullGraphModel(
            model_type=cfg.model, num_nodes=dataset.num_nodes,
            in_dim=dataset.feat_dim, hidden_dim=cfg.hidden_dim,
            num_classes=dataset.num_classes, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads, dropout=cfg.dropout,
            use_linear=cfg.use_linear, use_labels=cfg.use_labels,
            use_tt=cfg.use_tt, tt_ranks=cfg.tt_ranks,
            p_shapes=cfg.p_shapes, q_shapes=cfg.q_shapes,
            weight_dist=cfg.weight_dist, precomputed_cores=precomputed_cores,
            blocked_tile=self._blocked_tile)

        src, dst = dataset.graph.to_coo()
        self._spmm_args = None
        if use_blocked:
            from ..ops.spmm_blocked import build_blocked_spmm
            op = build_blocked_spmm(src.astype(np.int64),
                                    dst.astype(np.int64),
                                    dataset.num_nodes,
                                    tile=self._blocked_tile,
                                    dst_buckets=16, chunk_tiles=ct)
            self._spmm_args = (op.fwd, op.bwd)
        self.src = jnp.asarray(src)
        self.dst = jnp.asarray(dst)
        self.in_deg = jnp.asarray(dataset.graph.degrees.astype(np.float32))
        self.labels = jnp.asarray(dataset.labels.astype(np.int32))
        self.train_idx = jnp.asarray(dataset.train_idx)

        # linear warmup to lr over warmup_epochs, then constant — the
        # reference's lr*epoch/50 counts epochs FROM 1 (`adjust_learning_rate`,
        # gcn_gat_partition.py:79-82), so epoch 0 trains at lr/W, not 0
        W = max(cfg.warmup_epochs, 1)
        sched = optax.join_schedules(
            [optax.linear_schedule(cfg.lr / W, cfg.lr, max(W - 1, 1)),
             optax.constant_schedule(cfg.lr)], [max(W - 1, 1)])
        self.tx = optax.adamw(sched, weight_decay=cfg.weight_decay)

        rng = jax.random.PRNGKey(cfg.seed)
        onehot0 = jnp.zeros((dataset.num_nodes, dataset.num_classes), jnp.float32) \
            if cfg.use_labels else None
        self.variables = self.model.init(
            {"params": rng, "dropout": rng}, self.src, self.dst, self.in_deg,
            onehot0, train=False, spmm_args=self._spmm_args)
        self.opt_state = self.tx.init(self.variables["params"])
        self._step = self._build_step()
        self._eval = self._build_eval()

    def _build_step(self):
        model, tx, cfg = self.model, self.tx, self.cfg
        n_classes = self.ds.num_classes

        @jax.jit
        def step(variables, opt_state, src, dst, in_deg, labels,
                 pred_idx_mask, label_mask, rng, spmm_args):
            params = variables["params"]
            aux = {k: v for k, v in variables.items() if k != "params"}
            # the (N, C) onehot is built ON DEVICE from the (N,) mask — the
            # host version was a ~460 MB H2D transfer per epoch at products
            # scale, for data derivable from a few MB
            label_onehot = (jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
                            * label_mask[:, None]) if cfg.use_labels else None

            def loss_fn(p):
                out, mutated = model.apply(
                    {"params": p, **aux}, src, dst, in_deg, label_onehot,
                    train=True, spmm_args=spmm_args, rngs={"dropout": rng},
                    mutable=["batch_stats", "ttcache"])
                # masked mean over the 50% prediction split
                ce = optax.softmax_cross_entropy_with_integer_labels(out, labels)
                eps = 1 - math.log(2)
                y = jnp.log(eps + ce) - math.log(eps)
                loss = jnp.sum(y * pred_idx_mask) / jnp.maximum(pred_idx_mask.sum(), 1.0)
                return loss, (out, mutated)

            (loss, (logits, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return {"params": new_params, **{**aux, **mutated}}, new_opt, loss, logits

        return step

    def _build_eval(self):
        model, cfg = self.model, self.cfg
        n_classes = self.ds.num_classes

        @jax.jit
        def ev(variables, src, dst, in_deg, labels, label_mask, spmm_args):
            onehot = (jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
                      * label_mask[:, None]) if cfg.use_labels else None
            return model.apply(variables, src, dst, in_deg, onehot,
                               train=False, spmm_args=spmm_args)

        return ev

    def _label_mask(self, label_idx: np.ndarray) -> jax.Array:
        """(N,) float mask of nodes whose label feeds the label trick; the
        (N, C) onehot itself is built on device (see _build_step)."""
        if not self.cfg.use_labels:
            return jnp.zeros((1,), jnp.float32)  # placeholder (unused)
        mask = np.zeros(self.ds.num_nodes, np.float32)
        mask[label_idx] = 1.0
        return jnp.asarray(mask)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed + epoch)
        # 50% train-mask split (`gcn_gat_partition.py:104-116`)
        tr = np.asarray(self.train_idx)
        mask = rng.random(len(tr)) < cfg.mask_rate
        label_idx, pred_idx = tr[mask], tr[~mask]
        if not cfg.use_labels:
            pred_idx = tr[mask]
        pred_mask = np.zeros(self.ds.num_nodes, np.float32)
        pred_mask[pred_idx] = 1.0

        t0 = time.perf_counter()
        key = jax.random.PRNGKey(cfg.seed * 131 + epoch)
        self.variables, self.opt_state, loss, logits = self._step(
            self.variables, self.opt_state, self.src, self.dst, self.in_deg,
            self.labels, jnp.asarray(pred_mask), self._label_mask(label_idx),
            key, self._spmm_args)
        loss = float(loss)
        dt = time.perf_counter() - t0
        return {"loss": loss, "epoch_time": dt,
                "edges_per_s": self.ds.graph.num_edges / dt}

    def evaluate(self) -> Dict[str, float]:
        if not hasattr(self, "_eval_label_mask"):
            self._eval_label_mask = self._label_mask(np.asarray(self.train_idx))
        logits = np.asarray(self._eval(self.variables, self.src, self.dst,
                                       self.in_deg, self.labels,
                                       self._eval_label_mask,
                                       self._spmm_args))
        pred = logits.argmax(-1)
        lab = np.asarray(self.labels)
        return {f"{s}_acc": float((pred[i] == lab[i]).mean())
                for s, i in [("train", self.ds.train_idx),
                             ("val", self.ds.val_idx),
                             ("test", self.ds.test_idx)]}

    def fit(self, epochs: Optional[int] = None) -> Dict[str, Any]:
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        best = {"val_acc": 0.0, "test_acc": 0.0}
        history = []
        for epoch in range(epochs):
            stats = self.train_epoch(epoch)
            if (epoch + 1) % cfg.eval_every == 0 or epoch == epochs - 1:
                stats.update(self.evaluate())
                if stats["val_acc"] >= best["val_acc"]:
                    best = {"val_acc": stats["val_acc"],
                            "test_acc": stats["test_acc"], "epoch": epoch}
            history.append(stats)
            if self.logger and (epoch + 1) % cfg.eval_every == 0:
                self.logger.info(f"epoch {epoch}: {stats}")
        return {"history": history, "best": best}
