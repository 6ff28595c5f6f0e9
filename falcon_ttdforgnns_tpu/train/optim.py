"""Optimizer wiring for TT-GNN training.

Functional re-design of the reference's split optimizer scheme
(`sage_dgl_partition.py:100-107`, `FBTT/tt_embeddings_ops.py:214-366`):
the reference mixes an outer Adam over model+cores with optional *fused*
in-kernel sparse SGD / row-wise adagrad applied to TT cores and cache rows
inside autograd (grads returned as None).  Here every gradient flows
functionally and ``optax.multi_transform`` routes parameter groups:

  - GNN weights             -> Adam (+ ReduceLROnPlateau scaling)
  - TT cores                -> Adam (default) or plain SGD ("sparse mode",
                               the EXACT_SGD semantics — deterministic
                               unique-reduced grads come from the lookup VJP)
  - cache rows (cache_weight) -> SGD or row-wise adagrad
                               (`cache_backward_*`, `cu:1585-1846`)

The reference's double-lr application bug (Adam over cores *and* fused
kernel SGD, SURVEY.md §7 watch-items) is intentionally not replicated.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict


def _label_params(params: Any) -> Any:
    """Label tree: 'cache' for cache_weight leaves, 'tt' for TT cores,
    'model' for everything else."""

    def label(path, _leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if any("cache_weight" == n for n in names):
            return "cache"
        if any(str(n).startswith("tt_core_") for n in names):
            return "tt"
        return "model"

    return jax.tree_util.tree_map_with_path(label, params)


# eps conventions shared by the routed transforms AND the fused Pallas
# kernels (trainer.py) — single source of truth so the two paths cannot
# silently diverge from the parity the tests assert
ADAGRAD_EPS = 1e-10
ROWWISE_ADAGRAD_EPS = 1e-8
ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


def tt_adagrad(lr: float, eps: float = ADAGRAD_EPS) -> optax.GradientTransformation:
    """Per-element adagrad with the REFERENCE's eps convention:
    ``w -= lr * g / (sqrt(state) + eps)`` (`update_tt_cores_adagrad_kernel`,
    cu:399-419).  optax.adagrad puts eps INSIDE the rsqrt, which floors
    the normalization to lr*g/sqrt(eps) for the tiny first-step core
    grads (cores init near zero so chain grads are ~1e-7) and freezes
    training; the reference convention yields healthy ±lr sign-steps."""

    def init(params):
        return jax.tree.map(jnp.zeros_like, params)

    def update(grads, state, params=None):
        next_state = jax.tree.map(lambda g, a: a + g * g, grads, state)
        updates = jax.tree.map(
            lambda g, a: -lr * g / (jnp.sqrt(a) + eps), grads, next_state)
        return updates, next_state

    return optax.GradientTransformation(init, update)


def rowwise_adagrad(lr: float, eps: float = ROWWISE_ADAGRAD_EPS) -> optax.GradientTransformation:
    """Row-wise adagrad: one accumulator per leading-axis row — semantics
    of ``cache_backward_rowwise_adagrad_approx``
    (`FBTT/tt_embeddings_cuda.cu:1746-1846`).  Works on (K, D) cache rows
    and on (p, r, q, r') TT cores alike (accumulator over axis 0)."""

    def init(params):
        return jax.tree.map(
            lambda p: jnp.zeros(p.shape[:1], p.dtype) if getattr(p, "ndim", 0) >= 2
            else jnp.zeros(()), params)

    def update(grads, state, params=None):
        def new_acc(g, acc):
            nd = getattr(g, "ndim", 0)
            if nd < 2:
                return acc
            return acc + jnp.mean(g * g, axis=tuple(range(1, nd)))

        def upd(g, acc):
            nd = getattr(g, "ndim", 0)
            if nd < 2:
                return -lr * g
            # reference eps convention: lr / (sqrt(state) + eps), cu:1795
            scale = lr / (jnp.sqrt(acc) + eps)
            return -scale.reshape((-1,) + (1,) * (nd - 1)) * g

        next_state = jax.tree.map(new_acc, grads, state)
        updates = jax.tree.map(upd, grads, next_state)
        return updates, next_state

    return optax.GradientTransformation(init, update)


class PlateauState(NamedTuple):
    scale: jax.Array          # current lr multiplier
    best_value: jax.Array     # best (smoothed) loss seen
    plateau_count: jax.Array  # steps since improvement
    ema: jax.Array            # smoothed loss (= raw value when smoothing=0)


def reduce_on_plateau(patience: int = 800, factor: float = 0.5,
                      rtol: float = 1e-4, atol: float = 0.0,
                      min_scale: float = 0.0,
                      smoothing: float = 0.0) -> optax.GradientTransformationExtraArgs:
    """Branch-free ReduceLROnPlateau (semantics of
    `torch.optim.lr_scheduler.ReduceLROnPlateau` stepped per train step on
    the loss, `sage_dgl_partition.py:107,319`; same math as
    ``optax.contrib.reduce_on_plateau`` with accumulation_size=1,
    cooldown=0).

    Why not optax.contrib's: its nested ``lax.cond``s measure **1.2 s/step**
    inside the products train loop on the v5e (vs 35 ms for the whole rest
    of the step) — scalar conds inside the jitted while-loop hit a
    pathological XLA/TPU path.  This ``jnp.where`` formulation costs
    nothing (scripts/step_bisect4.py).

    ``smoothing`` (EMA coefficient, 0 = compare raw values — exact torch
    parity): the ratchet compares an exponential moving average of the
    loss instead of each raw sample.  Needed when the loss is measured
    through bf16 (~1e-2 relative quantization noise): a lucky-low raw
    sample sets ``best_value`` below anything genuine progress can beat,
    the patience expires, and the lr halves into the noise floor — the
    round-4 full-bf16 ~0.933 accuracy ceiling (round-5 probe: disabling
    the plateau restores the f32 convergence pace).  An EMA with
    ``smoothing=1/64`` suppresses the noise ~8x while tracking the trend
    with a ~64-step lag — far inside the 800-step patience."""

    def init(params):
        return PlateauState(scale=jnp.asarray(1.0, jnp.float32),
                            best_value=jnp.asarray(jnp.inf, jnp.float32),
                            plateau_count=jnp.asarray(0, jnp.int32),
                            ema=jnp.asarray(jnp.inf, jnp.float32))

    def update(updates, state, params=None, *, value, **extra):
        del params, extra
        v = jnp.asarray(value, jnp.float32)
        if smoothing > 0.0:
            v = jnp.where(jnp.isinf(state.ema), v,
                          (1 - smoothing) * state.ema + smoothing * v)
        improved = v < (1 - rtol) * state.best_value - atol
        best = jnp.where(improved, v, state.best_value)
        pc = jnp.where(improved, 0, state.plateau_count + 1)
        hit = pc >= patience
        scale = jnp.maximum(jnp.where(hit, state.scale * factor, state.scale),
                            min_scale)
        pc = jnp.where(hit, 0, pc)
        updates = jax.tree.map(lambda g: scale * g, updates)
        return updates, PlateauState(scale=scale, best_value=best,
                                     plateau_count=pc, ema=v)

    return optax.GradientTransformationExtraArgs(init, update)


def plateau_scale(opt_state) -> jax.Array:
    """Extract the reduce_on_plateau lr multiplier from a (possibly
    chained/replicated) optimizer state — 1.0 when no plateau transform is
    present.  The fused-sparse train step couples this into the fused
    Adam kernel's traced lr so the cores follow the SAME schedule the
    routed path applies to its updates (exact routed-parity; also the
    reference's scheduler scaled its core-Adam lr,
    `sage_dgl_partition.py:107`)."""
    for leaf in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, PlateauState)):
        if isinstance(leaf, PlateauState):
            return leaf.scale
    return jnp.asarray(1.0, jnp.float32)


def make_optimizer(
    lr: float = 0.003,
    weight_decay: float = 0.0,
    tt_optimizer: str = "adam",      # adam | sgd | adagrad | rowwise_adagrad
    tt_lr: Optional[float] = None,
    cache_optimizer: str = "rowwise_adagrad",  # sgd | rowwise_adagrad | adam
    cache_lr: Optional[float] = None,
    plateau: bool = True,
    plateau_patience: int = 800,
    plateau_factor: float = 0.5,
    plateau_rtol: float = 1e-4,
    plateau_smoothing: float = 0.0,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build the routed optimizer.  ``plateau`` reproduces the reference's
    per-step ``ReduceLROnPlateau(patience=800)`` on training loss
    (`sage_dgl_partition.py:107,319`) via ``optax.contrib.reduce_on_plateau``
    — callers must pass ``value=loss`` as an update kwarg.

    ``plateau_rtol`` is the improvement threshold (torch's ``threshold``,
    default 1e-4); ``plateau_smoothing`` feeds the ratchet an EMA of the
    loss instead of raw samples — pass ~1/64 when the loss is computed
    through bf16 (see :func:`reduce_on_plateau` for the noise-ratchet
    failure mode this prevents)."""
    tt_lr = tt_lr if tt_lr is not None else lr
    cache_lr = cache_lr if cache_lr is not None else lr

    def adam(rate):
        if weight_decay > 0:
            return optax.adamw(rate, weight_decay=weight_decay)
        return optax.adam(rate)

    # TT-core optimizer routing: adam / sgd (EXACT_SGD) / adagrad
    # (`tt_adagrad_backward`, cu:721-754: per-element accumulator) /
    # rowwise_adagrad (EXACT_ROWWISE_ADAGRAD semantics)
    if tt_optimizer == "adam":
        tt_tx = adam(tt_lr)
    elif tt_optimizer == "sgd":
        tt_tx = optax.sgd(tt_lr)
    elif tt_optimizer == "adagrad":
        tt_tx = tt_adagrad(tt_lr)
    elif tt_optimizer == "rowwise_adagrad":
        tt_tx = rowwise_adagrad(tt_lr)
    else:
        raise ValueError(f"unknown tt_optimizer {tt_optimizer!r}")
    if cache_optimizer == "sgd":
        cache_tx = optax.sgd(cache_lr)
    elif cache_optimizer == "adam":
        cache_tx = adam(cache_lr)
    elif cache_optimizer == "rowwise_adagrad":
        cache_tx = rowwise_adagrad(cache_lr)
    else:
        raise ValueError(f"unknown cache_optimizer {cache_optimizer!r}")

    tx = optax.multi_transform(
        {"model": adam(lr), "tt": tt_tx, "cache": cache_tx},
        _label_params,
    )
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(tx)
    if plateau:
        chain.append(reduce_on_plateau(
            patience=plateau_patience, factor=plateau_factor,
            rtol=plateau_rtol, smoothing=plateau_smoothing))
    return optax.chain(*chain)


def reset_cache_opt_state(tx, opt_state, params):
    """Fresh optimizer state for the 'cache' param group only.

    ``populate`` re-sorts the id table, so slot→node assignments change:
    per-slot accumulators/momenta from the previous population would scale
    the *wrong* rows' updates (the reference zeroes
    ``cache_optimizer_state`` inside ``cache_populate_cuda`` for the same
    reason).  Model/TT states are preserved."""
    fresh = tx.init(params)

    def graft(old, new):
        if hasattr(old, "inner_states"):  # multi_transform partition state
            inner = dict(old.inner_states)
            inner["cache"] = new.inner_states["cache"]
            return type(old)(inner)
        if isinstance(old, tuple):
            grafted = [graft(o, n) for o, n in zip(old, new)]
            return (type(old)(*grafted) if hasattr(old, "_fields")
                    else tuple(grafted))
        return old

    return graft(opt_state, fresh)


def cache_populate_apply(model, variables: dict, freq=None) -> dict:
    """Functionally run the warmup->populate transition
    (`sage_dgl_partition.py:350-361` lifecycle): returns new ``variables``
    with refreshed ``ttcache`` metadata and the materialized rows installed
    into the ``cache_weight`` param.

    ``model`` is the flax module (SAGE or anything exposing
    ``embed_layer.cache_populate`` through ``apply``).
    """
    if freq is not None:
        import jax.numpy as jnp
        tt = variables["ttcache"]
        # replace the freq leaf of every CacheMeta in the collection
        from ..ops.cache import CacheMeta
        def walk(tree):
            if isinstance(tree, CacheMeta):
                return tree._replace(freq=jnp.asarray(freq, jnp.int32))
            if isinstance(tree, dict):
                return {k: walk(v) for k, v in tree.items()}
            return tree
        variables = {**variables, "ttcache": walk(tt)}
    _, mutated = jax.jit(lambda v: model.apply(
        v,
        method=lambda m: m.embed_layer.cache_populate(),
        mutable=["ttcache", "ttcache_populate"],
    ))(variables)
    new_vars = dict(variables)
    new_vars["ttcache"] = mutated["ttcache"]
    # install materialized rows into the param pytree
    weight = jax.tree.leaves(mutated["ttcache_populate"])[0]
    if isinstance(weight, (tuple, list)):
        weight = weight[0]
    params = flatten_replace_cache_weight(variables["params"], weight)
    new_vars["params"] = params
    return new_vars


def flatten_replace_cache_weight(params, new_weight):
    def replace(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if any("cache_weight" == n for n in names):
            return new_weight
        return leaf

    return jax.tree_util.tree_map_with_path(replace, params)
