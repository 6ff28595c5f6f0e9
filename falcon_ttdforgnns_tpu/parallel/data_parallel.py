"""Data-parallel training over a device mesh.

DDP-equivalent (`sage_dgl_partition.py:140-255`): params replicated, batch
sharded over the 'data' axis, gradients all-reduced.  With ``jax.jit`` +
``NamedSharding`` annotations XLA emits the psum over ICI automatically —
there is no hand-written communication (SURVEY.md §2.4's contract:
"replicated model, sharded minibatch, allreduced grads").
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, replicated


def make_dp_train_step(model, tx, mesh: Mesh) -> Callable:
    """Jitted DP train step: same body as the single-chip step
    (train/trainer.py), with in/out shardings pinned to the mesh.

    Inputs: variables/opt_state replicated; seeds/layers/labels batch-
    sharded.  Output shardings mirror inputs; the loss/acc scalars are
    fully reduced (psum by XLA through the mean).
    """
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)

    def step(variables, opt_state, seeds, layers, labels, rng):
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
        updates, new_opt_state = tx.update(grads, opt_state, params, value=loss)
        new_params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        new_vars = {"params": new_params, **{**aux_cols, **mutated}}
        return new_vars, new_opt_state, loss, acc

    return jax.jit(
        step,
        in_shardings=(repl, repl, bsh, bsh, bsh, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1),
    )


def scaling_efficiency(edges_per_s: Dict[int, float]) -> Dict[int, float]:
    """edges/s at N chips vs perfect linear scaling from 1 chip
    (BASELINE.json north-star: >=80%)."""
    base = edges_per_s.get(1)
    if not base:
        return {}
    return {n: v / (base * n) for n, v in edges_per_s.items()}


def make_dp_multi_step(model, tx, mesh: Mesh, steps_per_call: int,
                       layer_widths) -> Callable:
    """Multi-step DP: S optimizer steps per dispatch over packed batches
    (S, B, 2+sum(F)) with B sharded over 'data' — combines the dispatch
    amortization of the multi-step trainer with mesh data parallelism."""
    import optax as _optax

    repl = replicated(mesh)
    packed_sh = NamedSharding(mesh, P(None, "data", None))
    S = steps_per_call

    def multi_step(variables, opt_state, packed, rng):
        def body(i, carry):
            variables, opt_state, loss_sum, acc_sum = carry
            params = variables["params"]
            aux = {k: v for k, v in variables.items() if k != "params"}
            row = packed[i]
            seeds = row[:, 0]
            labels = row[:, 1]
            layers, off = [], 2
            for w in layer_widths:
                layers.append(row[:, off:off + w])
                off += w

            def loss_fn(p):
                out, mutated = model.apply(
                    {"params": p, **aux}, seeds, layers, train=True,
                    rngs={"dropout": jax.random.fold_in(rng, i)},
                    mutable=["ttcache", "batch_stats", "access_counts"])
                loss = _optax.softmax_cross_entropy_with_integer_labels(
                    out, labels).mean()
                return loss, (out, mutated)

            (loss, (logits, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params, value=loss)
            new_params = _optax.apply_updates(params, updates)
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            return ({"params": new_params, **{**aux, **mutated}}, new_opt,
                    loss_sum + loss, acc_sum + acc)

        variables, opt_state, ls, as_ = jax.lax.fori_loop(
            0, S, body, (variables, opt_state, jnp.float32(0), jnp.float32(0)))
        return variables, opt_state, ls / S, as_ / S

    return jax.jit(multi_step,
                   in_shardings=(repl, repl, packed_sh, repl),
                   out_shardings=(repl, repl, repl, repl),
                   donate_argnums=(0, 1))
