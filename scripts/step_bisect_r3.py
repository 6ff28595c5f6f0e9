"""Attribute the --sparse train step's non-kernel remainder (round-3).

The 33.5 ms fused-sparse step breaks down as pallas backward 12.7 +
forward 8.4 + "convs/dropout/routed-optimizer ~12" (docs/PERFORMANCE.md).
This probe times surgically modified step bodies under the standard
48-step fori_loop methodology to split that bucket:

  full       the real fused body (reference point)
  dropout0   dropout=0.0 (isolates mask generation + apply, fwd+bwd)
  noopt      tx.update replaced by zero updates (isolates the routed
             optax adam/plateau pass over the dense params)
  noconv     conv tower replaced by a fixed linear head on h_all
             (isolates the whole conv tower fwd+bwd: aggregation means,
             matmuls, relu, dropout) — lookup fwd + fused SGD bwd remain
  nolookup   conv tower on a CONSTANT h_all (no TT forward, no fused
             backward/update) — the tower alone (constant-folded; lower
             bound only)
  bf16drop0  --bf16 + dropout0 combined

Round-3b tower-internal variants (in-script tower reimplementation from
the conv params — same math, surgical switches):

  tower      in-script tower, sanity (should match `full`)
  nomean     fanout means replaced by slice [:, :, 0, :] (isolates the
             aggregation reads/reductions fwd+bwd)
  meanonly   matmuls/relu/dropout removed; means chain + linear head only
  towerfwd   loss computed WITHOUT autograd through the tower (forward
             only); TT kernels still run with a constant d_h

First bisect (2026-08-19, logs/r3_bisect.log): full 33.5 / dropout0 32.0 /
noopt 33.4 / noconv 18.6 / nolookup 4.6 / bf16drop0 31.4 ms per step —
i.e. TT kernels ~18.6, conv tower ~14.9, dropout ~1.5, optimizer ~0.1.

Usage: python scripts/step_bisect_r3.py [S] [R] [variant ...]
       (default: all variants)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = ("full", "dropout0", "noopt", "noconv", "nolookup", "bf16drop0",
            "tower", "nomean", "meanonly", "towerfwd", "ttower")


def build(variant, S):
    import jax
    import jax.numpy as jnp
    import optax
    from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
    from falcon_ttdforgnns_tpu.models.sage import SAGE, collect_level_ids
    from falcon_ttdforgnns_tpu.ops.tt_pallas import (tt_lookup_fused,
                                                     tt_fused_sgd_pallas)
    from falcon_ttdforgnns_tpu.ops.tt_shapes import make_tt_shapes
    from train_bench import get_products_scale_dataset

    # PROBE_TINY=1: small synthetic + small TT for off-TPU smoke runs
    # (PROBE_* env knobs, spmm_eval_bench.py precedent)
    tiny = os.environ.get("PROBE_TINY") == "1"
    if tiny:
        from falcon_ttdforgnns_tpu.graph import synthetic_dataset
        ds = synthetic_dataset(num_nodes=3000, avg_degree=8, num_classes=8,
                               feat_dim=16, seed=0)
    else:
        ds = get_products_scale_dataset()
    cfg = TrainConfig(batch_size=32 if tiny else 1024,
                      fanouts=(2, 3) if tiny else (5, 10, 15),
                      hidden_dim=32 if tiny else 256,
                      num_layers=2 if tiny else 3, use_tt=True,
                      tt_ranks=(4, 4) if tiny else (16, 16),
                      p_shapes=None if tiny else (125, 140, 140),
                      q_shapes=None if tiny else (5, 5, 4),
                      weight_dist="approx-normal",
                      steps_per_call=S, sparse=True,
                      dropout=0.0 if variant in ("dropout0", "bf16drop0")
                      else 0.5,
                      bf16=variant == "bf16drop0",
                      eval_every=10**9, log_every=10**9)
    tr = SageTrainer(ds, cfg)
    model, tx = tr.model, tr.tx
    shapes = make_tt_shapes(ds.num_nodes, ds.feat_dim, cfg.tt_ranks,
                            cfg.p_shapes, cfg.q_shapes)
    block, lr = 1024, cfg.lr

    if variant in ("full", "dropout0", "bf16drop0"):
        return tr, tr._multi_fn

    # in-script tower (same math as models/sage.py _conv_tower, from the
    # conv params directly) with surgical switches
    ncls = ds.num_classes
    n_layers = cfg.num_layers

    def script_tower(params, hs, rng, nomean=False, meanonly=False):
        B = hs[0].shape[0]
        for li in range(n_layers):
            new_hs = []
            for lev in range(len(hs) - 1):
                f = hs[lev + 1].shape[1] // hs[lev].shape[1]
                d = hs[lev].shape[-1]
                r = hs[lev + 1].reshape(B, hs[lev].shape[1], f, d)
                h_neigh = r[:, :, 0, :] if nomean else r.mean(axis=2)
                if meanonly:
                    h = hs[lev] + h_neigh  # no matmuls/relu/dropout
                else:
                    wl = params[f"conv_{li}"]
                    h = (hs[lev] @ wl["self"]["kernel"] + wl["self"]["bias"]
                         + h_neigh @ wl["neigh"]["kernel"])
                    if li < n_layers - 1:
                        h = jax.nn.relu(h)
                        if cfg.dropout > 0:
                            keep = 1.0 - cfg.dropout
                            mask = jax.random.bernoulli(
                                jax.random.fold_in(rng, li * 8 + lev), keep,
                                h.shape)
                            h = jnp.where(mask, h / keep, 0.0)
                new_hs.append(h)
            hs = new_hs
        out = hs[0][:, 0, :]
        if meanonly:
            out = out[:, :ncls]
        return out

    # TRANSPOSED (feature-major) tower: the Pallas lookup kernel natively
    # produces h_allT (D, B·sz) and the backward kernel natively consumes
    # doutT — the row-major tower in between forces XLA into ~8.6 ms of
    # layout copies around the 768K-row level (slice+copy+reshape fwd, the
    # inverse chain bwd, plus the d_out transpose; see logs/r3_profile.log).
    # Running the tower feature-major consumes the kernel output as-is and
    # hands the cotangent back in kernel layout.  Same math: dot_general
    # contracts the leading feature axis on the MXU; means reduce the
    # minor-most fanout axis.
    def ttower_forward(params, hT, sizes, B, rng):
        hsT, off = [], 0
        for sz in sizes:
            hsT.append(hT[:, off:off + sz * B].reshape(-1, B, sz))
            off += sz * B
        for li in range(n_layers):
            new_hs = []
            for lev in range(len(hsT) - 1):
                f = hsT[lev + 1].shape[2] // hsT[lev].shape[2]
                n = hsT[lev].shape[2]
                r = hsT[lev + 1].reshape(-1, B, n, f)
                h_neigh = r.mean(axis=3)
                wl = params[f"conv_{li}"]
                # (d,256) x (d,B,n) -> (256,B,n): contract the leading axis
                h = (jnp.einsum("do,dbn->obn", wl["self"]["kernel"], hsT[lev])
                     + wl["self"]["bias"][:, None, None]
                     + jnp.einsum("do,dbn->obn", wl["neigh"]["kernel"],
                                  h_neigh))
                if li < n_layers - 1:
                    h = jax.nn.relu(h)
                    if cfg.dropout > 0:
                        keep = 1.0 - cfg.dropout
                        mask = jax.random.bernoulli(
                            jax.random.fold_in(rng, li * 8 + lev), keep,
                            h.shape)
                        h = jnp.where(mask, h / keep, 0.0)
                new_hs.append(h)
            hsT = new_hs
        return hsT[0][:, :, 0].T  # (B, num_classes)

    # surgical bodies (modeled on trainer._make_step_body(fused=True))
    def make_body():
        def body(variables, opt_state, seeds, layers, labels, rng):
            params = variables["params"]
            aux_cols = {k: v for k, v in variables.items()
                        if k not in ("params", "tt_opt")}
            cores = tuple(params["embed"][f"tt_core_{k}"]
                          for k in range(shapes.ndim))
            all_ids, _, _ = collect_level_ids(seeds, layers)

            if variant == "ttower":
                # kernel-layout end to end: .T of the lookup's .T folds to
                # the raw (D, B) kernel output; d_hT.T inside the fused-SGD
                # wrapper folds back to d_hT — zero layout copies
                _, sizes, B = collect_level_ids(seeds, layers)
                h_allT = jax.lax.stop_gradient(
                    tt_lookup_fused(shapes, block, cores,
                                    all_ids.astype(jnp.int32))).T

                def loss_fn(p, hT):
                    out = ttower_forward(p, hT, sizes, B, rng)
                    loss = optax.softmax_cross_entropy_with_integer_labels(
                        out, labels).mean()
                    return loss, (out, {})

                (loss, _), (grads, d_hT) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True)(params, h_allT)
                updates, new_opt_state = tx.update(grads, opt_state, params,
                                                   value=loss)
                new_params = optax.apply_updates(params, updates)
                new_cores = tt_fused_sgd_pallas(shapes, cores,
                                                all_ids.astype(jnp.int32),
                                                d_hT.T, lr, block)
                embed = dict(new_params["embed"])
                for k in range(shapes.ndim):
                    embed[f"tt_core_{k}"] = new_cores[k]
                new_params = {**new_params, "embed": embed}
                new_vars = {"params": new_params, **aux_cols}
                return new_vars, new_opt_state, loss, jnp.float32(0)

            if variant == "nolookup":
                h_all = jnp.ones((all_ids.shape[0], shapes.embedding_dim),
                                 jnp.float32)
            else:
                h_all = jax.lax.stop_gradient(
                    tt_lookup_fused(shapes, block, cores,
                                    all_ids.astype(jnp.int32)))

            def split_levels(h):
                _, sizes, B = collect_level_ids(seeds, layers)
                hs, off = [], 0
                for sz in sizes:
                    hs.append(h[off:off + sz * B].reshape(B, sz, -1))
                    off += sz * B
                return hs

            if variant == "towerfwd":
                # forward-only tower: no autograd; TT kernels still run
                # with a constant d_h (isolates the tower BACKWARD)
                out = model.apply({"params": params, **aux_cols}, h_all,
                                  seeds, layers, train=True,
                                  rngs={"dropout": rng},
                                  method=SAGE.forward_from_embeddings)
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    out, labels).mean()
                d_h = jnp.ones_like(h_all)
                new_cores = tt_fused_sgd_pallas(shapes, cores,
                                                all_ids.astype(jnp.int32),
                                                d_h, lr, block)
                embed = dict(params["embed"])
                for k in range(shapes.ndim):
                    embed[f"tt_core_{k}"] = new_cores[k]
                new_params = {**params, "embed": embed}
                new_vars = {"params": new_params, **aux_cols}
                return new_vars, opt_state, loss, jnp.float32(0)

            if variant == "noconv":
                # fixed linear head directly on h_all: keeps a real d_h
                # (same shape/dtype) without any tower work
                def loss_fn(p, h):
                    del p
                    logits = h[:labels.shape[0], :ncls]
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, labels).mean(), (logits, {})
            elif variant in ("tower", "nomean", "meanonly"):
                def loss_fn(p, h):
                    hs = split_levels(h)
                    out = script_tower(p, hs, rng,
                                       nomean=variant == "nomean",
                                       meanonly=variant == "meanonly")
                    loss = optax.softmax_cross_entropy_with_integer_labels(
                        out, labels).mean()
                    return loss, (out, {})
            else:
                def loss_fn(p, h):
                    out, mutated = model.apply(
                        {"params": p, **aux_cols}, h, seeds, layers,
                        train=True, rngs={"dropout": rng},
                        mutable=["ttcache", "batch_stats", "access_counts"],
                        method=SAGE.forward_from_embeddings)
                    loss = optax.softmax_cross_entropy_with_integer_labels(
                        out, labels).mean()
                    return loss, (out, mutated)

            (loss, (logits, mutated)), (grads, d_h) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, h_all)
            if variant == "noopt":
                new_opt_state = opt_state
                new_params = params
            else:
                updates, new_opt_state = tx.update(grads, opt_state, params,
                                                   value=loss)
                new_params = optax.apply_updates(params, updates)
            if variant == "nolookup":
                new_vars = {"params": new_params, **aux_cols, **mutated}
                return new_vars, new_opt_state, loss, jnp.float32(0)
            new_cores = tt_fused_sgd_pallas(shapes, cores,
                                            all_ids.astype(jnp.int32),
                                            d_h, lr, block)
            embed = dict(new_params["embed"])
            for k in range(shapes.ndim):
                embed[f"tt_core_{k}"] = new_cores[k]
            new_params = {**new_params, "embed": embed}
            new_vars = {"params": new_params, **aux_cols, **mutated}
            return new_vars, new_opt_state, loss, jnp.float32(0)

        return body

    step_body = make_body()
    widths = tr._layer_widths()

    @jax.jit
    def multi_step(variables, opt_state, packed, rng):
        def body(i, carry):
            variables, opt_state, loss_sum, acc_sum = carry
            row = packed[i]
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

    return tr, multi_step


def main():
    args = [a for a in sys.argv[1:]]
    nums = [a for a in args if a.isdigit()]
    S = int(nums[0]) if nums else 48
    R = int(nums[1]) if len(nums) > 1 else 4
    wanted = [a for a in args if a in VARIANTS] or list(VARIANTS)

    import jax
    from falcon_ttdforgnns_tpu.train import SageTrainer  # noqa: F401

    packed = None
    for variant in wanted:
        t0 = time.time()
        tr, fn = build(variant, S)
        if packed is None:
            it = iter(tr.loader)
            group = [next(it) for _ in range(S)]
            packed_np = tr._pack_group(group)
        import jax.numpy as jnp
        packed = jnp.asarray(packed_np)
        rng = tr._epoch_rng(0)
        print(f"[{variant}] init {time.time() - t0:.0f}s", flush=True)

        t0 = time.time()
        v, o, loss, acc = fn(tr.variables, tr.opt_state, packed, rng)
        float(loss)
        print(f"[{variant}] compile+first ({S} steps): "
              f"{time.time() - t0:.1f}s", flush=True)

        t0 = time.time()
        for r in range(R):
            v, o, loss, acc = fn(v, o, packed, jax.random.fold_in(rng, r))
        loss_f = float(loss)
        dt = time.time() - t0
        print(f"[{variant}] {R}x{S} steps: {dt:.2f}s -> "
              f"{dt / (R * S) * 1e3:.1f} ms/step  (loss {loss_f:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
