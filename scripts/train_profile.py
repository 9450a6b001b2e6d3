"""Differential profile of the neighborhood TRAIN step: where do the
100ms (round-1) go?

Times, per agg mode: loss forward, loss+grad, full step (grad+adam), and
component ablations (no count head, tower-only grad) so backward shares
fall out by subtraction.

    timeout 590 python scripts/train_profile.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


import jax
import jax.numpy as jnp


def main():
    from bench import build_workload
    from desco_tpu.models import neighborhood as neigh_mod
    from desco_tpu.models.shmp_gnn import (
        apply_shmp, neighborhood_target_config, query_config,
    )
    from desco_tpu.train.loop import make_adam, neighborhood_step_fn

    import dataclasses

    batch, qb = build_workload()
    rng_np = np.random.default_rng(0)
    batch = dataclasses.replace(
        batch, y=rng_np.integers(0, 50, (batch.g_cap, 29)).astype(
            np.float32))
    valid_edges = int((np.asarray(batch.node_mask)[
        np.asarray(batch.edge_src)] > 0).sum())
    print(f"batch: n_cap={batch.n_cap} e_cap={batch.e_cap} "
          f"g_cap={batch.g_cap} valid_edges={valid_edges}", flush=True)

    qry_cfg = query_config(layer_num=8, hidden_dim=64, output_dim=64)
    tx = make_adam(0.0)
    rng = jax.random.PRNGKey(1)

    for mode in ("aggregate_first", "pallas"):
        cfg = neighborhood_target_config(
            layer_num=8, hidden_dim=64, output_dim=64, agg_mode=mode)
        params = neigh_mod.init_neighborhood_model(
            jax.random.PRNGKey(0), cfg, qry_cfg)
        opt_state = tx.init(params)
        batch_d = jax.device_put(batch)
        qb_d = jax.device_put(qb)
        params = jax.device_put(params)

        loss_f = jax.jit(lambda p, b, r, cfg=cfg: neigh_mod.train_loss(
            p, cfg, qry_cfg, b, qb_d, rng=r))
        dt_fwd = timeit(loss_f, params, batch_d, rng)

        grad_f = jax.jit(lambda p, b, r, cfg=cfg: jax.value_and_grad(
            lambda pp: neigh_mod.train_loss(pp, cfg, qry_cfg, b, qb_d,
                                            rng=r))(p))
        dt_grad = timeit(grad_f, params, batch_d, rng)

        step = jax.jit(neighborhood_step_fn(cfg, qry_cfg, qb_d, tx),
                       donate_argnums=(0, 1))
        # non-donated timing copy problem: donate needs fresh buffers;
        # re-put each reps — instead time with donation via carry loop
        p2 = jax.tree_util.tree_map(jnp.copy, params)
        o2 = jax.tree_util.tree_map(jnp.copy, opt_state)
        lr = jnp.float32(1e-4)
        p2, o2, l = step(p2, o2, batch_d, lr, rng)
        _ = float(l)
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            p2, o2, l = step(p2, o2, batch_d, lr, rng)
        _ = float(l)
        dt_step = (time.perf_counter() - t0) / reps

        # tower-only grad (no count head / queries): isolates SHMP bwd
        def tower_loss(p, b, r):
            emb = apply_shmp(p["target"], cfg, b, train=True, rng=r)
            return (emb * emb).sum()

        tg = jax.jit(lambda p, b, r: jax.value_and_grad(tower_loss)(
            p, b, r))
        dt_tower_grad = timeit(tg, params, batch_d, rng)

        print(f"[{mode}] fwd {dt_fwd*1e3:7.2f} ms | fwd+bwd "
              f"{dt_grad*1e3:7.2f} ms | step {dt_step*1e3:7.2f} ms | "
              f"tower fwd+bwd {dt_tower_grad*1e3:7.2f} ms | "
              f"step edges/s {valid_edges/dt_step/1e6:6.1f}M", flush=True)


if __name__ == "__main__":
    main()
