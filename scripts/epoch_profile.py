"""Epoch-level train profile: where does the 21.2 s/epoch (RESULTS r3)
go, when the measured single-batch step is ~10.9 ms?

Rebuilds the run_training inner loop exactly (donated carry, distinct
device-resident batches, one float() read-back per epoch) on a synthetic
epoch of B batches, and times:

  1. the shipped python loop over B distinct batches;
  2. the same loop on ONE batch repeated (isolates per-batch python
     tree-indexing + argument-handling overhead from device time);
  3. a K-unrolled jitted multi-step (K static slices of a stacked batch
     per dispatch) — the dispatch-amortizing candidate;
  4. the val pass (eval_jit over B batches).

    timeout 590 python scripts/epoch_profile.py [B] [K]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import build_workload
    from desco_tpu.batch.packed import stack_batches
    from desco_tpu.models import neighborhood as neigh_mod
    from desco_tpu.models.shmp_gnn import (
        neighborhood_target_config, query_config,
    )
    from desco_tpu.ops.pallas_segment import default_agg_mode
    from desco_tpu.train.loop import (
        make_adam, neighborhood_eval_fn, neighborhood_step_fn,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    batch, qb = build_workload()
    rng_np = np.random.default_rng(0)
    batch = dataclasses.replace(
        batch, y=rng_np.integers(0, 50, (batch.g_cap, 29)).astype(
            np.float32))
    valid_edges = int((np.asarray(batch.node_mask)[
        np.asarray(batch.edge_src)] > 0).sum())

    cfg = neighborhood_target_config(layer_num=8, hidden_dim=64,
                                     output_dim=64,
                                     agg_mode=default_agg_mode())
    qry_cfg = query_config(layer_num=8, hidden_dim=64, output_dim=64)
    tx = make_adam(0.0)
    params = jax.device_put(neigh_mod.init_neighborhood_model(
        jax.random.PRNGKey(0), cfg, qry_cfg))
    opt_state = tx.init(params)
    qb_d = jax.device_put(qb)

    # B distinct device batches, one stacked transfer then sliced —
    # exactly run_training.to_device_list
    stack = jax.device_put(stack_batches([batch] * B))
    train_dev = [jax.tree_util.tree_map(lambda x, i=i: x[i], stack)
                 for i in range(B)]
    jax.block_until_ready(train_dev)

    step_fn = neighborhood_step_fn(cfg, qry_cfg, qb_d, tx)

    def carried_step(carry, b, lr):
        params, opt_state, rng, loss_sum, n_bad = carry
        rng, sub = jax.random.split(rng)
        new_p, new_o, loss = step_fn(params, opt_state, b, lr, sub)
        ok = jnp.isfinite(loss)
        sel = lambda n, o: jnp.where(ok, n, o)
        params = jax.tree_util.tree_map(sel, new_p, params)
        opt_state = jax.tree_util.tree_map(sel, new_o, opt_state)
        return (params, opt_state, rng,
                loss_sum + jnp.where(ok, loss, 0.0),
                n_bad + jnp.where(ok, 0, 1).astype(jnp.int32))

    step_jit = jax.jit(carried_step, donate_argnums=0)
    lr = jnp.float32(1e-4)

    def epoch_python(batches):
        carry = (params, opt_state, jax.random.PRNGKey(7),
                 jnp.float32(0.0), jnp.int32(0))
        carry = jax.tree_util.tree_map(jnp.copy, carry)
        t0 = time.perf_counter()
        for b in batches:
            carry = step_jit(carry, b, lr)
        _ = float(carry[3])
        return time.perf_counter() - t0

    # warm compile
    _ = epoch_python(train_dev[:2])

    t_loop = epoch_python(train_dev)
    t_same = epoch_python([train_dev[0]] * B)

    # K-unrolled multi-step: one dispatch per K batches, static slices of
    # the stacked tree taken INSIDE the jit
    def multi_step(carry, stk, start, lr):
        for j in range(K):
            b = jax.tree_util.tree_map(
                lambda x, j=j: x[start + j] if x.ndim > 0 else x, stk)
            carry = carried_step(carry, b, lr)
        return carry

    multi_jit = jax.jit(multi_step, donate_argnums=0,
                        static_argnums=(2,))

    def epoch_unrolled():
        carry = (params, opt_state, jax.random.PRNGKey(7),
                 jnp.float32(0.0), jnp.int32(0))
        carry = jax.tree_util.tree_map(jnp.copy, carry)
        _ = multi_jit(jax.tree_util.tree_map(jnp.copy, carry), stack, 0,
                      lr)  # compile
        carry = jax.tree_util.tree_map(jnp.copy, carry)
        t0 = time.perf_counter()
        for s in range(0, B - (B % K), K):
            carry = multi_jit(carry, stack, 0, lr)  # same start: one
            # compiled program, K distinct-slice steps per dispatch
        _ = float(carry[3])
        return time.perf_counter() - t0

    t_unroll = epoch_unrolled()

    # val pass as shipped
    eval_fn = neighborhood_eval_fn(cfg, qry_cfg, qb_d)

    def eval_step(acc, p, b):
        s_, w_ = eval_fn(p, b)
        return (acc[0] + s_, acc[1] + w_)

    eval_jit = jax.jit(eval_step, donate_argnums=0)
    acc = (jnp.float32(0.0), jnp.float32(0.0))
    acc = eval_jit(acc, params, train_dev[0])
    _ = float(acc[0])
    t0 = time.perf_counter()
    acc = (jnp.float32(0.0), jnp.float32(0.0))
    for b in train_dev:
        acc = eval_jit(acc, params, b)
    _ = float(acc[0])
    t_val = time.perf_counter() - t0

    ms = lambda t: t / B * 1e3
    print(f"B={B} K={K} valid_edges/batch={valid_edges}")
    print(f"python loop, distinct batches: {ms(t_loop):7.2f} ms/step "
          f"({valid_edges*B/t_loop/1e6:5.1f}M edges/s)")
    print(f"python loop, same batch:       {ms(t_same):7.2f} ms/step")
    print(f"K-unrolled jit:                {ms(t_unroll):7.2f} ms/step "
          f"({valid_edges*B/t_unroll/1e6:5.1f}M edges/s)")
    print(f"val pass:                      {ms(t_val):7.2f} ms/batch")


if __name__ == "__main__":
    main()
