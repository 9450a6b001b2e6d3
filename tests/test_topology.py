"""DP x halo 2-axis composition (parallel/topology.py): a ("data",
"graph") mesh trains gossip on several halo-partitioned graphs at once;
loss/grads must equal the sum of the single-device computations."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from desco_tpu.batch.build import gossip_sample
from desco_tpu.batch.packed import auto_capacities, pack_samples
from desco_tpu.models.gossip import gossip_loss, init_gossip_model
from desco_tpu.parallel.topology import (
    dp_halo_gossip_step_fn,
    dp_halo_shmp_forward,
    harmonized_partitions,
    make_mesh2d,
    stack_partitions,
)
from desco_tpu.train.loop import make_adam

from conftest import random_graph

N_DATA, N_GRAPH = 2, 4


def _replica(rng, n, p, q_n):
    g = random_graph(rng, n, p)
    counts = rng.random((g.n_nodes, q_n)).astype(np.float32)
    truth = rng.random((g.n_nodes, q_n)).astype(np.float32)
    s = gossip_sample(g, counts, truth)
    return g, s, counts, truth


def test_mesh2d_axes():
    mesh = make_mesh2d(N_DATA, N_GRAPH)
    assert mesh.axis_names == ("data", "graph")
    assert mesh.devices.shape == (N_DATA, N_GRAPH)


def test_dp_halo_gossip_loss_and_grads_match(rng):
    q_n = 2
    # two DIFFERENT graphs (different sizes/densities) — the node_range
    # leaf + min_caps harmonization make their partitions stackable
    reps = [_replica(rng, 34, 0.15, q_n), _replica(rng, 52, 0.09, q_n)]
    params = init_gossip_model(jax.random.PRNGKey(5), hidden_dim=8,
                               emb_channels=8)
    q_embs = jnp.asarray(rng.standard_normal((q_n, 8)), jnp.float32)

    # single-device reference: sum of per-graph sum-losses
    ref_loss, ref_grads = 0.0, None
    for _, s, counts, truth in reps:
        [b] = pack_samples([s], *auto_capacities([s], g_cap=1),
                           n_queries=q_n)
        l_, g_ = jax.value_and_grad(gossip_loss)(params, b, q_embs)
        ref_loss += float(l_)
        ref_grads = g_ if ref_grads is None else jax.tree_util.tree_map(
            jnp.add, ref_grads, g_)

    specs = [dict(n_nodes=g.n_nodes, node_type=s.node_type, x=counts,
                  edge_src=s.edge_src, edge_dst=s.edge_dst,
                  edge_type=s.edge_type, node_y=truth)
             for g, s, counts, truth in reps]
    parts = harmonized_partitions(specs, N_GRAPH, n_types=2)
    leaves = [jax.tree_util.tree_leaves(p) for p in parts]
    for a, b in zip(*leaves):
        assert np.shape(a) == np.shape(b)
    stacked = stack_partitions(parts)

    mesh = make_mesh2d(N_DATA, N_GRAPH)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(("data", "graph")), P()),
             out_specs=(P(), P()))
    def lg(params, part, q):
        from desco_tpu.parallel.halo import halo_gossip_loss

        shard = jax.tree_util.tree_map(lambda a: a[0], part)
        return jax.value_and_grad(
            lambda p: jax.lax.psum(
                halo_gossip_loss(p, shard, q, "graph"), "data"))(params)

    with mesh:
        loss, grads = jax.jit(lg)(params, stacked, q_embs)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, r: np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-5),
        grads, ref_grads)


def test_dp_halo_step_runs(rng):
    q_n = 2
    reps = [_replica(rng, 30, 0.2, q_n), _replica(rng, 40, 0.12, q_n)]
    specs = [dict(n_nodes=g.n_nodes, node_type=s.node_type, x=counts,
                  edge_src=s.edge_src, edge_dst=s.edge_dst,
                  edge_type=s.edge_type, node_y=truth)
             for g, s, counts, truth in reps]
    stacked = stack_partitions(
        harmonized_partitions(specs, N_GRAPH, n_types=2))

    params = init_gossip_model(jax.random.PRNGKey(0), hidden_dim=8,
                               emb_channels=8)
    q_embs = jnp.asarray(rng.standard_normal((q_n, 8)), jnp.float32)
    tx = make_adam()
    opt_state = tx.init(params)
    mesh = make_mesh2d(N_DATA, N_GRAPH)
    step = dp_halo_gossip_step_fn(tx, mesh)
    with mesh:
        new_params, opt_state, loss = jax.jit(step)(
            params, opt_state, stacked, q_embs, jnp.float32(1e-3),
            jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    delta = jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + float(jnp.abs(leaf).sum()),
        jax.tree_util.tree_map(jnp.subtract, new_params, params), 0.0)
    assert delta > 0.0
