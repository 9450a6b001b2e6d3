"""Halo-partitioned graph parallelism: sharded aggregation and the full
sharded SHMP core must match the single-device computation exactly."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from desco_tpu.batch.build import neighborhood_sample
from desco_tpu.batch.packed import auto_capacities, pack_samples
from desco_tpu.graph import Graph, canonical_neighborhood
from desco_tpu.models.shmp_gnn import (
    apply_shmp_core,
    init_shmp,
    neighborhood_target_config,
)
from desco_tpu.ops.segment import typed_edge_aggregate
from desco_tpu.parallel.dp import make_mesh
from desco_tpu.parallel.halo import (
    halo_exchange,
    halo_shmp_core,
    halo_typed_aggregate,
    partition_typed_graph,
)

from conftest import random_graph

N_DEV = 4


def big_typed_graph(rng, n=50, p=0.15):
    """A random typed graph in flat-array form (single 'graph')."""
    g = random_graph(rng, n, p)
    nb = canonical_neighborhood(g, n - 1, depth=10)  # nearly whole graph
    s = neighborhood_sample(nb)
    return s, nb


def test_partition_and_aggregate_match(rng):
    s, _ = big_typed_graph(rng)
    n = s.n_nodes
    x = rng.standard_normal((n, 8)).astype(np.float32)
    part = partition_typed_graph(
        n, s.node_type, x, s.edge_src, s.edge_dst, s.edge_type, N_DEV)

    # single-device reference
    ref = np.asarray(typed_edge_aggregate(
        jnp.asarray(x), jnp.asarray(s.edge_src), jnp.asarray(s.edge_dst),
        jnp.asarray(s.edge_type), 6))  # [n, 6, 8]

    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))

    @partial(jax.shard_map, mesh=mesh, in_specs=P("graph"),
             out_specs=P("graph"))
    def run(shard):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        halo = halo_exchange(shard.x, shard.send_idx, shard.send_mask)
        agg = halo_typed_aggregate(
            shard.x, halo, shard.edge_src_ext, shard.edge_dst,
            shard.edge_type, 6)
        return agg[None]  # [1, n_loc, 6, 8] per device

    with mesh:
        out = jax.jit(run)(part)  # [D, n_loc, 6, 8]
    out = np.asarray(out)
    n_loc = part.n_loc
    for dev in range(N_DEV):
        lo, hi = dev * n_loc, min((dev + 1) * n_loc, n)
        np.testing.assert_allclose(
            out[dev][:hi - lo], ref[lo:hi], rtol=1e-5, atol=1e-6)


def test_halo_shmp_core_matches_single_device(rng):
    s, _ = big_typed_graph(rng, n=40)
    n = s.n_nodes
    cfg = neighborhood_target_config(layer_num=3, hidden_dim=8)
    params = init_shmp(jax.random.PRNGKey(0), cfg)

    # single-device reference through the packed path
    [b] = pack_samples([s], *auto_capacities([s], g_cap=1))
    ref = np.asarray(apply_shmp_core(params, cfg, b))[:n]

    part = partition_typed_graph(
        n, s.node_type, s.x, s.edge_src, s.edge_dst, s.edge_type, N_DEV)
    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("graph")),
             out_specs=P("graph"))
    def run(params, shard):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        return halo_shmp_core(params, cfg, shard)[None]

    with mesh:
        out = np.asarray(jax.jit(run)(params, part))  # [D, n_loc, P]
    n_loc = part.n_loc
    got = out.reshape(N_DEV * n_loc, -1)[:n]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_halo_gossip_matches_single_device(rng):
    """Sharded single-graph gossip forward == packed single-device path."""
    from desco_tpu.batch.build import gossip_sample
    from desco_tpu.models.gossip import apply_gossip_single, init_gossip_model
    from desco_tpu.parallel.halo import halo_gossip_single

    g = random_graph(rng, 36, 0.15)
    n = g.n_nodes
    x_counts = rng.random((n, 1)).astype(np.float32)
    s = gossip_sample(g, x_counts, x_counts)
    [b] = pack_samples([s], *auto_capacities([s], g_cap=1), n_queries=1)

    params = init_gossip_model(jax.random.PRNGKey(5), hidden_dim=8,
                               emb_channels=8)
    q_emb = jnp.asarray(rng.standard_normal(8), jnp.float32)
    ref = np.asarray(apply_gossip_single(
        params, b, jnp.asarray(b.x[:, 0]), q_emb))[:n]

    part = partition_typed_graph(
        n, s.node_type, s.x, s.edge_src, s.edge_dst, s.edge_type, N_DEV)
    n_loc = part.n_loc
    # shard the count column like the nodes
    xcol = np.zeros((N_DEV, n_loc), np.float32)
    for d in range(N_DEV):
        lo, hi = d * n_loc, min((d + 1) * n_loc, n)
        xcol[d, :hi - lo] = x_counts[lo:hi, 0]

    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("graph"), P("graph"), P()),
             out_specs=P("graph"))
    def run(params, shard, xc, q):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        return halo_gossip_single(params, shard, xc[0], q)[None]

    with mesh:
        out = np.asarray(jax.jit(run)(params, part, xcol, q_emb))
    got = out.reshape(N_DEV * n_loc)[:n]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("conv", ["GIN", "GCN"])
def test_halo_shmp_core_gin_gcn_match(rng, conv):
    """The shared layer body gives the halo path GIN/GCN for free."""
    s, _ = big_typed_graph(rng, n=40)
    n = s.n_nodes
    cfg = neighborhood_target_config(layer_num=2, hidden_dim=8,
                                     conv_type=conv)
    params = init_shmp(jax.random.PRNGKey(2), cfg)
    [b] = pack_samples([s], *auto_capacities([s], g_cap=1))
    ref = np.asarray(apply_shmp_core(params, cfg, b))[:n]

    part = partition_typed_graph(
        n, s.node_type, s.x, s.edge_src, s.edge_dst, s.edge_type, N_DEV)
    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("graph")),
             out_specs=P("graph"))
    def run(params, shard):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        return halo_shmp_core(params, cfg, shard)[None]

    with mesh:
        out = np.asarray(jax.jit(run)(params, part))
    got = out.reshape(N_DEV * part.n_loc, -1)[:n]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_halo_gossip_training_grads_match(rng):
    """Gradients THROUGH the halo all_to_all == single-device gradients
    (the halo path trains, not just infers)."""
    from desco_tpu.batch.build import gossip_sample
    from desco_tpu.models.gossip import gossip_loss, init_gossip_model
    from desco_tpu.parallel.halo import halo_gossip_loss

    g = random_graph(rng, 36, 0.15)
    n = g.n_nodes
    q_n = 2
    counts = rng.random((n, q_n)).astype(np.float32)
    truth = rng.random((n, q_n)).astype(np.float32)
    s = gossip_sample(g, counts, truth)
    [b] = pack_samples([s], *auto_capacities([s], g_cap=1), n_queries=q_n)

    params = init_gossip_model(jax.random.PRNGKey(5), hidden_dim=8,
                               emb_channels=8)
    q_embs = jnp.asarray(rng.standard_normal((q_n, 8)), jnp.float32)
    ref_loss, ref_grads = jax.value_and_grad(gossip_loss)(params, b, q_embs)

    part = partition_typed_graph(
        n, s.node_type, counts, s.edge_src, s.edge_dst, s.edge_type,
        N_DEV, node_y=truth)
    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("graph"), P()),
             out_specs=(P(), P()))
    def lg(params, part, q):
        shard = jax.tree_util.tree_map(lambda a: a[0], part)
        return jax.value_and_grad(
            lambda p: halo_gossip_loss(p, shard, q))(params)

    with mesh:
        loss, grads = jax.jit(lg)(params, part, q_embs)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, r: np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-5),
        grads, ref_grads)


def test_halo_gossip_step_runs(rng):
    """One halo-sharded gossip train step updates params and returns a
    finite loss (the full step_fn wiring: shard_map + optimizer)."""
    import optax

    from desco_tpu.batch.build import gossip_sample
    from desco_tpu.models.gossip import init_gossip_model
    from desco_tpu.parallel.halo import halo_gossip_step_fn
    from desco_tpu.train.loop import make_adam

    g = random_graph(rng, 30, 0.2)
    n = g.n_nodes
    counts = rng.random((n, 2)).astype(np.float32)
    truth = rng.random((n, 2)).astype(np.float32)
    s = gossip_sample(g, counts, truth)
    part = partition_typed_graph(
        n, s.node_type, counts, s.edge_src, s.edge_dst, s.edge_type,
        N_DEV, node_y=truth)

    params = init_gossip_model(jax.random.PRNGKey(0), hidden_dim=8,
                               emb_channels=8)
    q_embs = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    tx = make_adam()
    opt_state = tx.init(params)
    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))
    step = halo_gossip_step_fn(tx, mesh)
    with mesh:
        new_params, opt_state, loss = jax.jit(step)(
            params, opt_state, part, q_embs, jnp.float32(1e-3))
    assert np.isfinite(float(loss))
    delta = jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + float(jnp.abs(leaf).sum()),
        jax.tree_util.tree_map(jnp.subtract, new_params, params), 0.0)
    assert delta > 0.0
