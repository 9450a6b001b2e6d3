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
    halo_shmp_core,
    halo_typed_aggregate,
    partition_node_values,
    partition_typed_graph,
    unpartition_nodes,
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
        n, s.node_type, x, s.edge_src, s.edge_dst, s.edge_type, N_DEV,
        n_types=6)

    # single-device reference
    ref = np.asarray(typed_edge_aggregate(
        jnp.asarray(x), jnp.asarray(s.edge_src), jnp.asarray(s.edge_dst),
        jnp.asarray(s.edge_type), 6))  # [n, 6, 8]

    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))

    @partial(jax.shard_map, mesh=mesh, in_specs=P("graph"),
             out_specs=P("graph"))
    def run(shard):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        agg = halo_typed_aggregate(shard.x, shard)
        return agg[None]  # [1, n_loc, 6, 8] per device

    with mesh:
        out = jax.jit(run)(part)  # [D, n_loc, 6, 8]
    got = unpartition_nodes(part, np.asarray(out))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_halo_shmp_core_matches_single_device(rng):
    s, _ = big_typed_graph(rng, n=40)
    n = s.n_nodes
    cfg = neighborhood_target_config(layer_num=3, hidden_dim=8)
    params = init_shmp(jax.random.PRNGKey(0), cfg)

    # single-device reference through the packed path
    [b] = pack_samples([s], *auto_capacities([s], g_cap=1))
    ref = np.asarray(apply_shmp_core(params, cfg, b))[:n]

    part = partition_typed_graph(
        n, s.node_type, s.x, s.edge_src, s.edge_dst, s.edge_type, N_DEV,
        n_types=cfg.n_edge_types)
    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("graph")),
             out_specs=P("graph"))
    def run(params, shard):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        return halo_shmp_core(params, cfg, shard)[None]

    with mesh:
        out = np.asarray(jax.jit(run)(params, part))  # [D, n_loc, P]
    got = unpartition_nodes(part, out)
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
        n, s.node_type, s.x, s.edge_src, s.edge_dst, s.edge_type, N_DEV,
        n_types=2)
    # shard the count column like the nodes
    xcol = partition_node_values(part, x_counts)[:, :, 0]

    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("graph"), P("graph"), P()),
             out_specs=P("graph"))
    def run(params, shard, xc, q):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        return halo_gossip_single(params, shard, xc[0], q)[None]

    with mesh:
        out = np.asarray(jax.jit(run)(params, part, xcol, q_emb))
    got = unpartition_nodes(part, out)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("conv", ["GIN", "GCN", "PNA"])
def test_halo_shmp_core_gin_gcn_match(rng, conv):
    """The shared layer body gives the halo path GIN/GCN for free; PNA
    rides the force_pull treatment (per-(dst,type) statistics local at
    the dst owner, psum'd global delta)."""
    s, _ = big_typed_graph(rng, n=40)
    n = s.n_nodes
    cfg = neighborhood_target_config(layer_num=2, hidden_dim=8,
                                     conv_type=conv)
    params = init_shmp(jax.random.PRNGKey(2), cfg)
    [b] = pack_samples([s], *auto_capacities([s], g_cap=1))
    ref = np.asarray(apply_shmp_core(params, cfg, b))[:n]

    part = partition_typed_graph(
        n, s.node_type, s.x, s.edge_src, s.edge_dst, s.edge_type, N_DEV,
        n_types=cfg.n_edge_types, force_pull=conv == "PNA")
    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("graph")),
             out_specs=P("graph"))
    def run(params, shard):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        return halo_shmp_core(params, cfg, shard)[None]

    with mesh:
        out = np.asarray(jax.jit(run)(params, part))
    got = unpartition_nodes(part, out)
    # PNA's variance term has mild cancellation noise under the split-
    # stream summation order; absolute agreement stays at float eps
    np.testing.assert_allclose(got, ref, rtol=1e-4,
                               atol=1e-4 if conv == "PNA" else 1e-5)


def test_halo_gat_matches_single_device(rng):
    """GAT over a force_pull halo partition == packed single-device GAT
    (the per-(dst,type) softmax is local once pulled sources arrive)."""
    s, _ = big_typed_graph(rng, n=40)
    n = s.n_nodes
    cfg = neighborhood_target_config(layer_num=2, hidden_dim=8,
                                     conv_type="GAT")
    params = init_shmp(jax.random.PRNGKey(3), cfg)
    [b] = pack_samples([s], *auto_capacities([s], g_cap=1))
    ref = np.asarray(apply_shmp_core(params, cfg, b))[:n]

    part = partition_typed_graph(
        n, s.node_type, s.x, s.edge_src, s.edge_dst, s.edge_type, N_DEV,
        n_types=cfg.n_edge_types, force_pull=True)
    assert part.p_max == 0
    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("graph")),
             out_specs=P("graph"))
    def run(params, shard):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        return halo_shmp_core(params, cfg, shard)[None]

    with mesh:
        out = np.asarray(jax.jit(run)(params, part))
    got = unpartition_nodes(part, out)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_halo_gat_rejects_push_partition(rng):
    """A partition with push pairs must be rejected for GAT with the
    informative error (softmax does not commute with push partials)."""
    n = 64
    hub = n - 1
    src = np.concatenate([np.arange(n - 1), np.full(n - 2, hub)])
    dst = np.concatenate([np.full(n - 1, hub), np.arange(1, n - 1)])
    ety = np.concatenate([np.zeros(n - 1, np.int32),
                          np.ones(n - 2, np.int32)])
    x = rng.standard_normal((n, 8)).astype(np.float32)
    part = partition_typed_graph(
        n, np.zeros(n, np.int32), x, src.astype(np.int32),
        dst.astype(np.int32), ety, N_DEV, n_types=2)
    assert part.p_max > 0
    from desco_tpu.parallel.halo import halo_gat_aggregator

    from desco_tpu.models.shmp_gnn import SHMPConfig

    cfg = SHMPConfig(n_node_types=1, n_edge_types=2, edge_dst_type=(0, 0),
                     conv_type="GAT", hidden_dim=8, layer_num=1)
    params = init_shmp(jax.random.PRNGKey(0), cfg)
    shard = jax.tree_util.tree_map(lambda a: np.asarray(a)[0], part)
    with pytest.raises(AssertionError, match="force_pull"):
        halo_gat_aggregator(cfg, shard, params["att"])


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
        N_DEV, node_y=truth, n_types=2)
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
        N_DEV, node_y=truth, n_types=2)

    params = init_gossip_model(jax.random.PRNGKey(0), hidden_dim=8,
                               emb_channels=8)
    q_embs = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    tx = make_adam()
    opt_state = tx.init(params)
    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))
    step = halo_gossip_step_fn(tx, mesh)
    with mesh:
        new_params, opt_state, loss = jax.jit(step)(
            params, opt_state, part, q_embs, jnp.float32(1e-3),
            jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    delta = jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + float(jnp.abs(leaf).sum()),
        jax.tree_util.tree_map(jnp.subtract, new_params, params), 0.0)
    assert delta > 0.0


def test_push_mode_hub_graph_matches(rng):
    """A star-like hub graph forces PUSH pairs (unique (dst,type) cells
    << unique sources): the hybrid plan must still reproduce the
    single-device aggregation exactly, with p_max > 0 actually used."""
    n = 64
    hub = n - 1
    src = np.concatenate([np.arange(n - 1), np.full(n - 2, hub)])
    dst = np.concatenate([np.full(n - 1, hub), np.arange(1, n - 1)])
    ety = np.concatenate([np.zeros(n - 1, np.int32),
                          np.ones(n - 2, np.int32)])
    ntype = np.zeros(n, np.int32)
    x = rng.standard_normal((n, 8)).astype(np.float32)

    part = partition_typed_graph(
        n, ntype, x, src.astype(np.int32), dst.astype(np.int32), ety,
        N_DEV, n_types=2)
    assert part.p_max > 0, "hub graph should trigger push mode"

    ref = np.asarray(typed_edge_aggregate(
        jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(ety), 2))

    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))

    @partial(jax.shard_map, mesh=mesh, in_specs=P("graph"),
             out_specs=P("graph"))
    def run(shard):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        return halo_typed_aggregate(shard.x, shard)[None]

    with mesh:
        out = jax.jit(run)(part)
    got = unpartition_nodes(part, np.asarray(out))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_locality_order_recovers_communities(rng):
    """metis-lite ordering on a permuted 4-community graph: the D=4 cut
    must come back near the planted 2% inter-community fraction (plain
    id order on the permuted graph cuts ~75%)."""
    from desco_tpu.parallel.halo import locality_order

    n, k = 2000, 4
    per = n // k
    edges = set()
    r = np.random.default_rng(7)
    while len(edges) < 8000:
        c = r.integers(k)
        u, v = c * per + r.integers(0, per, 2)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    while len(edges) < 8160:
        u, v = r.integers(0, n, 2)
        if u != v and u // per != v // per:
            edges.add((min(u, v), max(u, v)))
    e = np.array(sorted(edges), np.int64)
    perm = r.permutation(n)
    src, dst = perm[e[:, 0]], perm[e[:, 1]]

    order = locality_order(n, src, dst, method="metis")
    assert sorted(order) == list(range(n))
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    ps, pd = inv[src], inv[dst]
    cut = ((ps // per) != (pd // per)).mean()
    assert cut < 0.15, f"metis-lite cut {cut:.3f} (planted 0.02)"


def test_drop_cross_control_keeps_only_intra(rng):
    """drop_cross=True builds the zero-communication control: no pull
    slots, no push slots, intra edges only."""
    s, _ = big_typed_graph(rng)
    n = s.n_nodes
    part = partition_typed_graph(
        n, s.node_type, s.x, s.edge_src, s.edge_dst, s.edge_type, N_DEV,
        n_types=6, drop_cross=True)
    assert part.send_mask.sum() == 0
    assert part.p_max == 0


def test_overlap_check_proves_stream_independence(rng):
    """The jaxpr taint walk (parallel/overlap_check.py) must PROVE the
    interior stream of each layer has no data dependence on that layer's
    pull all_to_all (and boundary none on the push) — the checkable form
    of the halo-overlap claim — and must CATCH a deliberately serialized
    variant."""
    from desco_tpu.parallel.halo import halo_exchange, _halo_segment_sum
    from desco_tpu.parallel.overlap_check import check_halo_overlap

    s, _ = big_typed_graph(rng)
    n = s.n_nodes
    cfg = neighborhood_target_config(layer_num=3, hidden_dim=8,
                                     output_dim=8)
    params = init_shmp(jax.random.PRNGKey(0), cfg)
    part = partition_typed_graph(
        n, s.node_type, s.x, s.edge_src, s.edge_dst, s.edge_type, N_DEV,
        n_types=6)
    mesh = jax.sharding.Mesh(make_mesh(N_DEV).devices, ("graph",))

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("graph")),
             out_specs=P("graph"))
    def fwd(p, shard):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        return halo_shmp_core(p, cfg, shard)[None]

    rep = check_halo_overlap(fwd, params, part)
    assert rep.ok, rep.summary()
    assert rep.pull_layers == {0, 1, 2}
    assert rep.interior_layers == {0, 1, 2}

    # negative control: interior stream made to CONSUME the pull result
    @partial(jax.shard_map, mesh=mesh, in_specs=P("graph"),
             out_specs=P("graph"))
    def bad(shard):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        x = shard.x
        with jax.named_scope("halo_pull_L0"):
            halo = halo_exchange(x, shard.send_idx, shard.send_mask,
                                 "graph")
        with jax.named_scope("halo_interior_L0"):
            # serialized: local messages blocked on the exchange
            msgs = jnp.take(x, shard.edge_src_int, axis=0)
            msgs = msgs + halo.sum() * 0.0
            out = _halo_segment_sum(
                msgs, shard.edge_seg_int,
                shard.node_mask.shape[0] * 6 + N_DEV * shard.p_max)
        return out[None]

    rep_bad = check_halo_overlap(bad, part)
    assert not rep_bad.ok
    assert any("interior_L0 depends on pull_L0" in v[0]
               for v in rep_bad.violations), rep_bad.summary()
