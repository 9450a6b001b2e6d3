"""Data parallelism on the 8-virtual-device CPU mesh: DP training steps
must match the single-device step on the concatenated batch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desco_tpu.batch.build import gossip_sample, neighborhood_sample, query_sample
from desco_tpu.batch.packed import auto_capacities, pack_samples, stack_batches
from desco_tpu.graph import extract_all_neighborhoods, gen_queries, gen_query_ids
from desco_tpu.models import gossip as gossip_mod
from desco_tpu.models import neighborhood as neigh_mod
from desco_tpu.models.shmp_gnn import neighborhood_target_config, query_config
from desco_tpu.parallel.dp import (
    dp_step_fn,
    make_mesh,
    pad_batches_to_multiple,
    reshape_for_dp,
)
from desco_tpu.train.loop import (
    gossip_loss_and_grads,
    gossip_loss_fn,
    make_adam,
    neighborhood_loss_and_grads,
    neighborhood_loss_fn,
    neighborhood_step_fn,
)

from conftest import random_graph

N_DEV = 4


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    graphs = [random_graph(rng, 12, 0.25) for _ in range(8)]
    qids = gen_query_ids([3])
    queries = gen_queries(qids)
    neighs, _, _ = extract_all_neighborhoods(graphs, depth=3)
    samples = [
        neighborhood_sample(nb, y=rng.random(2).astype(np.float32) * 3)
        for nb in neighs
    ]
    qs = [query_sample(q) for q in queries]
    [qb] = pack_samples(qs, *auto_capacities(qs, g_cap=len(qs)))
    tgt_cfg = neighborhood_target_config(layer_num=2, hidden_dim=8,
                                         output_dim=8)
    qry_cfg = query_config(layer_num=2, hidden_dim=8, output_dim=8)
    params = neigh_mod.init_neighborhood_model(jax.random.PRNGKey(0),
                                               tgt_cfg, qry_cfg)
    return graphs, samples, qb, tgt_cfg, qry_cfg, params, rng


def test_dp_matches_single_device(setup):
    graphs, samples, qb, tgt_cfg, qry_cfg, params, rng = setup
    mesh = make_mesh(N_DEV)
    caps = auto_capacities(samples, g_cap=6)
    batches = pack_samples(samples, *caps, n_queries=2)
    batches = pad_batches_to_multiple(batches, N_DEV)[:N_DEV]
    stacked = reshape_for_dp(stack_batches(batches), N_DEV)
    one_group = jax.tree_util.tree_map(lambda x: x[0], stacked)

    # plain SGD: first-step Adam is ~sign(g), numerically ill-conditioned
    # for parity checks; SGD makes param deltas linear in the gradients
    import optax

    tx = optax.chain(optax.scale(-1.0))
    opt0 = tx.init(params)
    dp_step = dp_step_fn(
        neighborhood_loss_fn(tgt_cfg, qry_cfg, qb), tx, mesh,
        weight_kind="graphs")
    with mesh:
        p_dp, _, loss_dp = jax.jit(dp_step)(
            params, opt0, one_group, jnp.float32(1e-3),
            jax.random.PRNGKey(0))

    # single-device reference: weighted mean of per-batch losses/grads
    lg = neighborhood_loss_and_grads(tgt_cfg, qry_cfg, qb)
    tot_w, tot_loss = 0.0, 0.0
    gsum = None
    for b in batches:
        loss, grads = lg(params, b, None)
        w = float(np.asarray(b.graph_mask).sum())
        tot_w += w
        tot_loss += float(loss) * w
        scaled = jax.tree_util.tree_map(lambda g: np.asarray(g) * w, grads)
        gsum = scaled if gsum is None else jax.tree_util.tree_map(
            np.add, gsum, scaled)
    ref_loss = tot_loss / tot_w
    np.testing.assert_allclose(float(loss_dp), ref_loss, rtol=1e-5)

    grads_ref = jax.tree_util.tree_map(lambda g: g / tot_w, gsum)
    updates, _ = tx.update(grads_ref, tx.init(params), params)
    updates = jax.tree_util.tree_map(lambda u: u * 1e-3, updates)
    p_ref = optax.apply_updates(params, updates)
    for a, b_ in zip(jax.tree_util.tree_leaves(p_dp),
                     jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


def test_gossip_dp_runs(setup):
    graphs, samples, qb, tgt_cfg, qry_cfg, params, rng = setup
    mesh = make_mesh(N_DEV)
    n_q = 2
    gsamples = [
        gossip_sample(g, rng.random((g.n_nodes, n_q)).astype(np.float32),
                      rng.random((g.n_nodes, n_q)).astype(np.float32))
        for g in graphs
    ]
    caps = auto_capacities(gsamples, g_cap=2)
    batches = pack_samples(gsamples, *caps, n_queries=n_q)
    batches = pad_batches_to_multiple(batches, N_DEV)[:N_DEV]
    stacked = reshape_for_dp(stack_batches(batches), N_DEV)

    query_embs = jnp.asarray(rng.standard_normal((n_q, 16)), jnp.float32)
    gparams = gossip_mod.init_gossip_model(jax.random.PRNGKey(2),
                                           hidden_dim=16, emb_channels=16)
    tx = make_adam()
    step = dp_step_fn(gossip_loss_fn(0.0, query_embs), tx, mesh,
                      weight_kind="sum")
    with mesh:
        p2, _, loss = jax.jit(step)(
            gparams, tx.init(gparams),
            jax.tree_util.tree_map(lambda x: x[0], stacked),
            jnp.float32(1e-3), jax.random.PRNGKey(3))
    # sum semantics: DP loss equals the sum of per-batch losses
    ref = sum(float(gossip_mod.gossip_loss(gparams, b, query_embs))
              for b in batches)
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dp_predict_matches_single_device(setup):
    """DP serving: dp_predict_neighborhood_counts == the single-device
    predict path exactly (same math, batches just land on different
    devices; includes a padded tail group)."""
    from desco_tpu.parallel.dp import dp_predict_neighborhood_counts
    from desco_tpu.train.loop import predict_neighborhood_counts

    graphs, samples, qb, tgt_cfg, qry_cfg, params, rng = setup
    caps = auto_capacities(samples, g_cap=6)
    batches = pack_samples(samples, *caps, n_queries=2)
    assert len(batches) % N_DEV != 0  # exercises the padded tail
    single = predict_neighborhood_counts(params, tgt_cfg, qry_cfg, qb,
                                         batches)
    mesh = make_mesh(N_DEV)
    dp = dp_predict_neighborhood_counts(params, tgt_cfg, qry_cfg, qb,
                                        batches, mesh)
    np.testing.assert_array_equal(dp, single)


def test_dp_gossip_predict_matches_single_device(setup):
    """DP gossip serving == single-device predict_gossip_counts."""
    from desco_tpu.parallel.dp import dp_predict_gossip_counts
    from desco_tpu.train.loop import predict_gossip_counts

    graphs, samples, qb, tgt_cfg, qry_cfg, params, rng = setup
    gsamples = [
        gossip_sample(g, rng.random((g.n_nodes, 2)).astype(np.float32),
                      rng.random((g.n_nodes, 2)).astype(np.float32))
        for g in graphs
    ]
    caps = auto_capacities(gsamples, g_cap=2)
    batches = pack_samples(gsamples, *caps, n_queries=2)
    gparams = gossip_mod.init_gossip_model(
        jax.random.PRNGKey(2), input_dim=1, hidden_dim=8, emb_channels=8,
        layer_num=2)
    query_embs = jnp.asarray(rng.random((2, 8)).astype(np.float32))
    single = predict_gossip_counts(gparams, query_embs, batches)
    dp = dp_predict_gossip_counts(gparams, query_embs, batches,
                                  make_mesh(N_DEV))
    np.testing.assert_array_equal(dp, single)
