"""Device layer: packed batches, SHMP core vs numpy to_hetero-style
oracle, model heads, gossip conv exactness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desco_tpu.batch.build import (
    gossip_sample,
    neighborhood_sample,
    query_sample,
)
from desco_tpu.batch.packed import GraphSample, auto_capacities, pack_samples
from desco_tpu.graph import (
    Graph,
    canonical_neighborhood,
    extract_all_neighborhoods,
    gen_queries,
    gen_query_ids,
)
from desco_tpu.models.gossip import (
    apply_gossip_single,
    gate_values,
    gossip_loss,
    gossip_predict,
    init_gossip_model,
)
from desco_tpu.models.neighborhood import (
    count_head,
    forward_counts,
    init_neighborhood_model,
    predict_counts,
    train_loss,
)
from desco_tpu.models.shmp_gnn import (
    apply_shmp,
    apply_shmp_core,
    init_shmp,
    neighborhood_target_config,
    query_config,
)

from conftest import random_graph


def make_neigh_samples(rng, n_graphs=6, qdim=3):
    graphs = [random_graph(rng, 12, 0.25) for _ in range(n_graphs)]
    neighs, index, ind = extract_all_neighborhoods(graphs, depth=3)
    return [
        neighborhood_sample(nb, use_tconv=True,
                            y=rng.random(qdim).astype(np.float32) * 5)
        for nb in neighs
    ]


# ------------------------------------------------------------------ packing
def test_pack_shapes_and_masks(rng):
    samples = make_neigh_samples(rng)
    n_cap, e_cap, g_cap = auto_capacities(samples, g_cap=16)
    batches = pack_samples(samples, n_cap, e_cap, g_cap, n_queries=3)
    assert all(b.x.shape == (n_cap, 1) for b in batches)
    tot_nodes = sum(int(b.node_mask.sum()) for b in batches)
    assert tot_nodes == sum(s.n_nodes for s in samples)
    tot_graphs = sum(int(b.graph_mask.sum()) for b in batches)
    assert tot_graphs == len(samples)
    from desco_tpu.batch.packed import PAD_EDGE_TYPE

    for b in batches:
        # padded edges point at the reserved pad node with sentinel type
        pad_e = np.nonzero(b.node_mask[b.edge_src] == 0)[0]
        assert np.all(b.edge_src[pad_e] == n_cap - 1)
        assert np.all(b.edge_dst[pad_e] == n_cap - 1)
        assert np.all(b.edge_type[pad_e] == PAD_EDGE_TYPE)
        # segment key (dst, type) is globally sorted incl. the pad tail
        key = b.edge_dst.astype(np.int64) * (PAD_EDGE_TYPE + 1) + b.edge_type
        assert np.all(np.diff(key) >= 0)
        # pad nodes pool into the extra segment
        assert np.all(b.node_graph[b.node_mask == 0] == g_cap)


# ---------------------------------------------------------- numpy oracle
def shmp_oracle(params, cfg, b, n_valid_nodes):
    """Independent to_hetero-style reference: loop per edge type, python
    dicts, no vectorized tricks."""
    p = jax.tree_util.tree_map(np.asarray, params)
    x_in = np.asarray(b.x)
    ntype = np.asarray(b.node_type)
    N = x_in.shape[0]
    # pre_mp per node type
    x = np.zeros((N, cfg.hidden_dim), np.float32)
    for i in range(n_valid_nodes):
        t = ntype[i]
        x[i] = x_in[i] @ p["pre"][0][t] + p["pre"][1][t]
    emb = x.copy()
    for l in range(cfg.layer_num):
        xn = np.zeros_like(x)
        for t in range(cfg.n_edge_types):
            agg = np.zeros_like(x)
            for e in range(len(b.edge_src)):
                if np.asarray(b.edge_type)[e] == t and np.asarray(b.node_mask)[b.edge_src[e]]:
                    agg[b.edge_dst[e]] += x[b.edge_src[e]]
            contrib = agg @ p["conv"][0][l][t]
            # bias only to nodes of the edge type's dst node type
            for i in range(n_valid_nodes):
                if ntype[i] == cfg.edge_dst_type[t]:
                    contrib[i] += p["conv"][1][l][t]
            xn[:n_valid_nodes] += contrib[:n_valid_nodes]
        new_x = np.zeros_like(x)
        for i in range(n_valid_nodes):
            t = ntype[i]
            cat = np.concatenate([xn[i], x[i]])
            new_x[i] = np.maximum(cat @ p["upd"][0][l][t] + p["upd"][1][l][t], 0)
        x = new_x
        emb = np.concatenate([emb, x], axis=1)
    return emb


@pytest.mark.parametrize("tconv", [True, False])
def test_shmp_core_vs_oracle(rng, tconv):
    cfg = neighborhood_target_config(use_tconv=tconv, layer_num=3,
                                     hidden_dim=8)
    g = random_graph(rng, 14, 0.3)
    nb = next(
        nb for v in range(13, 0, -1)
        if (nb := canonical_neighborhood(g, v, 3)) is not None
    )
    s = neighborhood_sample(nb, use_tconv=tconv)
    [b] = pack_samples([s], s.n_nodes + 2, 2 * s.n_edges + 4, 1)
    params = init_shmp(jax.random.PRNGKey(0), cfg)
    core = jax.jit(apply_shmp_core, static_argnums=1)
    ours = np.asarray(core(params, cfg, b))
    ref = shmp_oracle(params, cfg, b, s.n_nodes)
    np.testing.assert_allclose(ours[:s.n_nodes], ref[:s.n_nodes],
                               rtol=1e-4, atol=1e-5)
    # padded rows are exactly zero
    np.testing.assert_array_equal(ours[s.n_nodes:], 0.0)


def test_packing_order_invariance(rng):
    """Same samples, different packing order -> same per-graph outputs."""
    cfg = neighborhood_target_config(layer_num=2, hidden_dim=8,
                                     output_dim=4)
    samples = make_neigh_samples(rng, n_graphs=3)
    n_cap, e_cap, g_cap = auto_capacities(samples, g_cap=len(samples))
    params = init_shmp(jax.random.PRNGKey(1), cfg)

    [b1] = pack_samples(samples, n_cap, e_cap, g_cap, n_queries=3)
    perm = list(reversed(range(len(samples))))
    [b2] = pack_samples([samples[i] for i in perm], n_cap, e_cap, g_cap,
                        n_queries=3)
    fwd = jax.jit(apply_shmp, static_argnums=1)
    out1 = np.asarray(fwd(params, cfg, b1))
    out2 = np.asarray(fwd(params, cfg, b2))
    k = len(samples)
    np.testing.assert_allclose(out1[:k], out2[perm][:k], rtol=1e-4,
                               atol=1e-5)


def test_anchor_only_on_canonical(rng):
    """Anchor MLP applies to canonical nodes only: a query-config model
    (no canonical nodes) must be insensitive to anchor params."""
    cfg = query_config(layer_num=2, hidden_dim=8, output_dim=4)
    qs = [query_sample(q) for q in gen_queries(gen_query_ids([3, 4]))]
    n_cap, e_cap, g_cap = auto_capacities(qs, g_cap=len(qs))
    [b] = pack_samples(qs, n_cap, e_cap, g_cap)
    params = init_shmp(jax.random.PRNGKey(2), cfg)
    fwd = jax.jit(apply_shmp, static_argnums=1)
    out1 = np.asarray(fwd(params, cfg, b))
    params["anchor"] = jax.tree_util.tree_map(
        lambda a: a + 100.0, params["anchor"])
    out2 = np.asarray(fwd(params, cfg, b))
    np.testing.assert_array_equal(out1, out2)


# ------------------------------------------------------- neighborhood model
def test_neighborhood_model_end_to_end(rng):
    tgt_cfg = neighborhood_target_config(layer_num=2, hidden_dim=16,
                                         output_dim=16)
    qry_cfg = query_config(layer_num=2, hidden_dim=16, output_dim=16)
    queries = gen_queries(gen_query_ids([3]))
    qs = [query_sample(q) for q in queries]
    [qb] = pack_samples(qs, *auto_capacities(qs, g_cap=len(qs)))

    samples = make_neigh_samples(rng, qdim=2)
    n_cap, e_cap, g_cap = auto_capacities(samples, g_cap=len(samples))
    [b] = pack_samples(samples, n_cap, e_cap, g_cap, n_queries=2)

    params = init_neighborhood_model(jax.random.PRNGKey(0), tgt_cfg, qry_cfg)
    loss_fn = jax.jit(train_loss, static_argnums=(1, 2))
    loss = loss_fn(params, tgt_cfg, qry_cfg, b, qb)
    assert np.isfinite(float(loss))
    preds = jax.jit(predict_counts, static_argnums=(1, 2))(
        params, tgt_cfg, qry_cfg, b, qb)
    assert preds.shape == (g_cap, 2)
    # gradients flow to every tower
    grads = jax.jit(jax.grad(
        lambda p: train_loss(p, tgt_cfg, qry_cfg, b, qb)))(params)
    gnorm = jax.tree_util.tree_map(lambda g: float(jnp.abs(g).sum()), grads)
    assert gnorm["count1"][0] > 0
    assert gnorm["target"]["conv"][0] > 0
    assert gnorm["query"]["conv"][0] > 0


def test_count_head_matches_loop(rng):
    """Split-W1 broadcast equals the reference's per-query concat loop."""
    h = 8
    params = init_neighborhood_model(
        jax.random.PRNGKey(3),
        neighborhood_target_config(hidden_dim=h, output_dim=h, layer_num=1),
        query_config(hidden_dim=h, output_dim=h, layer_num=1),
    )
    emb_t = jnp.asarray(rng.standard_normal((5, h)), jnp.float32)
    emb_q = jnp.asarray(rng.standard_normal((3, h)), jnp.float32)
    fast = np.asarray(count_head(params, emb_t, emb_q))
    w1, b1 = params["count1"]
    w2, b2 = params["count2"]
    for qi in range(3):
        cat = jnp.concatenate(
            [emb_t, jnp.broadcast_to(emb_q[qi], emb_t.shape)], axis=1)
        ref = (jax.nn.leaky_relu(cat @ w1 + b1, negative_slope=0.01)
               @ w2 + b2)[:, 0]
        np.testing.assert_allclose(fast[:, qi], np.asarray(ref), rtol=1e-5,
                                   atol=1e-6)


# ---------------------------------------------------------------- gossip
def gossip_conv_oracle(conv, x, src, dst, etype, g, n_valid):
    """Per-edge linear-then-scale-then-sum (the reference formulation)."""
    wc, bc = np.asarray(conv["com"][0]), np.asarray(conv["com"][1])
    aggr = np.zeros((x.shape[0], wc.shape[1]), np.float32)
    for e in range(len(src)):
        if dst[e] >= n_valid:
            continue
        msg = x[src[e]] @ wc + bc
        scale = g if etype[e] == 0 else 1.0 - g
        aggr[dst[e]] += scale * msg
    return aggr


def test_gossip_aggregate_refactor_exact(rng):
    """linear-after-aggregate + degree-corrected bias == per-edge oracle."""
    g_graph = random_graph(rng, 10, 0.3)
    x_counts = rng.random((10, 2)).astype(np.float32)
    s = gossip_sample(g_graph, x_counts, x_counts)
    [b] = pack_samples([s], 16, 2 * s.n_edges + 8, 1, n_queries=2)
    params = init_gossip_model(jax.random.PRNGKey(0), hidden_dim=8,
                               emb_channels=8)
    q_emb = jnp.asarray(rng.standard_normal(8), jnp.float32)

    from desco_tpu.models.gossip import _gate
    from desco_tpu.ops.segment import typed_edge_aggregate

    conv = params["convs"][1]  # hidden->hidden layer (square shapes)
    gval = float(_gate(conv, q_emb))
    x = np.zeros((16, 8), np.float32)
    x[:10] = rng.standard_normal((10, 8)).astype(np.float32)

    ref = gossip_conv_oracle(conv, x, np.asarray(b.edge_src),
                             np.asarray(b.edge_dst),
                             np.asarray(b.edge_type), gval, 10)
    agg = typed_edge_aggregate(jnp.asarray(x), b.edge_src, b.edge_dst,
                               b.edge_type, 2)
    deg = typed_edge_aggregate(b.node_mask[:, None], b.edge_src, b.edge_dst,
                               b.edge_type, 2)[..., 0]
    wc, bc = conv["com"]
    ours = (gval * agg[:, 0] + (1 - gval) * agg[:, 1]) @ wc + bc * (
        gval * deg[:, 0] + (1 - gval) * deg[:, 1])[:, None]
    np.testing.assert_allclose(np.asarray(ours)[:10], ref[:10], rtol=1e-4,
                               atol=1e-5)


def test_gossip_loss_and_predict(rng):
    graphs = [random_graph(rng, 12, 0.25) for _ in range(3)]
    samples = [
        gossip_sample(g, rng.random((12, 4)).astype(np.float32),
                      rng.random((12, 4)).astype(np.float32))
        for g in graphs
    ]
    n_cap, e_cap, g_cap = auto_capacities(samples, g_cap=3)
    [b] = pack_samples(samples, n_cap, e_cap, g_cap, n_queries=4)
    params = init_gossip_model(jax.random.PRNGKey(1))
    q_embs = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)

    loss = jax.jit(gossip_loss)(params, b, q_embs)
    assert np.isfinite(float(loss))
    preds = jax.jit(gossip_predict)(params, b, q_embs)
    assert preds.shape == (n_cap, 4)

    gates = gate_values(params, q_embs)
    assert gates.shape == (2, 4)
    assert np.all((np.asarray(gates) > 0) & (np.asarray(gates) < 1))

    # pre_mp is detached (reference gnn_model.py:243): no gradient
    grads = jax.jit(jax.grad(lambda p: gossip_loss(p, b, q_embs)))(params)
    assert float(jnp.abs(grads["pre"][0]).sum()) == 0.0
    assert float(jnp.abs(grads["convs"][0]["com"][0]).sum()) > 0.0
    # gate gets gradient through the message scaling
    assert float(jnp.abs(grads["convs"][0]["gate"][0][0]).sum()) > 0.0


def test_typed_transform_aggregate_equivalence(rng):
    """Transform-first aggregation == aggregate-then-transform."""
    from desco_tpu.ops.segment import (
        typed_edge_aggregate,
        typed_transform_aggregate,
    )

    samples = make_neigh_samples(rng, n_graphs=3)
    n_cap, e_cap, g_cap = auto_capacities(samples, g_cap=len(samples))
    [b] = pack_samples(samples, n_cap, e_cap, g_cap, n_queries=3)
    x = jnp.asarray(rng.standard_normal((n_cap, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((6, 8, 8)), jnp.float32)

    agg = typed_edge_aggregate(x, b.edge_src, b.edge_dst, b.edge_type, 6)
    ref = jnp.einsum("nth,thk->nk", agg, w)
    got = typed_transform_aggregate(x, w, b.edge_src, b.edge_dst,
                                    b.edge_type, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_gat_conv_matches_numpy_softmax_oracle(rng):
    """Typed GAT aggregation (conv_type='GAT', gnn_model.py:222-224):
    per-(dst, edge-type) softmax attention with a self-loop candidate,
    checked against a direct numpy softmax per segment."""
    from desco_tpu.batch.build import neighborhood_sample
    from desco_tpu.graph import canonical_neighborhood
    from desco_tpu.models.shmp_gnn import (
        apply_shmp_core,
        init_shmp,
        neighborhood_target_config,
    )
    from desco_tpu.batch.packed import auto_capacities, pack_samples

    g = random_graph(rng, 20, 0.25)
    nb = canonical_neighborhood(g, g.n_nodes - 1, depth=10)
    s = neighborhood_sample(nb)
    cfg = neighborhood_target_config(layer_num=1, hidden_dim=8,
                                     conv_type="GAT")
    params = init_shmp(jax.random.PRNGKey(3), cfg)
    [b] = pack_samples([s], *auto_capacities([s], g_cap=1))
    out = np.asarray(apply_shmp_core(params, cfg, b))

    # ---- numpy oracle over raw (unpacked) edges
    n = b.x.shape[0]
    t_n = cfg.n_edge_types
    pre_w, pre_b = np.asarray(params["pre"][0]), np.asarray(params["pre"][1])
    ntype = np.asarray(b.node_type)
    nmask = np.asarray(b.node_mask)
    x = np.asarray(b.x, np.float32)
    h = np.stack([x[i] @ pre_w[ntype[i]] + pre_b[ntype[i]]
                  for i in range(n)]) * nmask[:, None]

    conv_w = np.asarray(params["conv"][0][0])   # [T, H, H]
    conv_b = np.asarray(params["conv"][1][0])   # [T, H]
    a_src = np.asarray(params["att"][0][0])     # [T, H]
    a_dst = np.asarray(params["att"][1][0])
    z = np.einsum("nh,thk->tnk", h, conv_w)
    lrelu = lambda v: np.where(v > 0, v, 0.2 * v)

    es = np.asarray(b.edge_src)
    ed = np.asarray(b.edge_dst)
    et = np.asarray(b.edge_type)
    live = et < t_n                              # pad edges excluded
    agg = np.zeros((n, h.shape[1]))
    for i in range(n):
        for t in range(t_n):
            sel = live & (ed == i) & (et == t)
            cand_z = [z[t, i]]                   # self loop
            cand_s = [lrelu(z[t, i] @ a_src[t] + z[t, i] @ a_dst[t])]
            for e in np.nonzero(sel)[0]:
                cand_z.append(z[t, es[e]])
                cand_s.append(lrelu(z[t, es[e]] @ a_src[t]
                                    + z[t, i] @ a_dst[t]))
            sarr = np.array(cand_s)
            p = np.exp(sarr - sarr.max())
            p /= p.sum()
            agg[i] += (p[:, None] * np.stack(cand_z)).sum(0)
    # per-dst-type conv bias, then x = relu(agg) with mask; concat skip
    dst_t = np.asarray(cfg.edge_dst_type)
    bias_by_nt = np.zeros((cfg.n_node_types, h.shape[1]))
    for t in range(t_n):
        bias_by_nt[dst_t[t]] += conv_b[t]
    x1 = np.maximum(agg + bias_by_nt[ntype], 0.0) * nmask[:, None]
    ref = np.concatenate([h, x1], axis=-1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("conv", ["SAGE", "GIN", "GCN", "GAT", "PNA"])
def test_conv_variants_grad_smoke(rng, conv):
    """Every conv variant runs forward + backward with finite,
    not-all-zero gradients (the full flag surface of
    gnn_model.py:213-227, minus the upstream-dead PNACONV wiring)."""
    from desco_tpu.models.shmp_gnn import (
        apply_shmp,
        init_shmp,
        neighborhood_target_config,
    )
    from desco_tpu.batch.packed import auto_capacities, pack_samples

    samples = make_neigh_samples(rng, n_graphs=3)
    n_cap, e_cap, g_cap = auto_capacities(samples, g_cap=len(samples))
    [b] = pack_samples(samples, n_cap, e_cap, g_cap, n_queries=3)
    cfg = neighborhood_target_config(layer_num=2, hidden_dim=8,
                                     output_dim=4, conv_type=conv)
    params = init_shmp(jax.random.PRNGKey(11), cfg)

    def loss(p):
        return jnp.sum(apply_shmp(p, cfg, b) ** 2)

    grads = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_pna_conv_matches_numpy_oracle(rng):
    """Typed PNA aggregation (conv_type='PNA'): per-(dst, edge-type)
    mean/min/max/std of transformed sources, degree scalers
    {1, log(d+1)/delta, delta/log(d+1)}, per-type mixer, types summed —
    checked against a direct numpy per-segment re-derivation. (The
    reference constructs pyg PNAConv, gnn_model.py:155-171, but its
    layer-update switch 263-271 NotImplementedErrors on it.)"""
    from desco_tpu.batch.build import neighborhood_sample
    from desco_tpu.graph import canonical_neighborhood
    from desco_tpu.models.shmp_gnn import (
        apply_shmp_core,
        init_shmp,
        neighborhood_target_config,
    )
    from desco_tpu.batch.packed import auto_capacities, pack_samples

    g = random_graph(rng, 20, 0.25)
    nb = canonical_neighborhood(g, g.n_nodes - 1, depth=10)
    s = neighborhood_sample(nb)
    cfg = neighborhood_target_config(layer_num=1, hidden_dim=8,
                                     conv_type="PNA")
    params = init_shmp(jax.random.PRNGKey(5), cfg)
    [b] = pack_samples([s], *auto_capacities([s], g_cap=1))
    out = np.asarray(apply_shmp_core(params, cfg, b))

    # ---- numpy oracle
    n = b.x.shape[0]
    t_n = cfg.n_edge_types
    hd = cfg.hidden_dim
    pre_w, pre_b = np.asarray(params["pre"][0]), np.asarray(params["pre"][1])
    ntype = np.asarray(b.node_type)
    nmask = np.asarray(b.node_mask)
    x = np.asarray(b.x, np.float32)
    h = np.stack([x[i] @ pre_w[ntype[i]] + pre_b[ntype[i]]
                  for i in range(n)]) * nmask[:, None]

    conv_w = np.asarray(params["conv"][0][0])   # [T, H, H]
    conv_b = np.asarray(params["conv"][1][0])
    mix_w = np.asarray(params["pna_mix"][0])    # [T, 12H, H]
    z = np.einsum("nh,thk->tnk", h, conv_w)

    es, ed, et = (np.asarray(b.edge_src), np.asarray(b.edge_dst),
                  np.asarray(b.edge_type))
    live = et < t_n
    # delta over valid nodes from total live in-degree
    d_tot = np.zeros(n)
    for e in np.nonzero(live)[0]:
        d_tot[ed[e]] += 1
    delta = (np.log(np.maximum(d_tot, 1.0) + 1.0) * nmask).sum() / nmask.sum()

    agg = np.zeros((n, hd))
    for i in range(n):
        for t in range(t_n):
            sel = live & (ed == i) & (et == t)
            zs = z[t, es[sel]]                  # [d, H]
            d = max(len(zs), 1)
            if len(zs):
                feats = np.concatenate([zs.mean(0), zs.min(0), zs.max(0),
                                        zs.std(0)])
            else:
                feats = np.zeros(4 * hd)
            logd = np.log(d + 1.0)
            scaled = np.concatenate(
                [feats, feats * (logd / delta), feats * (delta / logd)])
            agg[i] += scaled @ mix_w[t]
    dst_t = np.asarray(cfg.edge_dst_type)
    bias_by_nt = np.zeros((cfg.n_node_types, hd))
    for t in range(t_n):
        bias_by_nt[dst_t[t]] += conv_b[t]
    x1 = np.maximum(agg + bias_by_nt[ntype], 0.0) * nmask[:, None]
    ref = np.concatenate([h, x1], axis=-1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_bf16_tower_parity(rng):
    """cfg.dtype=bfloat16 runs the whole target tower in bf16 (the TPU
    serving fast path); predictions must track the f32 tower within bf16
    mantissa error in log2-count space."""
    import dataclasses

    tgt_cfg = neighborhood_target_config(layer_num=4, hidden_dim=16,
                                         output_dim=16)
    qry_cfg = query_config(layer_num=2, hidden_dim=16, output_dim=16)
    qs = [query_sample(q) for q in gen_queries(gen_query_ids([3]))]
    [qb] = pack_samples(qs, *auto_capacities(qs, g_cap=len(qs)))
    samples = make_neigh_samples(rng, qdim=2)
    [b] = pack_samples(samples, *auto_capacities(samples, g_cap=len(samples)),
                       n_queries=2)
    params = init_neighborhood_model(jax.random.PRNGKey(0), tgt_cfg, qry_cfg)

    from desco_tpu.models.neighborhood import forward_counts

    p32 = np.asarray(forward_counts(params, tgt_cfg, qry_cfg, b, qb))
    cfg_bf = dataclasses.replace(tgt_cfg, dtype=jnp.bfloat16)
    pbf = np.asarray(forward_counts(params, cfg_bf, qry_cfg, b, qb))
    m = np.asarray(b.graph_mask) > 0
    assert pbf.dtype == np.float32  # head stays f32
    np.testing.assert_allclose(pbf[m], p32[m], atol=0.05)
