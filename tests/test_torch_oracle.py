"""Cross-framework allclose gate: SHMP forward/backward vs an
independent PyTorch oracle (SURVEY §7.2 step 4).

The oracle deliberately mirrors the REFERENCE formulation — per-edge-type
module clones driven by explicit gather/index_add loops, per-node-type
update linears selected by boolean masks (pyg.nn.to_hetero semantics,
ref gnn_model.py:115-277, lightning_model.py:371-421) — not this repo's
type-axis einsum design. Weights are shared bit-for-bit (converted to
f64 torch tensors); the oracle runs in float64, so any structural
divergence shows up far above f32 rounding noise.

Gradients cross-check torch autograd against jax.grad on the same
scalar loss: two independent AD systems over two independent
formulations of the same math.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from desco_tpu.batch.packed import auto_capacities, pack_samples
from desco_tpu.models.shmp_gnn import (
    apply_shmp,
    init_shmp,
    neighborhood_target_config,
)

from conftest import random_graph
from test_models import make_neigh_samples


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float64)


def torch_params(params):
    """f64 torch leaf copies of the JAX pytree (requires_grad for the
    backward gate)."""
    return jax.tree_util.tree_map(
        lambda a: _t(a).requires_grad_(True), params)


def _torch_gat_neigh(tp, cfg, batch, x, l):
    """Per-edge-type GATConv(heads=1) clone with PyG's default
    self-loop, per-destination softmax, outputs summed across types —
    computed with explicit per-node python loops (the most independent
    possible formulation)."""
    n_nodes = x.shape[0]
    src = np.asarray(batch.edge_src).astype(np.int64)
    dst = np.asarray(batch.edge_dst).astype(np.int64)
    etype = np.asarray(batch.edge_type).astype(np.int64)
    w_conv = tp["conv"][0][l]
    a_src, a_dst = tp["att"][0][l], tp["att"][1][l]
    out = torch.zeros_like(x)
    for t in range(cfg.n_edge_types):
        z = x @ w_conv[t]
        s_s = z @ a_src[t]
        s_d = z @ a_dst[t]
        sel = np.nonzero(etype == t)[0]
        by_dst = {}
        for e in sel:
            by_dst.setdefault(int(dst[e]), []).append(int(src[e]))
        for i in range(n_nodes):
            srcs = by_dst.get(i, []) + [i]  # self-loop candidate
            logits = torch.stack([
                torch.nn.functional.leaky_relu(s_s[j] + s_d[i], 0.2)
                for j in srcs])
            alpha = torch.softmax(logits, dim=0)
            out[i] = out[i] + sum(
                alpha[k] * z[j] for k, j in enumerate(srcs))
    return out


def torch_shmp_forward(tp, cfg, batch):
    """to_hetero-style oracle of apply_shmp: [G, out] f64."""
    n_t, t_e = cfg.n_node_types, cfg.n_edge_types
    ntype = torch.tensor(np.asarray(batch.node_type).astype(np.int64))
    nmask = _t(batch.node_mask)[:, None]
    src = np.asarray(batch.edge_src).astype(np.int64)
    dst = np.asarray(batch.edge_dst).astype(np.int64)
    etype = np.asarray(batch.edge_type).astype(np.int64)
    dst_t = np.asarray(cfg.edge_dst_type)

    # pre_mp: one Linear clone per node type
    x_in = _t(batch.x)
    w_pre, b_pre = tp["pre"]
    x = torch.zeros(x_in.shape[0], cfg.hidden_dim, dtype=torch.float64)
    for nt in range(n_t):
        rows = ntype == nt
        x[rows] = x_in[rows] @ w_pre[nt] + b_pre[nt]
    x = x * nmask

    emb = x
    for l in range(cfg.layer_num):
        w_conv, b_conv = tp["conv"][0][l], tp["conv"][1][l]
        if cfg.conv_type == "GAT":
            x_neigh = _torch_gat_neigh(tp, cfg, batch, x, l)
        else:
            x_neigh = torch.zeros_like(x)
            for t in range(t_e):
                sel = etype == t  # padding edges carry type >= t_e
                if not sel.any():
                    continue
                aggr = torch.zeros_like(x)
                aggr.index_add_(0, torch.tensor(dst[sel]), x[src[sel]])
                x_neigh = x_neigh + aggr @ w_conv[t]
        for t in range(t_e):
            # every edge-type clone contributes its bias to all nodes of
            # its dst node type (reference pads every sample to the full
            # edge-type set, workload.py:275-283)
            x_neigh = x_neigh + (ntype == dst_t[t])[:, None] * b_conv[t]

        if cfg.conv_type == "SAGE":
            upd_in = torch.cat([x_neigh, x], dim=-1)
            w_u, b_u = tp["upd"][0][l], tp["upd"][1][l]
            x2 = torch.zeros_like(x)
            for nt in range(n_t):
                rows = ntype == nt
                x2[rows] = upd_in[rows] @ w_u[nt] + b_u[nt]
            x = x2
        elif cfg.conv_type in ("GCN", "GAT"):
            x = x_neigh
        else:  # GIN, eps = 0
            upd_in = x_neigh + x
            h1 = torch.zeros_like(x)
            for nt in range(n_t):
                rows = ntype == nt
                h1[rows] = (upd_in[rows] @ tp["upd1"][0][l][nt]
                            + tp["upd1"][1][l][nt])
            h1 = torch.relu(h1)
            x2 = torch.zeros_like(x)
            for nt in range(n_t):
                rows = ntype == nt
                x2[rows] = (h1[rows] @ tp["upd2"][0][l][nt]
                            + tp["upd2"][1][l][nt])
            x = x2
        x = torch.relu(x) * nmask
        emb = torch.cat([emb, x], dim=-1)

    if cfg.use_anchor:
        aw, ab = tp["anchor"]
        anchored = torch.nn.functional.leaky_relu(emb @ aw + ab, 0.1)
        is_canon = (ntype == cfg.canonical_type)[:, None]
        emb = torch.where(is_canon, anchored, emb)

    emb = emb * nmask
    ngraph = np.asarray(batch.node_graph).astype(np.int64)
    valid = ngraph < batch.g_cap
    pooled = torch.zeros(batch.g_cap, emb.shape[1], dtype=torch.float64)
    pooled.index_add_(0, torch.tensor(ngraph[valid]), emb[valid])

    (w1, b1), (w2, b2), (w3, b3), (w4, b4) = tp["post"]
    h = torch.nn.functional.leaky_relu(pooled @ w1 + b1, 0.1)
    h = torch.relu(h @ w2 + b2)
    h = torch.relu(h @ w3 + b3)
    return h @ w4 + b4


@pytest.mark.parametrize("conv_type", ["SAGE", "GIN", "GCN", "GAT"])
def test_forward_matches_torch_oracle(rng, conv_type):
    samples = make_neigh_samples(rng, n_graphs=4)
    n_cap, e_cap, g_cap = auto_capacities(samples, g_cap=len(samples) + 1)
    [batch] = pack_samples(samples, n_cap, e_cap, g_cap, n_queries=3)

    cfg = neighborhood_target_config(
        use_tconv=True, hidden_dim=16, layer_num=3, conv_type=conv_type,
        output_dim=8)
    params = init_shmp(jax.random.PRNGKey(3), cfg)

    out_jax = np.asarray(apply_shmp(params, cfg, batch))
    with torch.no_grad():
        out_t = torch_shmp_forward(
            torch_params(params), cfg, batch).numpy()

    np.testing.assert_allclose(out_jax, out_t, rtol=2e-4, atol=1e-4)


def test_grads_match_torch_autograd(rng):
    samples = make_neigh_samples(rng, n_graphs=3)
    n_cap, e_cap, g_cap = auto_capacities(samples, g_cap=len(samples))
    [batch] = pack_samples(samples, n_cap, e_cap, g_cap, n_queries=3)

    cfg = neighborhood_target_config(
        use_tconv=True, hidden_dim=16, layer_num=2, conv_type="SAGE",
        output_dim=8)
    params = init_shmp(jax.random.PRNGKey(7), cfg)
    cot = np.asarray(
        jax.random.normal(jax.random.PRNGKey(11), (g_cap, 8)),
        dtype=np.float32)

    def loss_jax(p):
        return (apply_shmp(p, cfg, batch) * jnp.asarray(cot)).sum()

    g_jax = jax.grad(loss_jax)(params)

    tp = torch_params(params)
    loss_t = (torch_shmp_forward(tp, cfg, batch) * _t(cot)).sum()
    loss_t.backward()

    flat_j, _ = jax.tree_util.tree_flatten(g_jax)
    flat_t, _ = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(lambda t: t.grad.numpy(), tp))
    assert len(flat_j) == len(flat_t)
    for a, b in zip(flat_j, flat_t):
        scale = max(np.abs(np.asarray(b)).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            rtol=2e-4, atol=2e-4)
