"""Gossip propagation model (stage 3 of DeSCo).

TPU-native rebuild of ``GossipCountingModel`` + ``GossipConv``
(/root/reference/subgraph_counting/lightning_model.py:535-649,
gnn_model.py:280-359). A 2-layer gated GNN runs on the *original* graph;
node features are stage-1 predicted counts for one query; the model
outputs a per-node residual correction.

Reference semantics replicated exactly:
  * pre_mp(x) is concatenated with the broadcast query embedding and the
    result is DETACHED (lightning_model.py / gnn_model.py:243 ``.clone()
    .detach()``) — pre_mp receives no gradient.
  * gate g = sigmoid-MLP(query_emb) ∈ (0,1); messages on forward edges
    (src < dst) scale by g, reverse edges by 1 - g
    (gnn_model.py:335-344). Per-edge linear-then-scale-then-sum is
    refactored to aggregate-then-linear with an exact per-direction
    degree correction for the bias term.
  * update = Linear(cat(aggr, x)); relu; dropout; concat-skip; per-node
    post-MLP -> scalar residual.
  * loss = sum over nodes and queries of log2(|gossip + neigh - truth| + 1)
    (lightning_model.py:630-635; note: SUM, not mean).

The reference's python loop over queries (lightning_model.py:591) becomes
``lax.scan`` with rematerialization so activation memory stays
one-query-sized.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ..batch.packed import PackedGraphs
from ..ops.segment import typed_edge_aggregate
from .init import linear_params, mlp_params
from .shmp_gnn import _dropout


def init_gossip_model(key, input_dim: int = 1, hidden_dim: int = 64,
                      emb_channels: int = 64, layer_num: int = 2):
    ks = jax.random.split(key, 4 + layer_num)
    pre_out = hidden_dim
    d_in0 = pre_out + emb_channels  # concat(query_emb, pre(x))
    convs = []
    for l in range(layer_num):
        kl = jax.random.split(ks[4 + l], 3)
        d_in = d_in0 if l == 0 else hidden_dim
        convs.append({
            "com": linear_params(kl[0], d_in, hidden_dim),
            "upd": linear_params(kl[1], hidden_dim + d_in, hidden_dim),
            "gate": mlp_params(kl[2], [emb_channels, hidden_dim, 1]),
        })
    post_in = hidden_dim * layer_num + d_in0
    return {
        "pre": linear_params(ks[0], input_dim, pre_out),
        "convs": convs,
        "post": mlp_params(ks[1], [post_in, hidden_dim, hidden_dim, 256, 1]),
    }


def _gate(conv_params, query_emb: jnp.ndarray) -> jnp.ndarray:
    """lin_gate: Linear -> sigmoid -> Linear -> sigmoid -> LeakyReLU
    (gnn_model.py:296-303); output scalar in (0,1)."""
    (w1, b1), (w2, b2) = conv_params["gate"]
    h = jax.nn.sigmoid(query_emb @ w1 + b1)
    g = jax.nn.sigmoid(h @ w2 + b2)
    return jax.nn.leaky_relu(g)[0]  # scalar


def gate_values(params, query_embs: jnp.ndarray) -> jnp.ndarray:
    """(layers, n_queries) gate table — the paper's homophily/antisymmetry
    analysis output (lightning_model.py:640-649, main.py:432-439)."""
    out = []
    for conv in params["convs"]:
        out.append(jax.vmap(lambda q: _gate(conv, q))(query_embs))
    return jnp.stack(out, axis=0)


def apply_gossip_single(
    params, batch: PackedGraphs, x_col: jnp.ndarray, query_emb: jnp.ndarray,
    dropout: float = 0.0, train: bool = False, rng=None,
) -> jnp.ndarray:
    """Per-node residual [N] for ONE query.

    x_col: [N] stage-1 counts for this query; query_emb: [H_emb].
    """
    nmask = batch.node_mask[:, None]
    w_pre, b_pre = params["pre"]
    x = x_col[:, None] @ w_pre + b_pre
    qe = jnp.broadcast_to(query_emb[None, :], (x.shape[0], query_emb.shape[0]))
    x = jax.lax.stop_gradient(jnp.concatenate([qe, x], axis=-1))
    x = x * nmask
    emb = x

    # per-direction in-degrees (for the exact bias term of
    # linear-before-aggregate); pad edges contribute 0 via the mask column
    deg = typed_edge_aggregate(
        batch.node_mask[:, None], batch.edge_src, batch.edge_dst,
        batch.edge_type, 2)[..., 0]  # [N, 2]

    for conv in params["convs"]:
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        g = _gate(conv, query_emb)
        wc, bc = conv["com"]
        agg = typed_edge_aggregate(
            x, batch.edge_src, batch.edge_dst, batch.edge_type, 2)  # [N,2,D]
        mixed = g * agg[:, 0] + (1.0 - g) * agg[:, 1]
        wdeg = (g * deg[:, 0] + (1.0 - g) * deg[:, 1])[:, None]
        aggr = mixed @ wc + bc * wdeg
        wu, bu = conv["upd"]
        x = jnp.concatenate([aggr, x], axis=-1) @ wu + bu
        x = jax.nn.relu(x)
        x = _dropout(x, dropout, sub, train)
        x = x * nmask
        emb = jnp.concatenate([emb, x], axis=-1)

    # per-node post MLP (baseline='gossip' path: no pooling, no anchor)
    (w1, b1), (w2, b2), (w3, b3), (w4, b4) = params["post"]
    h = emb @ w1 + b1
    if rng is not None:
        rng, sub = jax.random.split(rng)
        h = _dropout(h, dropout, sub, train)
    h = jax.nn.leaky_relu(h, negative_slope=0.1)
    h = jax.nn.relu(h @ w2 + b2)
    h = jax.nn.relu(h @ w3 + b3)
    out = (h @ w4 + b4)[:, 0]
    return out * batch.node_mask


def gossip_loss(params, batch: PackedGraphs, query_embs: jnp.ndarray,
                dropout: float = 0.0, train: bool = False, rng=None):
    """Sum over queries and nodes of log2(|gossip + neigh - truth| + 1).

    batch.x: [N, Q] stage-1 counts; batch.node_y: [N, Q] truth.
    """
    n_q = query_embs.shape[0]
    rngs = (jax.random.split(rng, n_q) if rng is not None
            else jnp.zeros((n_q, 2), dtype=jnp.uint32))

    # carry-free scan (a scalar accumulator carry changes "varying axis"
    # type under shard_map in JAX >= 0.9; stacked outputs don't)
    def one_query(_, inp):
        q_emb, x_col, y_col, r = inp
        r = r if rng is not None else None
        gossip = apply_gossip_single(
            params, batch, x_col, q_emb, dropout, train, r)
        pred = gossip + x_col
        loss = jnp.log2(jnp.abs(pred - y_col) + 1.0)
        return None, (loss * batch.node_mask).sum()

    one_query = jax.checkpoint(one_query)
    _, losses = jax.lax.scan(
        one_query, None,
        (query_embs, batch.x.T, batch.node_y.T, rngs))
    return losses.sum()


def gossip_predict(params, batch: PackedGraphs, query_embs: jnp.ndarray):
    """[N, Q] refined counts: neigh_pred + gossip residual
    (lightning_model.py:613-628)."""
    def one_query(_, inp):
        q_emb, x_col = inp
        gossip = apply_gossip_single(params, batch, x_col, q_emb)
        return None, gossip + x_col

    _, preds = jax.lax.scan(one_query, None, (query_embs, batch.x.T))
    return preds.T
