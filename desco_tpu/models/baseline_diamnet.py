"""Whole-graph DIAMNet counting pipeline (GIN embeddings -> DIAMNet).

Counterpart of the reference's baseline driver path
(/root/reference/baseline.py:57-286 + lightning_model.py:652-804): a
homogeneous per-node GNN embeds whole target graphs and query patterns;
DIAMNet attends pattern/graph node sequences against a small memory and
regresses log2(graphlet_count + 1) per (graph, query) pair with the same
smooth-L1 / de-log semantics as the main model.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..batch.packed import PackedGraphs
from .diamnet import DIAMNetConfig, apply_diamnet, init_diamnet
from .neighborhood import smooth_l1
from .shmp_gnn import SHMPConfig, apply_shmp, init_shmp


def diamnet_tower_config(hidden_dim: int = 64, layer_num: int = 3,
                         conv_type: str = "GIN") -> SHMPConfig:
    return SHMPConfig(
        n_node_types=1, n_edge_types=1, edge_dst_type=(0,),
        input_dim=1, hidden_dim=hidden_dim, output_dim=hidden_dim,
        layer_num=layer_num, conv_type=conv_type, use_anchor=False,
        per_node_output=True)


def node_positions(batch: PackedGraphs) -> np.ndarray:
    """Host helper: position of each node within its graph (pad -> 0)."""
    ng = np.asarray(batch.node_graph)
    pos = np.zeros(len(ng), np.int32)
    counts: dict = {}
    for i, g in enumerate(ng):
        pos[i] = counts.get(int(g), 0)
        counts[int(g)] = pos[i] + 1
    return pos


def to_sequences(node_emb: jnp.ndarray, batch: PackedGraphs,
                 positions: jnp.ndarray, seq_len: int):
    """[N, D] per-node embeddings -> padded [G, L, D] sequences + lengths."""
    g_cap = batch.g_cap
    d = node_emb.shape[-1]
    seqs = jnp.zeros((g_cap + 1, seq_len, d), node_emb.dtype)
    idx = (batch.node_graph, jnp.minimum(positions, seq_len - 1))
    seqs = seqs.at[idx].add(node_emb * batch.node_mask[:, None])
    lengths = jax.ops.segment_sum(
        batch.node_mask, batch.node_graph, g_cap + 1)
    return seqs[:g_cap], lengths[:g_cap]


def init_diamnet_pipeline(key, tower_cfg: SHMPConfig, dn_cfg: DIAMNetConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "graph_tower": init_shmp(k1, tower_cfg),
        "pattern_tower": init_shmp(k2, tower_cfg),
        "diamnet": init_diamnet(k3, dn_cfg),
    }


def diamnet_forward(params, tower_cfg: SHMPConfig, dn_cfg: DIAMNetConfig,
                    batch: PackedGraphs, batch_pos, batch_seq_len: int,
                    query_batch: PackedGraphs, query_pos,
                    query_seq_len: int):
    """[G, Q] log-space predictions for every (graph, query) pair."""
    g_emb = apply_shmp(params["graph_tower"], tower_cfg, batch)
    p_emb = apply_shmp(params["pattern_tower"], tower_cfg, query_batch)
    g_seq, g_len = to_sequences(g_emb, batch, batch_pos, batch_seq_len)
    p_seq, p_len = to_sequences(p_emb, query_batch, query_pos,
                                query_seq_len)
    n_q = p_seq.shape[0]

    def per_query(q):
        pat = jnp.broadcast_to(p_seq[q][None], (g_seq.shape[0],) +
                               p_seq[q].shape)
        pl = jnp.broadcast_to(p_len[q][None], g_len.shape)
        return apply_diamnet(params["diamnet"], dn_cfg, pat, pl,
                             g_seq, g_len)[:, 0]

    preds = jax.vmap(per_query)(jnp.arange(n_q))  # [Q, G]
    return preds.T


def diamnet_train_loss(params, tower_cfg, dn_cfg, batch, batch_pos,
                       batch_seq_len, query_batch, query_pos,
                       query_seq_len):
    pred = diamnet_forward(params, tower_cfg, dn_cfg, batch, batch_pos,
                           batch_seq_len, query_batch, query_pos,
                           query_seq_len)
    target = jnp.log2(batch.y + 1.0)
    mask = batch.graph_mask
    per_q = (smooth_l1(pred, target) * mask[:, None]).sum(0) / jnp.maximum(
        mask.sum(), 1.0)
    return per_q.mean()
