"""Neighborhood counting model (stage 2 of DeSCo).

TPU-native rebuild of ``NeighborhoodCountingModel``
(/root/reference/subgraph_counting/lightning_model.py:90-532): two SHMP
embedding towers (targets, queries) and an MLP count head regressing
log2(count + 1) per (neighborhood, query) pair. The reference's python
loop over the 29 queries (lightning_model.py:240-253) is replaced by a
broadcast over the query axis — the count head's first linear is split
into target/query halves so the [Q, B, 4H] activation is formed with two
matmuls and a broadcast add.

Semantics replicated exactly:
  * train loss  : smooth-L1(pred, log2(truth + 1)), mean per query then
                  mean over queries (= global mean)
  * test loss   : smooth-L1(relu(2^(pred - 1)), truth)
  * prediction  : 2^pred - 1
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..batch.packed import PackedGraphs
from .init import linear_params
from .shmp_gnn import SHMPConfig, apply_shmp, init_shmp


def init_neighborhood_model(key, tgt_cfg: SHMPConfig, qry_cfg: SHMPConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h = tgt_cfg.hidden_dim
    return {
        "target": init_shmp(k1, tgt_cfg),
        "query": init_shmp(k2, qry_cfg),
        "count1": linear_params(k3, 2 * h, 4 * h),
        "count2": linear_params(k4, 4 * h, 1),
    }


def embed_queries(params, qry_cfg: SHMPConfig, query_batch: PackedGraphs,
                  train=False, rng=None):
    """[Q, H] query embeddings (query_batch packs exactly the query set).
    ``train``/``rng`` activate dropout in the query tower — the
    reference runs the query embedding model in train mode during
    training_step, so nonzero-dropout configs must match (no effect at
    the default dropout=0.0)."""
    return apply_shmp(params["query"], qry_cfg, query_batch,
                      train=train, rng=rng)


def embed_targets(params, tgt_cfg: SHMPConfig, batch: PackedGraphs,
                  train=False, rng=None):
    return apply_shmp(params["target"], tgt_cfg, batch, train=train, rng=rng)


def count_head(params, emb_targets: jnp.ndarray, emb_queries: jnp.ndarray):
    """pred[g, q] for all (target graph, query) pairs.

    count_model = Linear(2H -> 4H) . LeakyReLU . Linear(4H -> 1)
    (lightning_model.py:127-131) with the concat order (target, query)
    (lightning_model.py:240-245). W1 splits into the target half and the
    query half of the input.
    """
    w1, b1 = params["count1"]
    w2, b2 = params["count2"]
    h = emb_queries.shape[-1]
    wt, wq = w1[:h], w1[h:]
    # [G, 4H] + [Q, 1, 4H] -> [Q, G, 4H]
    hid = emb_targets @ wt + (emb_queries @ wq)[:, None, :] + b1
    hid = jax.nn.leaky_relu(hid, negative_slope=0.01)
    pred = (hid @ w2 + b2)[..., 0]  # [Q, G]
    return pred.T  # [G, Q]


def smooth_l1(pred, target):
    d = pred - target
    ad = jnp.abs(d)
    return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)


def _masked_mean(v, mask):
    # mean over valid graphs per query, then mean over queries — equals the
    # reference's mean-of-per-query-means (lightning_model.py:246-253)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (v * mask[:, None]).sum(axis=0) / denom


def forward_counts(params, tgt_cfg, qry_cfg, batch, query_batch,
                   train=False, rng=None):
    q_rng = (jax.random.fold_in(rng, 0x71) if rng is not None else None)
    emb_q = embed_queries(params, qry_cfg, query_batch,
                          train=train, rng=q_rng)
    emb_t = embed_targets(params, tgt_cfg, batch, train=train, rng=rng)
    return count_head(params, emb_t, emb_q)


def train_loss(params, tgt_cfg: SHMPConfig, qry_cfg: SHMPConfig,
               batch: PackedGraphs, query_batch: PackedGraphs,
               rng=None) -> jnp.ndarray:
    pred = forward_counts(params, tgt_cfg, qry_cfg, batch, query_batch,
                          train=True, rng=rng)
    target = jnp.log2(batch.y + 1.0)
    per_query = _masked_mean(smooth_l1(pred, target), batch.graph_mask)
    return per_query.mean()


def test_loss(params, tgt_cfg, qry_cfg, batch, query_batch) -> jnp.ndarray:
    pred = forward_counts(params, tgt_cfg, qry_cfg, batch, query_batch)
    depred = jax.nn.relu(2.0 ** (pred - 1.0))
    per_query = _masked_mean(smooth_l1(depred, batch.y), batch.graph_mask)
    return per_query.mean()


def predict_counts(params, tgt_cfg, qry_cfg, batch, query_batch):
    """De-logged count prediction 2^pred - 1 (lightning_model.py:195-222),
    shape [G, Q]; invalid graph rows are meaningless (mask outside)."""
    pred = forward_counts(params, tgt_cfg, qry_cfg, batch, query_batch)
    return 2.0 ** pred - 1.0


def predict_counts_from_embs(params, tgt_cfg, batch, emb_q):
    """predict_counts with the query tower hoisted: the query set is
    static per serving run, so emb_q ([Q, H], from embed_queries) is
    computed ONCE and reused across all target batches."""
    emb_t = embed_targets(params, tgt_cfg, batch)
    return 2.0 ** count_head(params, emb_t, emb_q) - 1.0
