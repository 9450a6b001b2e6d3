"""Edge-partitioned graph parallelism with halo exchange.

The reference never shards a single large graph — P2P/Astro/CiteSeer are
processed whole on one device (data.py:753-886), and its only
parallelism is DDP over small-graph batches. This module adds the graph
analog of sequence/context parallelism (SURVEY.md §5.7): ONE large
(typed) graph is partitioned across a ``graph`` mesh axis,

  * nodes are owned contiguously: device d owns [d*n_loc, (d+1)*n_loc)
  * every edge lives on its destination's owner
  * remote source features (the halo / boundary set) are exchanged with
    ONE ``all_to_all`` per layer over ICI, using host-precomputed static
    send lists; edge source ids are pre-rewritten to index a
    [local | halo] feature table, so after the exchange the aggregation
    is the ordinary typed segment-sum over local destinations.

Local-source edges are aggregated separately from halo-source edges so
XLA can overlap the collective with local compute (the dependency on the
all_to_all result is isolated to the halo partial sum).

All shapes are static: halo slots are padded to the max boundary size
over (device, peer) pairs; padded slots gather node 0 of the peer and
are masked by a 0 weight.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

try:
    from flax import struct
except ImportError:  # pragma: no cover
    struct = None

import jax
import jax.numpy as jnp

from ..ops.segment import segment_sum


@struct.dataclass
class HaloPartition:
    """Device-sharded typed graph (leading axis = device)."""

    # per-device node data
    x: np.ndarray            # [D, n_loc, F]
    node_type: np.ndarray    # [D, n_loc]
    node_mask: np.ndarray    # [D, n_loc]
    node_graph: np.ndarray   # [D, n_loc] graph slot (for pooling)
    # per-device edges (dst-local, src into [local | halo] table)
    edge_src_ext: np.ndarray  # [D, e_loc] index into n_loc + D*h_max table
    edge_dst: np.ndarray      # [D, e_loc] local dst
    edge_type: np.ndarray     # [D, e_loc]
    # halo exchange plan
    send_idx: np.ndarray     # [D, D, h_max] local ids this device sends
    send_mask: np.ndarray    # [D, D, h_max]
    node_y: Optional[np.ndarray] = None  # [D, n_loc, Q] per-node labels
    n_graphs: int = struct.field(pytree_node=False, default=1)

    @property
    def n_devices(self) -> int:
        return self.x.shape[0]

    @property
    def n_loc(self) -> int:
        return self.x.shape[1]

    @property
    def h_max(self) -> int:
        return self.send_idx.shape[2]


def partition_typed_graph(
    n_nodes: int,
    node_type: np.ndarray,
    x: np.ndarray,
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_type: np.ndarray,
    n_devices: int,
    node_graph: Optional[np.ndarray] = None,
    n_graphs: int = 1,
    pad_edge_type: int = 63,
    node_y: Optional[np.ndarray] = None,
) -> HaloPartition:
    """Host-side partitioner: contiguous node ranges, dst-owned edges,
    static halo send lists."""
    d = n_devices
    n_loc = -(-n_nodes // d)
    owner = np.minimum(edge_dst // n_loc, d - 1)
    e_counts = np.bincount(owner, minlength=d)
    e_loc = int(max(128, ((e_counts.max() + 127) // 128) * 128))

    f_dim = x.shape[1]
    X = np.zeros((d, n_loc, f_dim), np.float32)
    NT = np.zeros((d, n_loc), np.int32)
    NM = np.zeros((d, n_loc), np.float32)
    NG = np.zeros((d, n_loc), np.int32)
    NY = (np.zeros((d, n_loc, node_y.shape[1]), np.float32)
          if node_y is not None else None)
    for dev in range(d):
        lo, hi = dev * n_loc, min((dev + 1) * n_loc, n_nodes)
        k = hi - lo
        if k <= 0:
            continue
        X[dev, :k] = x[lo:hi]
        NT[dev, :k] = node_type[lo:hi]
        NM[dev, :k] = 1.0
        NG[dev, :k] = node_graph[lo:hi] if node_graph is not None else 0
        if NY is not None:
            NY[dev, :k] = node_y[lo:hi]
    NG[NM == 0] = n_graphs  # pad slot

    # per-device halo needs
    needed = [[np.zeros(0, np.int64)] * d for _ in range(d)]
    dev_edges = []
    for dev in range(d):
        sel = owner == dev
        es, ed, et = edge_src[sel], edge_dst[sel], edge_type[sel]
        dev_edges.append((es, ed, et))
        src_owner = np.minimum(es // n_loc, d - 1)
        for p in range(d):
            if p == dev:
                continue
            needed[dev][p] = np.unique(es[src_owner == p])
    h_max = max(
        [1] + [len(needed[dev][p]) for dev in range(d) for p in range(d)])
    h_max = ((h_max + 7) // 8) * 8

    send_idx = np.zeros((d, d, h_max), np.int32)
    send_mask = np.zeros((d, d, h_max), np.float32)
    for p in range(d):
        for dev in range(d):
            ids = needed[dev][p]  # global ids owned by p, needed by dev
            loc = (ids - p * n_loc).astype(np.int32)
            send_idx[p, dev, :len(loc)] = loc
            send_mask[p, dev, :len(loc)] = 1.0

    ES = np.zeros((d, e_loc), np.int32)
    ED = np.full((d, e_loc), n_loc - 1, np.int32)
    ET = np.full((d, e_loc), pad_edge_type, np.int32)
    for dev in range(d):
        es, ed, et = dev_edges[dev]
        src_owner = np.minimum(es // n_loc, d - 1)
        src_ext = np.empty(len(es), np.int64)
        local = src_owner == dev
        src_ext[local] = es[local] - dev * n_loc
        for p in range(d):
            if p == dev:
                continue
            sel = src_owner == p
            if not sel.any():
                continue
            pos = np.searchsorted(needed[dev][p], es[sel])
            src_ext[sel] = n_loc + p * h_max + pos
        # sort by (dst, type) for sorted dst*T+type segment sums (same
        # stream layout as batch/packed.py); overlap of the collective
        # with local compute comes from XLA scheduling.
        order = np.lexsort((et, ed - dev * n_loc))
        m = len(es)
        ES[dev, :m] = src_ext[order]
        ED[dev, :m] = (ed - dev * n_loc)[order]
        ET[dev, :m] = et[order]
        # pad edges point at the last local node with sentinel type;
        # gathered features are masked by construction (x[pad]=0)
        ES[dev, m:] = n_loc - 1

    return HaloPartition(
        x=X, node_type=NT, node_mask=NM, node_graph=NG,
        edge_src_ext=ES, edge_dst=ED, edge_type=ET,
        send_idx=send_idx, send_mask=send_mask, node_y=NY,
        n_graphs=n_graphs)


# ------------------------------------------------------------- device side
def halo_exchange(x_local: jnp.ndarray, send_idx: jnp.ndarray,
                  send_mask: jnp.ndarray, axis: str = "graph") -> jnp.ndarray:
    """Inside shard_map: exchange boundary features.

    x_local: [n_loc, F]; send_idx/mask: [D, h_max] (this device's rows).
    Returns the halo table [D * h_max, F] where block p holds features
    received from device p.
    """
    send = jnp.take(x_local, send_idx, axis=0) * send_mask[..., None]
    # all_to_all: slice j of my input goes to device j; I receive block p
    # from device p at position p.
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    d, h, f = recv.shape
    return recv.reshape(d * h, f)


def halo_typed_aggregate(
    x_local: jnp.ndarray,       # [n_loc, H]
    halo: jnp.ndarray,          # [D*h_max, H] from halo_exchange
    edge_src_ext: jnp.ndarray,  # [e_loc]
    edge_dst: jnp.ndarray,      # [e_loc]
    edge_type: jnp.ndarray,     # [e_loc]
    n_types: int,
) -> jnp.ndarray:
    """Typed aggregation over this shard's edges: [n_loc, T, H]."""
    n_loc = x_local.shape[0]
    table = jnp.concatenate([x_local, halo], axis=0)
    msgs = jnp.take(table, edge_src_ext, axis=0)
    seg = edge_dst.astype(jnp.int32) * n_types + edge_type.astype(jnp.int32)
    agg = segment_sum(msgs, seg, n_types * n_loc, indices_are_sorted=True)
    return agg.reshape(n_loc, n_types, x_local.shape[1])


def halo_aggregator(cfg, part_shard, axis: str = "graph"):
    """Aggregation provider for the sharded path: per layer, exchange
    boundary features then typed-aggregate over local edges."""
    def agg_fn(x, conv_w, _layer):
        halo = halo_exchange(x, part_shard.send_idx, part_shard.send_mask,
                             axis)
        agg = halo_typed_aggregate(
            x, halo, part_shard.edge_src_ext, part_shard.edge_dst,
            part_shard.edge_type, cfg.n_edge_types)
        return jnp.einsum("nth,thk->nk", agg, conv_w)
    return agg_fn


def halo_shmp_core(params, cfg, part_shard, axis: str = "graph",
                   train: bool = False, rng=None):
    """SHMP core over ONE sharded graph — runs INSIDE shard_map, one
    device's shard of a HaloPartition (leading device axis stripped).

    Shares the exact layer body with apply_shmp_core
    (models/shmp_gnn.run_shmp_layers — SAGE/GIN/GCN, dropout, concat
    skip); only the aggregation provider differs: remote sources arrive
    through a fresh halo exchange per layer. Returns the local slice of
    the concat-skip embeddings [n_loc, post_input_dim].
    """
    from ..models.shmp_gnn import _per_type_linear, run_shmp_layers

    nmask = part_shard.node_mask[:, None].astype(cfg.dtype)
    ntype = part_shard.node_type

    x = _per_type_linear(
        part_shard.x.astype(cfg.dtype), params["pre"][0], params["pre"][1],
        ntype, cfg.n_node_types)
    x = x * nmask
    if rng is not None:
        # per-shard dropout streams
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
    return run_shmp_layers(
        params, cfg, x, ntype, nmask,
        halo_aggregator(cfg, part_shard, axis), train=train, rng=rng)


def halo_graph_pool(emb_local, node_graph_local, n_graphs: int,
                    axis: str = "graph"):
    """Cross-device global-add pool: local segment-sum then psum."""
    pooled = segment_sum(emb_local, node_graph_local, n_graphs + 1)
    return jax.lax.psum(pooled[:n_graphs], axis)


def halo_gossip_single(params, part_shard, x_col_local, query_emb,
                       axis: str = "graph"):
    """Gossip forward for ONE query over ONE sharded large graph — runs
    inside shard_map on a HaloPartition shard whose edge types are the
    direction bits (0 fwd / 1 bwd). Mirrors
    models/gossip.apply_gossip_single with halo exchange feeding the
    per-direction aggregations; enables single-graph gossip inference at
    at P2P/Astro scale across chips (the reference runs such graphs whole
    on one device, data.py:753-886)."""
    from ..models.gossip import _gate
    from ..models.shmp_gnn import _dropout  # noqa: F401 (parity)

    nmask = part_shard.node_mask[:, None]
    w_pre, b_pre = params["pre"]
    x = x_col_local[:, None] @ w_pre + b_pre
    qe = jnp.broadcast_to(query_emb[None, :],
                          (x.shape[0], query_emb.shape[0]))
    x = jax.lax.stop_gradient(jnp.concatenate([qe, x], axis=-1)) * nmask
    emb = x

    halo_m = halo_exchange(part_shard.node_mask[:, None],
                           part_shard.send_idx, part_shard.send_mask, axis)
    deg = halo_typed_aggregate(
        part_shard.node_mask[:, None], halo_m, part_shard.edge_src_ext,
        part_shard.edge_dst, part_shard.edge_type, 2)[..., 0]  # [n_loc, 2]

    for conv in params["convs"]:
        g = _gate(conv, query_emb)
        halo = halo_exchange(x, part_shard.send_idx, part_shard.send_mask,
                             axis)
        agg = halo_typed_aggregate(
            x, halo, part_shard.edge_src_ext, part_shard.edge_dst,
            part_shard.edge_type, 2)
        mixed = g * agg[:, 0] + (1.0 - g) * agg[:, 1]
        wc, bc = conv["com"]
        wdeg = (g * deg[:, 0] + (1.0 - g) * deg[:, 1])[:, None]
        aggr = mixed @ wc + bc * wdeg
        wu, bu = conv["upd"]
        x = jax.nn.relu(
            jnp.concatenate([aggr, x], axis=-1) @ wu + bu) * nmask
        emb = jnp.concatenate([emb, x], axis=-1)

    (w1, b1), (w2, b2), (w3, b3), (w4, b4) = params["post"]
    h = jax.nn.leaky_relu(emb @ w1 + b1, negative_slope=0.1)
    h = jax.nn.relu(h @ w2 + b2)
    h = jax.nn.relu(h @ w3 + b3)
    out = (h @ w4 + b4)[:, 0]
    return out * part_shard.node_mask


# ------------------------------------------------------- training (halo)
def halo_gossip_loss(params, part_shard, query_embs,
                     axis: str = "graph"):
    """Gossip objective over ONE sharded large graph — runs inside
    shard_map. Same semantics as models/gossip.gossip_loss (SUM over
    nodes and queries of log2(|gossip + neigh - truth| + 1),
    lightning_model.py:630-635) with the psum making the scalar global,
    so gradients through the per-layer all_to_all exchanges are exact.

    part_shard.x: [n_loc, Q] stage-1 counts; node_y: [n_loc, Q] truth.
    """
    def one_query(_, inp):
        q_emb, x_col, y_col = inp
        gossip = halo_gossip_single(params, part_shard, x_col, q_emb, axis)
        pred = gossip + x_col
        loss = jnp.log2(jnp.abs(pred - y_col) + 1.0)
        return None, (loss * part_shard.node_mask).sum()

    _, losses = jax.lax.scan(
        jax.checkpoint(one_query), None,
        (query_embs, part_shard.x.T, part_shard.node_y.T))
    return jax.lax.psum(losses.sum(), axis)


def halo_gossip_step_fn(tx, mesh, axis: str = "graph"):
    """Jitted gossip train step over a halo-partitioned graph: params
    replicated, graph sharded on the ``graph`` mesh axis, gradients flow
    through the halo all_to_all; the psum'd global loss differentiates
    to replicated gradients (same VMA argument as parallel/dp.py)."""
    import optax
    from functools import partial
    from jax.sharding import PartitionSpec as P

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
    )
    def step(params, opt_state, part, query_embs, lr):
        shard = jax.tree_util.tree_map(lambda a: a[0], part)
        loss, grads = jax.value_and_grad(
            lambda p: halo_gossip_loss(p, shard, query_embs, axis))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
