"""SHMP GNN core + embedding head — the TPU-native BaseGNN.

The reference builds a homogeneous ``BaseGNNCore`` (pre_mp -> L conv
layers with concat-skip) and clones it per node/edge type with
``pyg.nn.to_hetero(aggr='sum')`` (gnn_model.py:115-277,
lightning_model.py:371-421). Here SHMP is *data*, not module structure:
edges carry a type id, and every layer is

    agg[t, i]  = sum over type-t edges into i of x[src]     (segment-sum)
    x_neigh[i] = sum over t of agg[t, i] @ W_conv[t] + per-dst-type bias
    x          = act(update_by_node_type(cat(x_neigh, x)))  (SAGE)

which is the exact same math as the cloned-module formulation (sum
cross-type aggregation; every edge type always contributes its bias to
its dst node type because the reference pads every sample to the full
edge-type set — workload.py:275-283). All type handling is dense einsum
over a leading type axis: one kernel, MXU-tiled.

Padding invariant: node features of padding slots are forced to zero
after every dense op, so padded edges (src = pad node) contribute nothing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..batch.packed import PackedGraphs
from ..ops.segment import (
    graph_pool_sum,
    segment_sum,
    typed_edge_aggregate,
    typed_transform_aggregate,
)
from .init import linear_params, mlp_params


@dataclasses.dataclass(frozen=True)
class SHMPConfig:
    """Static model configuration (hashable; safe as a jit static arg)."""

    n_node_types: int = 2
    n_edge_types: int = 6
    edge_dst_type: Tuple[int, ...] = (0, 0, 1, 1, 0, 0)
    input_dim: int = 1
    hidden_dim: int = 64
    output_dim: int = 64
    layer_num: int = 8
    conv_type: str = "SAGE"  # SAGE | GIN | GCN | GAT | PNA
    dropout: float = 0.0
    use_anchor: bool = True        # anchor MLP on canonical nodes
    canonical_type: int = 1
    per_node_output: bool = False  # gossip: post_mp per node, no pooling
    dtype: jnp.dtype = jnp.float32
    # 'aggregate_first' scatters into [N*T,H] then one [N,T*H]@[T*H,K]
    # matmul; 'transform_first' applies W[t] to all nodes then scatters
    # into [N,K] (1/T the scatter bytes; mathematically identical);
    # 'cumsum' replaces the scatter with a prefix-sum + boundary gather
    # (ops/segment.py — correct everywhere, slower than pallas on TPU);
    # 'pallas' runs the fused TPU kernel (ops/pallas_segment.py): MXU
    # one-hot matmuls over (dst,type)-sorted edge tiles, no [N*T,H]
    # scatter buffer. Requires n_cap % 128 == 0 (auto_capacities
    # guarantees it) and square conv weights.
    agg_mode: str = "aggregate_first"

    @property
    def post_input_dim(self) -> int:
        return self.hidden_dim * self.layer_num + self.hidden_dim


def init_shmp(key, cfg: SHMPConfig):
    """Parameter pytree for the SHMP BaseGNN."""
    ks = jax.random.split(key, 6)
    h, p = cfg.hidden_dim, cfg.post_input_dim
    params = {
        # pre_mp cloned per node type (to_hetero semantics)
        "pre": linear_params(ks[0], cfg.input_dim, h, cfg.n_node_types),
        # conv lin per (layer, edge type)
        "conv": linear_params(ks[1], h, h, cfg.layer_num, cfg.n_edge_types),
        "post": mlp_params(ks[4], [p, h, h, 256, cfg.output_dim]),
    }
    if cfg.conv_type == "SAGE":
        params["upd"] = linear_params(
            ks[2], 2 * h, h, cfg.layer_num, cfg.n_node_types)
    elif cfg.conv_type == "GCN":
        pass  # x = x_neigh directly (GCNConv normalize=False semantics,
        #       gnn_model.py:215-216, 268-270)
    elif cfg.conv_type == "GIN":
        # 2-layer update MLP per (layer, node type); eps fixed at 0
        params["upd1"] = linear_params(
            ks[2], h, h, cfg.layer_num, cfg.n_node_types)
        params["upd2"] = linear_params(
            ks[5], h, h, cfg.layer_num, cfg.n_node_types)
    elif cfg.conv_type == "GAT":
        # per-(layer, edge-type) attention vectors (GATConv heads=1,
        # gnn_model.py:222-224; typed adaptation of a_src/a_dst)
        k2 = jax.random.split(ks[2])
        scale = 1.0 / jnp.sqrt(h)
        params["att"] = (
            jax.random.normal(k2[0], (cfg.layer_num, cfg.n_edge_types, h))
            * scale,
            jax.random.normal(k2[1], (cfg.layer_num, cfg.n_edge_types, h))
            * scale)
    elif cfg.conv_type == "PNA":
        # per-(layer, edge-type) mixer over 3 scalers x 4 aggregators x H
        # (bias comes from the shared per-dst-type conv-bias mechanism)
        k = 1.0 / jnp.sqrt(jnp.asarray(12 * h, jnp.float32))
        params["pna_mix"] = jax.random.uniform(
            ks[2], (cfg.layer_num, cfg.n_edge_types, 12 * h, h),
            jnp.float32, -k, k)
    else:
        raise NotImplementedError(cfg.conv_type)
    if cfg.use_anchor:
        params["anchor"] = linear_params(ks[3], p, p)
    return params


def _per_type_linear(x, w, b, node_type, n_types):
    """y[i] = x[i] @ w[type(i)] + b[type(i)] — computed as all-types
    einsum + select (MXU-friendly for small type counts).

    The select is a chain of jnp.where, NOT take_along_axis: XLA lowers
    the latter to a gather (~0.07 ms per call on the bench workload vs
    a fused elementwise select)."""
    y_all = jnp.einsum("nd,tdh->tnh", x, w) + b[:, None, :]
    if n_types == 1:
        return y_all[0]
    out = y_all[0]
    for t in range(1, n_types):
        out = jnp.where((node_type == t)[:, None], y_all[t], out)
    return out


def _dropout(x, rate, rng, train):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def packed_aggregator(cfg: SHMPConfig, batch: PackedGraphs):
    """Aggregation provider for packed batches: fn(x, conv_w) -> x_neigh
    [N, K] per cfg.agg_mode (XLA scatter paths or the fused Pallas
    kernel)."""
    if cfg.agg_mode == "transform_first":
        def agg_fn(x, conv_w):
            return typed_transform_aggregate(
                x, conv_w, batch.edge_src, batch.edge_dst,
                batch.edge_type, cfg.n_edge_types)
    elif cfg.agg_mode == "cumsum":
        from ..ops.segment import cumsum_typed_transform_aggregate

        def agg_fn(x, conv_w):
            return cumsum_typed_transform_aggregate(
                x, conv_w, batch.edge_src, batch.edge_dst,
                batch.edge_type, cfg.n_edge_types)
    elif cfg.agg_mode == "pallas":
        from ..ops.pallas_segment import fused_typed_transform_aggregate

        keys = (batch.edge_dst.astype(jnp.int32) * cfg.n_edge_types
                + batch.edge_type.astype(jnp.int32))

        def agg_fn(x, conv_w):
            return fused_typed_transform_aggregate(
                x, batch.edge_src, keys, conv_w,
                cfg.n_edge_types, batch.n_cap,
                bwd_perm=batch.edge_bwd_perm)
    else:
        def agg_fn(x, conv_w):
            agg = typed_edge_aggregate(
                x, batch.edge_src, batch.edge_dst, batch.edge_type,
                cfg.n_edge_types)  # [N, T_e, H]
            return jnp.einsum("nth,thk->nk", agg, conv_w)
    return agg_fn


def gat_aggregator(cfg: SHMPConfig, batch: PackedGraphs, att):
    """Typed GAT attention aggregation (conv_type='GAT',
    gnn_model.py:222-224: pyg GATConv heads=1 under the ablation driver).

    Attention is softmax-normalized within each (dst, edge-type) segment
    — the typed analog of per-edge-type GATConv under to_hetero — with a
    self-loop term (PyG ``add_self_loops`` default), computed with
    sorted segment max/sum: no dense [N, N] attention, MXU transforms.
    Per-type outputs are summed (to_hetero aggr='sum')."""
    a_src_all, a_dst_all = att  # [L, T, H] each
    t_n = cfg.n_edge_types
    seg = (batch.edge_dst.astype(jnp.int32) * t_n
           + batch.edge_type.astype(jnp.int32))
    e_t = jnp.clip(batch.edge_type.astype(jnp.int32), 0, t_n - 1)

    def agg_fn(x, conv_w, layer):
        n = x.shape[0]
        a_src, a_dst = a_src_all[layer], a_dst_all[layer]
        z = jnp.einsum("nh,thk->tnk", x, conv_w)          # [T, N, K]
        s_src = jnp.einsum("tnk,tk->tn", z, a_src)        # [T, N]
        s_dst = jnp.einsum("tnk,tk->tn", z, a_dst)
        # per-edge logits; pad edges carry out-of-range seg keys, so
        # their (clipped-type garbage) contributions are dropped by the
        # segment scatters below
        s_e = jax.nn.leaky_relu(
            s_src[e_t, batch.edge_src] + s_dst[e_t, batch.edge_dst], 0.2)
        m = jax.ops.segment_max(s_e, seg, num_segments=n * t_n,
                                indices_are_sorted=True)
        m = jnp.where(jnp.isfinite(m), m, 0.0)  # empty segments -> 0
        p = jnp.exp(s_e - jnp.take(m, seg, fill_value=0.0))
        z_src = z[e_t, batch.edge_src]                    # [E, K]
        num = segment_sum(p[:, None] * z_src, seg, n * t_n,
                          indices_are_sorted=True).reshape(n, t_n, -1)
        den = segment_sum(p, seg, n * t_n,
                          indices_are_sorted=True).reshape(n, t_n)
        m2 = m.reshape(n, t_n)
        # merge the self-loop candidate into each (node, type) softmax.
        # Empty (node,type) segments (den == 0) must anchor the rescale
        # at s_self, not the fixed-up m2 == 0: with a strongly negative
        # self-logit, exp(s_self - 0) underflows and the softmax would
        # be 0/0 = NaN; anchored at s_self the result is exactly z_self
        # (softmax over {self} alone)
        s_self = jax.nn.leaky_relu(s_src + s_dst, 0.2).T  # [N, T]
        empty = den == 0
        big = jnp.where(empty, s_self, jnp.maximum(m2, s_self))
        w_edges = jnp.where(empty, 0.0, jnp.exp(m2 - big))
        w_self = jnp.exp(s_self - big)
        z_self = jnp.swapaxes(z, 0, 1)                    # [N, T, K]
        out_t = ((num * w_edges[..., None] + w_self[..., None] * z_self)
                 / (den * w_edges + w_self)[..., None])
        return out_t.sum(axis=1)
    return agg_fn


def pna_aggregator(cfg: SHMPConfig, batch: PackedGraphs, mix_w_all):
    """Typed PNA aggregation (conv_type='PNA').

    The reference *constructs* pyg ``PNAConv`` with aggregators
    [mean, min, max, std] and scalers [identity, amplification,
    attenuation] (gnn_model.py:155-171) but its layer-update switch
    (gnn_model.py:263-271) raises ``NotImplementedError`` for it — the
    option is dead code upstream. This is the working typed analog:

        z            = x @ W[t]                       (per edge type)
        a[dst, t, :] = [mean, min, max, std] of z over type-t in-edges
        scaled       = a * {1, log(d+1)/delta, delta/log(d+1)}
        out[dst]     = sum_t scaled[dst, t] @ mix_w[t]   (aggr='sum')

    with d = per-(dst, type) in-degree clamped to >= 1 (pyg's
    ``deg.clamp_(1)``) and delta = mean log(total in-degree + 1) over the
    batch's valid nodes. pyg takes delta from a dataset degree histogram
    passed at construction; the per-batch estimate is the jit-friendly
    (static-shape, dataset-free) equivalent and is stop-gradiented.

    All segment statistics ride the (dst, type)-sorted edge stream —
    pad edges carry out-of-range segment ids and are dropped by every
    scatter. One MXU einsum per scaler block; no [N, N] densification."""
    t_n = cfg.n_edge_types
    seg = (batch.edge_dst.astype(jnp.int32) * t_n
           + batch.edge_type.astype(jnp.int32))
    e_t = jnp.clip(batch.edge_type.astype(jnp.int32), 0, t_n - 1)
    nmask_f = batch.node_mask.astype(jnp.float32)

    def agg_fn(x, conv_w, layer):
        n = x.shape[0]
        mix_w = mix_w_all[layer]                          # [T, 12H, H]
        z = jnp.einsum("nh,thk->tnk", x, conv_w)          # [T, N, K]
        z_src = z[e_t, batch.edge_src]                    # [E, K]
        # degree counts and moment sums accumulate in f32 regardless of
        # the tower dtype: a bf16 count saturates at 256 (8-bit
        # mantissa), freezing degrees/mean/std for high-degree nodes
        z32 = z_src.astype(jnp.float32)
        ones = jnp.ones(seg.shape, jnp.float32)
        cnt = segment_sum(ones, seg, n * t_n, indices_are_sorted=True)
        s1 = segment_sum(z32, seg, n * t_n, indices_are_sorted=True)
        s2 = segment_sum(z32 * z32, seg, n * t_n,
                         indices_are_sorted=True)
        d = jnp.maximum(cnt, 1.0)[:, None]
        mean = s1 / d
        # gradient-safe sqrt: var == 0 (empty / single-element segments)
        # must yield zero grad, not sqrt'(0) = inf
        var = jnp.maximum(s2 / d - mean * mean, 0.0)
        std = jnp.where(var > 0, jnp.sqrt(jnp.where(var > 0, var, 1.0)),
                        0.0)
        mn = jax.ops.segment_min(z_src, seg, num_segments=n * t_n,
                                 indices_are_sorted=True)
        mx = jax.ops.segment_max(z_src, seg, num_segments=n * t_n,
                                 indices_are_sorted=True)
        has = (cnt > 0)[:, None]
        mn = jnp.where(has & jnp.isfinite(mn), mn, 0.0)
        mx = jnp.where(has & jnp.isfinite(mx), mx, 0.0)
        feats = jnp.concatenate([mean, mn, mx, std], axis=-1)
        feats = feats.reshape(n, t_n, -1)                 # [N, T, 4K]
        logd = jnp.log(jnp.maximum(cnt, 1.0) + 1.0).reshape(n, t_n)
        d_tot = cnt.reshape(n, t_n).sum(axis=1)
        delta = (jnp.sum(jnp.log(jnp.maximum(d_tot, 1.0) + 1.0) * nmask_f)
                 / jnp.maximum(nmask_f.sum(), 1.0))
        delta = jax.lax.stop_gradient(
            jnp.maximum(delta, 1e-6)).astype(feats.dtype)
        amp = (logd / delta)[..., None].astype(feats.dtype)
        att = (delta / logd)[..., None].astype(feats.dtype)
        w_id, w_amp, w_att = jnp.split(mix_w, 3, axis=1)  # [T, 4K, H] each
        return (jnp.einsum("ntf,tfh->nh", feats, w_id)
                + jnp.einsum("ntf,tfh->nh", feats * amp, w_amp)
                + jnp.einsum("ntf,tfh->nh", feats * att, w_att))
    return agg_fn


def run_shmp_layers(
    params, cfg: SHMPConfig, x, ntype, nmask, aggregate_fn,
    train: bool = False, rng=None,
) -> jnp.ndarray:
    """The L conv layers with concat-skip (gnn_model.py:253-277), shared
    by the packed path (apply_shmp_core) and the halo-sharded path
    (parallel/halo.halo_shmp_core). ``aggregate_fn(x, conv_w, layer)``
    returns the type-transformed neighbor sum [N, K] (no bias)."""
    # per-dst-type conv bias accumulation: bias_by_ntype[t_n] =
    # sum of conv biases of edge types whose dst node type is t_n
    dst_t = jnp.asarray(cfg.edge_dst_type)
    # concat-skip DEFERRED: emb = cat(x_0..x_L) built once at the end —
    # growing the buffer per layer would copy O(L^2 * N * H) bytes
    embs = [x]
    for l in range(cfg.layer_num):
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        conv_w, conv_b = params["conv"][0][l], params["conv"][1][l]
        # aggregation providers may accumulate/return f32 (the Pallas
        # kernel does); fold back to the tower dtype so bf16 towers stay
        # bf16 through the concat/update chain
        x_neigh = aggregate_fn(x, conv_w, l).astype(cfg.dtype)
        bias_by_ntype = jax.ops.segment_sum(
            conv_b, dst_t, num_segments=cfg.n_node_types)  # [T_n, H]
        bias_rows = bias_by_ntype[0]
        for t in range(1, cfg.n_node_types):  # select, not gather
            bias_rows = jnp.where((ntype == t)[:, None],
                                  bias_by_ntype[t], bias_rows)
        x_neigh = x_neigh + bias_rows

        if cfg.conv_type == "SAGE":
            upd_in = jnp.concatenate([x_neigh, x], axis=-1)
            x = _per_type_linear(
                upd_in, params["upd"][0][l], params["upd"][1][l],
                ntype, cfg.n_node_types)
        elif cfg.conv_type in ("GCN", "GAT", "PNA"):
            # conv output used directly (GAT attention / PNA statistics
            # happen inside the aggregation provider)
            x = x_neigh
        else:  # GIN: update MLP on (x_neigh + (1 + eps) * x), eps = 0
            upd_in = x_neigh + x
            hmid = jax.nn.relu(_per_type_linear(
                upd_in, params["upd1"][0][l], params["upd1"][1][l],
                ntype, cfg.n_node_types))
            x = _per_type_linear(
                hmid, params["upd2"][0][l], params["upd2"][1][l],
                ntype, cfg.n_node_types)
        x = jax.nn.relu(x)
        x = _dropout(x, cfg.dropout, sub, train)
        x = x * nmask
        embs.append(x)
    return jnp.concatenate(embs, axis=-1)


def cast_params(params, dtype):
    """Cast every f32 leaf to ``dtype`` (no-op for f32). Weights are tiny
    next to activations, so the per-call cast is free; it keeps ONE
    stored f32 param tree serving both precisions."""
    if dtype == jnp.float32:
        return params
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params)


def apply_shmp_core(
    params, cfg: SHMPConfig, batch: PackedGraphs,
    train: bool = False, rng=None,
) -> jnp.ndarray:
    """BaseGNNCore.forward (gnn_model.py:230-277): returns [N, post_input_dim]
    concat-skip embeddings with padded rows zeroed.

    With ``cfg.dtype=bfloat16`` the whole tower (params + activations)
    runs in bf16 — matmuls accumulate f32 on the MXU either way, so this
    halves HBM traffic of the elementwise fusions at ~8-bit mantissa
    cost; the count head stays f32 (it lives outside this module)."""
    params = cast_params(params, cfg.dtype)
    nmask = batch.node_mask[:, None].astype(cfg.dtype)
    ntype = batch.node_type

    x = _per_type_linear(
        batch.x.astype(cfg.dtype), params["pre"][0], params["pre"][1],
        ntype, cfg.n_node_types)
    x = x * nmask

    if cfg.conv_type == "GAT":
        agg_fn = gat_aggregator(cfg, batch, params["att"])
    elif cfg.conv_type == "PNA":
        agg_fn = pna_aggregator(cfg, batch, params["pna_mix"])
    else:
        agg = packed_aggregator(cfg, batch)
        agg_fn = lambda x_, w_, l_: agg(x_, w_)  # noqa: E731
    return run_shmp_layers(
        params, cfg, x, ntype, nmask, agg_fn, train=train, rng=rng)


def apply_shmp(
    params, cfg: SHMPConfig, batch: PackedGraphs,
    train: bool = False, rng=None,
) -> jnp.ndarray:
    """BaseGNN.forward (gnn_model.py:58-109): core -> anchor MLP on
    canonical nodes -> global add pool -> post MLP. Returns [G, out]
    (or [N, out] per-node when cfg.per_node_output, the gossip path)."""
    params = cast_params(params, cfg.dtype)
    emb = apply_shmp_core(params, cfg, batch, train=train, rng=rng)

    if cfg.use_anchor:
        aw, ab = params["anchor"]
        anchored = jax.nn.leaky_relu(emb @ aw + ab, negative_slope=0.1)
        is_canon = (batch.node_type == cfg.canonical_type)[:, None]
        emb = jnp.where(is_canon, anchored, emb)

    if rng is not None:
        # fold in a tag first: apply_shmp_core consumed splits of this
        # SAME key for the layer dropouts, so a bare split here would
        # reproduce layer-0's subkey and correlate the post-MLP dropout
        # mask with the layer-0 mask (threefry split is deterministic)
        rng, sub = jax.random.split(jax.random.fold_in(rng, 0x9057))
    else:
        sub = None

    if cfg.per_node_output:
        out = _apply_post(params["post"], emb, cfg, sub, train)
        return out * batch.node_mask[:, None].astype(cfg.dtype)

    emb = emb * batch.node_mask[:, None].astype(cfg.dtype)
    pooled = graph_pool_sum(emb, batch.node_graph, batch.g_cap)
    return _apply_post(params["post"], pooled, cfg, sub, train)


def _apply_post(post, x, cfg, rng, train):
    """post_mp: Linear -> Dropout -> LeakyReLU(0.1) -> Linear -> ReLU ->
    Linear -> ReLU -> Linear (gnn_model.py:44-53)."""
    (w1, b1), (w2, b2), (w3, b3), (w4, b4) = post
    x = x @ w1 + b1
    x = _dropout(x, cfg.dropout, rng, train)
    x = jax.nn.leaky_relu(x, negative_slope=0.1)
    x = jax.nn.relu(x @ w2 + b2)
    x = jax.nn.relu(x @ w3 + b3)
    return x @ w4 + b4


# ----------------------------------------------------------------- configs
def neighborhood_target_config(
    use_tconv: bool = True, use_hetero: bool = True, order: int = 3, **kw
) -> SHMPConfig:
    from ..batch.build import (
        NEIGH_ORDER4_DST,
        NEIGH_PLAIN_DST,
        NEIGH_TCONV_DST,
    )

    if order == 4:
        # order-4 SHMP: 11 edge-orbit classes x 3 canonical combos
        # (lightning_model.py:441-458 union_1..union_11 via to_hetero)
        return SHMPConfig(n_node_types=2, n_edge_types=33,
                          edge_dst_type=NEIGH_ORDER4_DST, **kw)
    if not use_hetero:
        return SHMPConfig(n_node_types=1, n_edge_types=1,
                          edge_dst_type=(0,), use_anchor=True,
                          canonical_type=1, **kw)
    if use_tconv:
        return SHMPConfig(n_node_types=2, n_edge_types=6,
                          edge_dst_type=NEIGH_TCONV_DST, **kw)
    return SHMPConfig(n_node_types=2, n_edge_types=3,
                      edge_dst_type=NEIGH_PLAIN_DST, **kw)


def query_config(use_tconv: bool = True, **kw) -> SHMPConfig:
    from ..batch.build import QUERY_PLAIN_DST, QUERY_TCONV_DST

    if use_tconv:
        return SHMPConfig(n_node_types=1, n_edge_types=2,
                          edge_dst_type=QUERY_TCONV_DST,
                          use_anchor=True, canonical_type=1, **kw)
    return SHMPConfig(n_node_types=1, n_edge_types=1,
                      edge_dst_type=QUERY_PLAIN_DST,
                      use_anchor=True, canonical_type=1, **kw)
