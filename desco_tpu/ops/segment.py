"""Segment reductions — the sparse workhorses.

These replace torch-scatter's ``segment_csr`` / PyG's gather-scatter
(reference workload.py:29,148; gnn_model.py message passing). The XLA
path uses ``jax.ops.segment_sum`` with sorted-segment hints (host packing
pre-sorts edges by ``(type, dst)``); a Pallas kernel for the hot typed
aggregation lives in ``desco_tpu.ops.pallas_segment`` and is selected by
``typed_edge_aggregate`` when beneficial.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def typed_edge_aggregate(
    x: jnp.ndarray,          # [N, H] node features
    edge_src: jnp.ndarray,   # [E] i32
    edge_dst: jnp.ndarray,   # [E] i32
    edge_type: jnp.ndarray,  # [E] i32, values in [0, T)
    n_types: int,
) -> jnp.ndarray:
    """SHMP aggregation: out[i, t] = sum over edges e of type t with
    dst(e)==i of x[src(e)]. Returns [N, T, H].

    One fused gather + segment-sum over the combined key ``dst*T + t``;
    edges are pre-sorted by (dst, type) on the host, so segment ids are
    sorted (monotone scatter). The [N, T, H] layout makes the per-type
    conv transform a single [N, T*H] @ [T*H, K] matmul downstream.
    """
    n = x.shape[0]
    seg = edge_dst.astype(jnp.int32) * n_types + edge_type.astype(jnp.int32)
    msgs = jnp.take(x, edge_src, axis=0)
    agg = segment_sum(msgs, seg, n_types * n, indices_are_sorted=True)
    return agg.reshape(n, n_types, x.shape[1])


def typed_transform_aggregate(
    x: jnp.ndarray,          # [N, H]
    conv_w: jnp.ndarray,     # [T, H, K] per-type weights
    edge_src: jnp.ndarray,   # [E]
    edge_dst: jnp.ndarray,   # [E]
    edge_type: jnp.ndarray,  # [E]
    n_types: int,
) -> jnp.ndarray:
    """Transform-first SHMP aggregation: out[i] = sum over edges into i of
    (x[src] @ W[type]). Mathematically identical to aggregate-then-
    transform (sum_t W_t · agg_t) but the scatter target is [N, K]
    instead of [T*N, H] — 1/T the scatter bytes at the cost of T cheap
    MXU matmuls over all nodes. Returns [N, K] (no bias).
    """
    n = x.shape[0]
    y = jnp.einsum("nh,thk->tnk", x, conv_w)        # [T, N, K]
    flat = y.reshape(n_types * n, conv_w.shape[2])
    idx = edge_type.astype(jnp.int32) * n + edge_src.astype(jnp.int32)
    msgs = jnp.take(flat, idx, axis=0, fill_value=0.0)
    # edges are (dst, type)-sorted on the host -> dst is monotone
    return segment_sum(msgs, edge_dst.astype(jnp.int32), n,
                       indices_are_sorted=True)


def cumsum_sorted_segment_sum(
    msgs: jnp.ndarray,  # [E, K]
    seg: jnp.ndarray,   # [E] i32 SORTED segment ids (>= n_segments: pad)
    n_segments: int,
) -> jnp.ndarray:
    """Segment-sum of a sorted stream as prefix-sum + boundary gather:

        S = cumsum(msgs);  out[s] = S[hi_s - 1] - S[lo_s - 1]

    Pure XLA (no scatter): one cumsum pass over the edge stream + two
    [n_segments] gathers. An A/B alternative to the Pallas one-hot-MXU
    kernel (ops/pallas_segment.py) for the SHMP hot reduction — VPU
    adds at stream bandwidth instead of MXU one-hot matmuls. f32
    accumulation; for bf16-scale inputs the prefix-sum cancellation
    error (~sqrt(E) ulps) sits far below input precision.
    """
    s32 = seg.astype(jnp.int32)
    cs = jnp.cumsum(msgs.astype(jnp.float32), axis=0)
    bounds = jnp.arange(n_segments + 1, dtype=jnp.int32)
    offs = jnp.searchsorted(s32, bounds, method="scan_unrolled")
    padded = jnp.concatenate(
        [jnp.zeros((1, msgs.shape[1]), cs.dtype), cs], axis=0)
    return (jnp.take(padded, offs[1:], axis=0)
            - jnp.take(padded, offs[:-1], axis=0))


def cumsum_typed_transform_aggregate(
    x: jnp.ndarray,          # [N, H]
    conv_w: jnp.ndarray,     # [T, H, K]
    edge_src: jnp.ndarray,   # [E]
    edge_dst: jnp.ndarray,   # [E] (dst,type)-sorted => dst monotone
    edge_type: jnp.ndarray,  # [E]
    n_types: int,
) -> jnp.ndarray:
    """typed_transform_aggregate with the cumsum reduction (agg_mode
    'cumsum'). Pad edges point src at the zero pad node, so their rows
    vanish from every segment difference."""
    n = x.shape[0]
    y = jnp.einsum("nh,thk->tnk", x, conv_w)
    flat = y.reshape(n_types * n, conv_w.shape[2])
    idx = edge_type.astype(jnp.int32) * n + edge_src.astype(jnp.int32)
    msgs = jnp.take(flat, idx, axis=0, fill_value=0.0)
    return cumsum_sorted_segment_sum(msgs, edge_dst.astype(jnp.int32), n)


def graph_pool_sum(
    node_emb: jnp.ndarray,   # [N, H]
    node_graph: jnp.ndarray,  # [N] i32, pad nodes -> n_graphs
    n_graphs: int,
) -> jnp.ndarray:
    """global_add_pool: [G, H]; pad nodes land in segment G (sliced off)."""
    pooled = segment_sum(node_emb, node_graph, n_graphs + 1,
                         indices_are_sorted=True)
    return pooled[:n_graphs]
