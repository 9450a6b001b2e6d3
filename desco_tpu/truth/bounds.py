"""Serving-side combinatorial upper bounds for neighborhood counts.

Stage-1 predictions de-log as ``2^pred - 1``; rare out-of-distribution
neighborhoods can de-log astronomically (round-1 RESULTS.md: one
neighborhood predicted 5e8 vs truth ~1e3, destroying the unrestricted
normed MSE). Every canonical count obeys exact combinatorics of its own
neighborhood, so predictions can be clamped at serving time without
touching training or parity semantics (the reference's identical 2^pred
de-log, lightning_model.py:195-222, has the same fragility — it is just
never evaluated on such graphs):

  count(Q in N anchored at v) = #induced-embeddings / |Aut(Q)|
    <= #homs(T -> N, some tree node at v) / |Aut(Q)|   (T spanning tree)
  and
    <= C(n-1, k-1) * k! / |Aut(Q)|                     (subset bound)

The tree bound holds because every (induced or not) embedding of Q
restricted to a spanning tree T is an injective homomorphism of T whose
image contains v; summing rooted-hom DP values over all rootings at v
over-counts that set. The DP's only primitive is an adjacency SpMV
(segment-sum over the packed edge stream), so it runs on device over
whole packed batches, one jit for all batches.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..batch.packed import PackedGraphs
from ..graph.container import Graph
from .vf2 import symmetric_factor


def _spanning_tree(q: Graph) -> List[Tuple[int, int]]:
    """BFS spanning tree from node 0: list of (child, parent) edges."""
    indptr, indices = q.csr()
    seen = {0}
    order = [0]
    edges: List[Tuple[int, int]] = []
    head = 0
    while head < len(order):
        u = order[head]
        head += 1
        for w in indices[indptr[u]:indptr[u + 1]]:
            w = int(w)
            if w not in seen:
                seen.add(w)
                order.append(w)
                edges.append((w, u))
    assert len(seen) == q.n_nodes, "query must be connected"
    return edges


def tree_schedules(q: Graph) -> List[List[Tuple[int, int]]]:
    """Per rooting r of the spanning tree: bottom-up (child, parent)
    edge schedule (children always processed before their parent)."""
    tree = _spanning_tree(q)
    adj: List[List[int]] = [[] for _ in range(q.n_nodes)]
    for a, b in tree:
        adj[a].append(b)
        adj[b].append(a)
    scheds = []
    for r in range(q.n_nodes):
        # BFS orientation away from r, then reverse for bottom-up order
        parent = {r: -1}
        order = [r]
        head = 0
        while head < len(order):
            u = order[head]
            head += 1
            for w in adj[u]:
                if w not in parent:
                    parent[w] = u
                    order.append(w)
        scheds.append([(u, parent[u]) for u in reversed(order[1:])])
    return scheds


def _hashable_schedules(queries: Sequence[Graph]):
    """Static (hashable) form: per query (k, rooting schedules)."""
    return tuple(
        (q.n_nodes, tuple(tuple(tuple(e) for e in s)
                          for s in tree_schedules(q)))
        for q in queries
    )


@partial(jax.jit, static_argnums=(1, 2))
def _batch_bounds(batch: PackedGraphs, schedules, canonical_type: int):
    """[G, Q] f32 per-graph upper bound at the canonical node."""
    n_cap, g_cap = batch.n_cap, batch.g_cap
    src = batch.edge_src.astype(jnp.int32)
    dst = batch.edge_dst.astype(jnp.int32)
    is_canon = ((batch.node_type == canonical_type)
                & (batch.node_mask > 0)).astype(jnp.float32)
    # graph sizes for the subset bound
    n_g = jax.ops.segment_sum(batch.node_mask, batch.node_graph,
                              num_segments=g_cap + 1)[:g_cap]

    def spmv(h):
        return jax.ops.segment_sum(jnp.take(h, src), dst,
                                   num_segments=n_cap)

    ones = batch.node_mask.astype(jnp.float32)
    cols = []
    for k, scheds in schedules:
        tot = jnp.zeros((n_cap,), jnp.float32)
        for sched in scheds:
            h = [ones] * k
            for child, parent in sched:
                h[parent] = h[parent] * spmv(h[child])
            root = sched[-1][1] if sched else 0
            tot = tot + h[root]
        tree_b = jax.ops.segment_sum(tot * is_canon, batch.node_graph,
                                     num_segments=g_cap + 1)[:g_cap]
        # C(n-1, k-1) * k!  (aut division happens on host)
        m = jnp.maximum(n_g - 1.0, 0.0)
        comb = jnp.ones_like(m)
        for i in range(k - 1):
            comb = comb * jnp.maximum(m - i, 0.0) / (i + 1.0)
        subset_b = comb * float(math.factorial(k))
        cols.append(jnp.minimum(tree_b, subset_b))
    return jnp.stack(cols, axis=1)


def neighborhood_count_bounds(
    batches: List[PackedGraphs], queries: Sequence[Graph],
    canonical_type: int = 1,
    labeled: bool = False,
) -> np.ndarray:
    """(#neighborhoods, Q) f32 upper bounds, rows in the same valid-graph
    order as ``predict_neighborhood_counts``.

    ``labeled``: divide by the LABEL-PRESERVING |Aut(q)| (queries carry
    one-hot node_feat) — the structural divisor is larger (e.g. a
    (0,0,1)-labeled triangle has Aut_struct=6 but Aut_lab=2), so an
    unlabeled divisor would make bounds up to Aut_struct/Aut_lab times
    too SMALL and clamp away correct labeled predictions."""
    schedules = _hashable_schedules(queries)
    auts = np.array([
        symmetric_factor(
            q, (q.node_feat.argmax(-1).astype(np.int32)
                if labeled else None))
        for q in queries], dtype=np.float32)
    out = []
    for b in batches:
        ub = np.asarray(_batch_bounds(jax.device_put(b), schedules,
                                      canonical_type))
        valid = np.asarray(b.graph_mask) > 0
        out.append(ub[valid])
    ubs = np.concatenate(out, axis=0) / auts[None, :]
    return ubs


def clamp_counts(counts: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Elementwise min with the combinatorial bound (counts are raw,
    de-logged). Never raises a prediction."""
    return np.minimum(counts, bounds.astype(counts.dtype))
