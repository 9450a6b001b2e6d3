"""Query graph machinery: atlas ids, query generation.

The standard DeSCo workload is the 29 connected queries of size 3-5 from
the networkx graph atlas (atlas ids 6..52). Semantics mirror
``gen_query_ids`` (/root/reference/subgraph_counting/data.py:37-58) and
``graph_atlas_plus`` (workload.py:1128-1671): ids below 1253 resolve via
``nx.graph_atlas``; the hand-crafted 8-14-node benchmark patterns at ids
8000-14004 resolve via ``atlas_plus_data.EDGELIST_PLUS`` (reachable
end-to-end through the ``--query_ids`` CLI flag and
analysis/compute_groundtruth.py).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import networkx as nx
import numpy as np

from .container import Graph

_ATLAS_SCAN_END = 209  # covers all graphs up to 7 nodes


_QUERY_ID_MEMO: Dict[tuple, List[int]] = {}


def gen_query_ids(query_sizes: List[int]) -> List[int]:
    """Atlas ids of all *connected* graphs whose size is in ``query_sizes``.

    For sizes [3, 4, 5] this yields the 29 standard queries. Memoized:
    ``nx.graph_atlas`` re-parses the gzipped atlas table on every call
    (~200 ms for the scan), and config properties consult this dozens of
    times per pipeline run.
    """
    key = tuple(query_sizes)
    hit = _QUERY_ID_MEMO.get(key)
    if hit is not None:
        return list(hit)
    by_size: Dict[int, List[int]] = defaultdict(list)
    for i in range(6, _ATLAS_SCAN_END):
        g = nx.graph_atlas(i)
        if nx.is_connected(g):
            by_size[len(g)].append(i)
        if len(g) > max(query_sizes):
            break
    out: List[int] = []
    for size, ids in by_size.items():
        if size in query_sizes:
            out.extend(ids)
    _QUERY_ID_MEMO[key] = out
    return list(out)


_ATLAS_PLUS_MEMO: Dict[int, nx.Graph] = {}


def graph_atlas_plus(query_id: int) -> nx.Graph:
    """Atlas lookup extended with the hand-crafted 8-14-node benchmark
    patterns at ids 8000-14004 (graph_atlas_plus semantics,
    workload.py:1128-1671; pattern data in atlas_plus_data).

    Memoized (copies returned — callers may decorate the nx graph):
    each ``nx.graph_atlas(i)`` call re-parses the atlas up to id i."""
    if query_id < 1253:
        hit = _ATLAS_PLUS_MEMO.get(query_id)
        if hit is None:
            hit = nx.convert_node_labels_to_integers(
                nx.graph_atlas(query_id))
            _ATLAS_PLUS_MEMO[query_id] = hit
        return hit.copy()
    from .atlas_plus_data import EDGELIST_PLUS

    if query_id in EDGELIST_PLUS:
        g = nx.Graph()
        g.add_edges_from(EDGELIST_PLUS[query_id])
        g.add_nodes_from(range(query_id // 1000))
        return g
    raise KeyError(f"unknown extended atlas id {query_id}")


def gen_queries(query_ids: List[int]) -> List[Graph]:
    """Queries as host Graphs, nodes 0..k-1."""
    return [Graph.from_networkx(graph_atlas_plus(i)) for i in query_ids]


def query_sizes(query_ids: List[int]) -> np.ndarray:
    return np.array([graph_atlas_plus(i).number_of_nodes() for i in query_ids])


def expand_query_labels(q: Graph, n_labels: int) -> List[Graph]:
    """All ``n_labels ** k`` node-labeled variants of a query, as Graphs
    with one-hot ``node_feat`` — the reference's node-featured query
    expansion (add_node_feat_to_networkx, utils.py:258-272). Exponential;
    only sensible for small label sets."""
    import itertools

    eye = np.eye(n_labels, dtype=np.float32)
    out = []
    for assign in itertools.product(range(n_labels), repeat=q.n_nodes):
        g = Graph(q.n_nodes, q.edges.copy(), eye[list(assign)])
        out.append(g)
    return out


def groupby_size(query_ids: List[int]) -> List[List[int]]:
    """Group query indices by query size, sizes ascending — the grouping
    used for the paper's per-size normed-MSE metric (main.py:463-469)."""
    sizes = query_sizes(query_ids)
    out = []
    for s in sorted(set(sizes.tolist())):
        out.append([int(i) for i in np.nonzero(sizes == s)[0]])
    return out
