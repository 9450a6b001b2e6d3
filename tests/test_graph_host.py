"""Host graph layer: container, canonical partition, triangle typing.

Oracles are networkx re-implementations of the reference semantics
(data.py:329-396, transforms.py:168-255), written independently here.
"""

import networkx as nx
import numpy as np
import pytest

from desco_tpu.graph import (
    Graph,
    canonical_neighborhood,
    extract_all_neighborhoods,
    gen_query_ids,
    gen_queries,
    groupby_size,
    triangle_edge_mask,
)
from desco_tpu.graph.triangles import triangle_edge_mask_dense

from conftest import random_graph


# ------------------------------------------------------------------ oracles
def nx_canonical_neighborhood(g: nx.Graph, v: int, depth: int):
    """Reference semantics of get_neigh_hetero: unrestricted BFS ball,
    then filter <= v, then component of v; None if edgeless."""
    ball = {v}
    frontier = {v}
    for _ in range(depth):
        nxt = set()
        for u in frontier:
            nxt.update(g.neighbors(u))
        frontier = nxt - ball
        ball |= frontier
    keep = {u for u in ball if u <= v}
    sub = g.subgraph(keep)
    for comp in nx.connected_components(sub):
        if v in comp:
            sub = sub.subgraph(comp)
            break
    if sub.number_of_edges() == 0:
        return None
    return sub


# ------------------------------------------------------------------- tests
def test_csr_neighbors(rng):
    g = random_graph(rng, 30, 0.2)
    ng = g.to_networkx()
    for v in range(30):
        assert set(g.neighbors(v).tolist()) == set(ng.neighbors(v))


def test_connected_component(rng):
    g = random_graph(rng, 40, 0.05)
    ng = g.to_networkx()
    for v in [0, 5, 39]:
        comp = set(g.connected_component_of(v).tolist())
        assert comp == nx.node_connected_component(ng, v)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_canonical_neighborhood_matches_reference_semantics(rng, depth):
    for trial in range(5):
        g = random_graph(rng, 25, 0.12)
        ng = g.to_networkx()
        for v in range(g.n_nodes):
            ours = canonical_neighborhood(g, v, depth)
            ref = nx_canonical_neighborhood(ng, v, depth)
            if ref is None:
                assert ours is None
                continue
            assert ours is not None
            assert set(ours.nodes.tolist()) == set(ref.nodes)
            # edge sets match (as original-id pairs)
            ours_edges = {
                tuple(sorted((ours.nodes[a], ours.nodes[b])))
                for a, b in ours.graph.edges
            }
            ref_edges = {tuple(sorted(e)) for e in ref.edges()}
            assert ours_edges == ref_edges
            # canonical node is v
            assert ours.nodes[ours.canonical] == v


def test_indicator_and_index(rng):
    graphs = [random_graph(rng, 15, 0.15) for _ in range(4)]
    neighs, index, indicator = extract_all_neighborhoods(graphs, depth=3)
    assert indicator.sum() == len(neighs) == index.shape[0]
    assert len(indicator) == sum(g.n_nodes for g in graphs)
    # node 0's neighborhood is always a single node -> dropped
    assert not indicator[0]


def test_triangle_mask(rng):
    for trial in range(10):
        g = random_graph(rng, 20, 0.2)
        fast = triangle_edge_mask(g)
        dense = triangle_edge_mask_dense(g)
        np.testing.assert_array_equal(fast, dense)


def test_triangle_mask_known():
    # triangle + pendant edge: triangle edges flagged, pendant not
    g = Graph(4, np.array([[0, 1], [1, 2], [0, 2], [2, 3]]))
    mask = triangle_edge_mask(g)
    np.testing.assert_array_equal(mask, [True, True, True, False])


def test_query_ids_standard():
    ids = gen_query_ids([3, 4, 5])
    assert len(ids) == 29  # the paper's 29 standard queries
    sizes = [len(nx.graph_atlas(i)) for i in ids]
    assert sorted(set(sizes)) == [3, 4, 5]
    assert sizes.count(3) == 2 and sizes.count(4) == 6 and sizes.count(5) == 21
    groups = groupby_size(ids)
    assert [len(g) for g in groups] == [2, 6, 21]


def test_gen_queries_connected():
    for q in gen_queries(gen_query_ids([3, 4])):
        assert nx.is_connected(q.to_networkx())
