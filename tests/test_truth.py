"""Ground-truth engine vs networkx VF2 oracle (reference uses nx
GraphMatcher directly — workload.py:327-348; we only use it as a test
oracle here)."""

import networkx as nx
import numpy as np
import pytest

from desco_tpu.graph import Graph, gen_queries, gen_query_ids
from desco_tpu.truth import (
    canonical_counts,
    count_induced_embeddings,
    graphlet_counts,
    symmetric_factor,
)

from conftest import random_graph


def nx_canonical_counts(target: nx.Graph, query: nx.Graph):
    gm = nx.algorithms.isomorphism.GraphMatcher(target, query)
    per = np.zeros(target.number_of_nodes(), dtype=np.int64)
    total = 0
    for vmap in gm.subgraph_isomorphisms_iter():
        per[max(vmap.keys())] += 1
        total += 1
    return per, total


TRIANGLE = Graph(3, np.array([[0, 1], [1, 2], [0, 2]]))
WEDGE = Graph(3, np.array([[0, 1], [1, 2]]))


def test_symmetric_factor():
    assert symmetric_factor(TRIANGLE) == 6
    assert symmetric_factor(WEDGE) == 2
    # 5-clique: 5! automorphisms
    k5 = Graph(5, np.array([(i, j) for i in range(5) for j in range(i + 1, 5)]))
    assert symmetric_factor(k5) == 120


def test_known_triangle_count():
    # K4 contains 4 triangles; per-triangle embeddings = 6
    k4 = Graph(4, np.array([(i, j) for i in range(4) for j in range(i + 1, 4)]))
    assert count_induced_embeddings(k4, TRIANGLE) == 24
    assert graphlet_counts(k4, [TRIANGLE])[0] == 4
    # K4 has no induced wedge (every wedge closes)
    assert graphlet_counts(k4, [WEDGE])[0] == 0


@pytest.mark.parametrize("size", [3, 4, 5])
def test_vs_networkx_oracle(rng, size):
    queries = gen_queries(gen_query_ids([size]))
    for trial in range(3):
        g = random_graph(rng, 12, 0.3)
        ng = g.to_networkx()
        for q in queries:
            per_ours = np.zeros(g.n_nodes, dtype=np.int64)
            total = count_induced_embeddings(g, q, per_ours)
            per_ref, total_ref = nx_canonical_counts(ng, q.to_networkx())
            assert total == total_ref
            np.testing.assert_array_equal(per_ours, per_ref)


def test_canonical_counts_integral_and_sum(rng):
    queries = gen_queries(gen_query_ids([3, 4]))
    g = random_graph(rng, 15, 0.25)
    cc = canonical_counts(g, queries)
    # symmetry division yields integers (data.py:299-304 invariant)
    np.testing.assert_array_equal(cc, np.round(cc))
    np.testing.assert_allclose(cc.sum(axis=0), graphlet_counts(g, queries))


def test_canonical_sums_match_neighborhood_counts(rng):
    """Canonical partition exactness: counting q in the canonical
    neighborhood of v with canonical-node attribution equals the per-node
    canonical count on the full graph."""
    from desco_tpu.graph import canonical_neighborhood

    queries = gen_queries(gen_query_ids([3]))
    g = random_graph(rng, 14, 0.3)
    full = canonical_counts(g, queries)
    for v in range(g.n_nodes):
        nb = canonical_neighborhood(g, v, depth=4)
        if nb is None:
            np.testing.assert_array_equal(full[v], 0)
            continue
        cc = canonical_counts(nb.graph, queries)
        # occurrences attributed to v inside the neighborhood: rows where
        # the neighborhood's canonical node is the max -> but attribution
        # inside the neighborhood uses *local* ids. The invariant that the
        # pipeline actually uses: total count of q anchored at v equals
        # count of q in the neighborhood anchored at the local canonical
        # node, where local node order preserves original order.
        local_canon = nb.canonical
        # node order in nb.graph preserves ascending original ids, and v is
        # the max original id -> v is the max local id
        assert local_canon == nb.graph.n_nodes - 1
        np.testing.assert_array_equal(full[v], cc[local_canon])


def test_sharded_truth_matches_full(rng, tmp_path):
    """Multi-host truth sharding: per-shard files merged by
    merge_groundtruth_shards equal the single-host computation, and the
    merged result lands in the canonical cache."""
    import os

    from desco_tpu.data.workload import Workload
    from desco_tpu.graph import gen_query_ids
    from tests.conftest import random_graph

    graphs = [random_graph(rng, n, 0.3) for n in (8, 10, 12, 9, 11)]
    qids = gen_query_ids([3, 4])
    full = Workload(graphs, root=str(tmp_path / "full"),
                    name="t").compute_groundtruth(qids, use_cache=False)

    wl = Workload(graphs, root=str(tmp_path / "sharded"), name="t")
    for k in range(3):
        wl.compute_groundtruth_shard(qids, k, 3)
    merged = wl.merge_groundtruth_shards(qids, 3, cleanup=True)
    np.testing.assert_array_equal(merged, full)
    assert os.path.exists(wl.groundtruth_path(qids))  # canonical cache
    assert not os.path.exists(wl.shard_path(qids, 0, 3))  # cleaned

    # a missing shard is a hard error, not silent zeros
    wl2 = Workload(graphs, root=str(tmp_path / "partial"), name="t")
    wl2.compute_groundtruth_shard(qids, 0, 2)
    import pytest

    with pytest.raises(FileNotFoundError):
        wl2.merge_groundtruth_shards(qids, 2)
