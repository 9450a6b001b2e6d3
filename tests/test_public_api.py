"""The documented library boundary: `from desco_tpu import ...` exposes
the graph container, query machinery, canonical partition, exact
counting, and the serving facade (lazy, so `import desco_tpu` stays
cheap). Mirrors the smoke flow in .claude/skills/verify/SKILL.md."""

import networkx as nx
import numpy as np
import pytest


def test_lazy_exports_resolve():
    import desco_tpu

    for name in desco_tpu.__all__:
        assert getattr(desco_tpu, name) is not None
    with pytest.raises(AttributeError):
        desco_tpu.no_such_symbol


def test_karate_club_flow():
    from desco_tpu import (
        Graph, canonical_counts, extract_all_neighborhoods, gen_queries,
        gen_query_ids, graphlet_counts,
    )

    g = Graph.from_networkx(nx.karate_club_graph())
    queries = gen_queries(gen_query_ids([3]))
    col = graphlet_counts(g, queries)
    # query index 0 = wedge (atlas id 6), index 1 = triangle (id 7)
    assert col[0] == 393 and col[1] == 45

    cc = canonical_counts(g, queries)
    neighs, index, indicator = extract_all_neighborhoods([g], depth=4)
    per_node = np.zeros_like(cc)
    for nb in neighs:
        per_node[nb.vid] = canonical_counts(nb.graph, queries)[nb.canonical]
    np.testing.assert_array_equal(per_node, cc)
