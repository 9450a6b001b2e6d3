"""Native C++ host kernels vs the pure-Python implementations."""

import numpy as np
import pytest

from desco_tpu.graph import Graph, extract_all_neighborhoods, gen_queries, gen_query_ids
from desco_tpu.graph.triangles import triangle_edge_mask
from desco_tpu.truth import canonical_counts, count_induced_embeddings, symmetric_factor
from desco_tpu.truth.native import (
    extract_neighborhoods_native,
    native_available,
    parallel_canonical_counts,
    symmetric_factor_native,
    triangle_mask_native,
    vf2_count_native,
)

from conftest import random_graph

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable")


def test_vf2_native_vs_python(rng):
    queries = gen_queries(gen_query_ids([3, 4, 5]))
    for trial in range(3):
        g = random_graph(rng, 14, 0.3)
        for q in queries:
            per_n = np.zeros(g.n_nodes, dtype=np.int64)
            per_p = np.zeros(g.n_nodes, dtype=np.int64)
            tn = vf2_count_native(g, q, per_n)
            tp = count_induced_embeddings(g, q, per_p)
            assert tn == tp
            np.testing.assert_array_equal(per_n, per_p)


def test_symmetric_factor_native():
    for q in gen_queries(gen_query_ids([3, 4, 5])):
        assert symmetric_factor_native(q) == symmetric_factor(q)


def test_vf2_labeled(rng):
    # labeled matching: triangle with labels [0,0,1] in a labeled K4
    k4 = Graph(4, np.array([(i, j) for i in range(4) for j in range(i + 1, 4)]))
    tri = Graph(3, np.array([[0, 1], [1, 2], [0, 2]]))
    tlab = np.array([0, 0, 1, 1], dtype=np.int32)
    qlab = np.array([0, 0, 1], dtype=np.int32)
    n = vf2_count_native(k4, tri, None, tlab, qlab)
    # choose the 0-0 pair (1 way, 2 orderings) x one of two 1-nodes = 4
    assert n == 4


def test_parallel_canonical_counts(rng):
    targets = [random_graph(rng, 12, 0.3) for _ in range(4)]
    queries = gen_queries(gen_query_ids([3, 4]))
    res = parallel_canonical_counts(targets, queries, num_workers=4)
    for t, r in zip(targets, res):
        np.testing.assert_allclose(r, canonical_counts(t, queries))


def test_extract_neighborhoods_native(rng):
    for trial in range(3):
        g = random_graph(rng, 20, 0.15)
        sizes, flat = extract_neighborhoods_native(g, depth=4)
        neighs, index, indicator = extract_all_neighborhoods([g], depth=4)
        np.testing.assert_array_equal(sizes > 0, indicator)
        off = 0
        it = iter(neighs)
        for v in range(g.n_nodes):
            if sizes[v] == 0:
                continue
            nb = next(it)
            nodes = flat[off:off + sizes[v]]
            off += sizes[v]
            np.testing.assert_array_equal(np.sort(nb.nodes), nodes)
            assert nodes[-1] == v  # ascending, canonical last
        assert off == len(flat)


def test_triangle_mask_native(rng):
    for trial in range(5):
        g = random_graph(rng, 25, 0.2)
        np.testing.assert_array_equal(
            triangle_mask_native(g), triangle_edge_mask(g))


def test_prepare_samples_native_parity(rng):
    """Fused native sample prep == the Python chain (extract ->
    induced_subgraph -> triangle typing -> directed expansion) for node
    lists exactly and edges as (src, dst, type) multisets (the packer
    re-sorts edges by (dst, type) downstream)."""
    from desco_tpu.batch.build import neighborhood_sample
    from desco_tpu.truth.native import prepare_samples_native

    for depth in (2, 4):
        for trial in range(4):
            g = random_graph(rng, 30, 0.12)
            sizes, esizes, nodes, src, dst, et = prepare_samples_native(
                g, depth)
            neighs, index, indicator = extract_all_neighborhoods(
                [g], depth=depth)
            np.testing.assert_array_equal(sizes > 0, indicator)
            no = np.concatenate([[0], np.cumsum(sizes[sizes > 0])])
            eo = np.concatenate([[0], np.cumsum(esizes[sizes > 0])])
            for i, nb in enumerate(neighs):
                s = neighborhood_sample(nb)
                np.testing.assert_array_equal(nodes[no[i]:no[i + 1]],
                                              nb.nodes)
                a = np.stack([s.edge_src, s.edge_dst, s.edge_type], 1)
                b = np.stack([src[eo[i]:eo[i + 1]], dst[eo[i]:eo[i + 1]],
                              et[eo[i]:eo[i + 1]]], 1)
                np.testing.assert_array_equal(a[np.lexsort(a.T)],
                                              b[np.lexsort(b.T)])
