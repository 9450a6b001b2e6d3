"""Node-feature (labeled) mode: labeled VF2 truth, query label expansion,
featured samples."""

import numpy as np
import pytest

from desco_tpu.data.workload import Workload
from desco_tpu.graph import Graph, gen_queries, gen_query_ids
from desco_tpu.graph.atlas import expand_query_labels
from desco_tpu.truth.vf2 import count_induced_embeddings, symmetric_factor

from conftest import random_graph


def test_expand_query_labels():
    tri = Graph(3, np.array([[0, 1], [1, 2], [0, 2]]))
    variants = expand_query_labels(tri, 2)
    assert len(variants) == 8
    for v in variants:
        assert v.node_feat.shape == (3, 2)
        np.testing.assert_allclose(v.node_feat.sum(-1), 1.0)


def test_labeled_symmetric_factor():
    tri = Graph(3, np.array([[0, 1], [1, 2], [0, 2]]))
    # all-same labels: full automorphism group
    assert symmetric_factor(tri, np.array([0, 0, 0])) == 6
    # one distinct label: only the swap of the two same-labeled nodes
    assert symmetric_factor(tri, np.array([0, 0, 1])) == 2
    assert symmetric_factor(tri, np.array([0, 1, 2])) == 1


def test_labeled_counts_sum_to_unlabeled(rng):
    """Summing labeled counts over all label assignments of a query must
    equal the unlabeled count (each embedding matches exactly one
    assignment)."""
    g = random_graph(rng, 10, 0.35)
    labels = rng.integers(0, 2, g.n_nodes).astype(np.int32)
    tri = Graph(3, np.array([[0, 1], [1, 2], [0, 2]]))
    unlabeled = count_induced_embeddings(g, tri)
    total = 0
    for v in expand_query_labels(tri, 2):
        ql = v.node_feat.argmax(-1).astype(np.int32)
        total += count_induced_embeddings(g, tri, None, labels, ql)
    assert total == unlabeled


def test_workload_labeled_groundtruth(tmp_path, rng):
    graphs = []
    for _ in range(3):
        g = random_graph(rng, 9, 0.3)
        g.node_feat = np.eye(2, dtype=np.float32)[
            rng.integers(0, 2, g.n_nodes)]
        graphs.append(g)
    wl = Workload(graphs, root=str(tmp_path), name="lab")
    base = gen_queries(gen_query_ids([3]))
    queries = [v for q in base for v in expand_query_labels(q, 2)]
    truth = wl.compute_groundtruth_labeled(queries)
    assert truth.shape == (wl.total_nodes, len(queries))
    np.testing.assert_array_equal(truth, np.round(truth))  # integral
    # raw labeled counts (count * |Aut_labeled|) sum over label variants
    # to the raw unlabeled count (count * |Aut|)
    unlabeled = wl.compute_groundtruth(gen_query_ids([3]), use_cache=False)
    sf_v = np.array([symmetric_factor(v, v.node_feat.argmax(-1))
                     for v in queries], np.float64)
    sf_base = np.array([symmetric_factor(q) for q in base], np.float64)
    raw_v = (truth * sf_v).reshape(wl.total_nodes, len(base), -1).sum(-1)
    np.testing.assert_allclose(raw_v, unlabeled * sf_base)
    # cache roundtrip
    truth2 = wl.compute_groundtruth_labeled(queries)
    np.testing.assert_array_equal(truth, truth2)
