"""Combinatorial upper bounds for neighborhood counts (truth/bounds.py):
soundness vs the exact VF2 truth on random graphs, all 29 queries."""

import numpy as np

from desco_tpu.batch.build import neighborhood_sample
from desco_tpu.batch.packed import auto_capacities, pack_samples
from desco_tpu.data.synthetic import generate_synthetic
from desco_tpu.graph.atlas import gen_queries, gen_query_ids
from desco_tpu.graph.canonical import extract_all_neighborhoods
from desco_tpu.truth.bounds import (
    clamp_counts,
    neighborhood_count_bounds,
    tree_schedules,
)
from desco_tpu.truth.vf2 import canonical_counts


def test_tree_schedules_shape():
    queries = gen_queries(gen_query_ids([3, 4, 5]))
    for q in queries:
        scheds = tree_schedules(q)
        assert len(scheds) == q.n_nodes
        for s in scheds:
            assert len(s) == q.n_nodes - 1
            done = set()
            for child, parent in s:
                # bottom-up: a node's subtree is complete before it is
                # consumed as a child
                assert child not in done
                done.add(child)


def test_bounds_dominate_truth():
    queries = gen_queries(gen_query_ids([3, 4, 5]))
    graphs = generate_synthetic(6, min_size=10, max_size=40, seed=7)
    neighs, nindex, _ = extract_all_neighborhoods(graphs, depth=4)

    samples = [neighborhood_sample(nb) for nb in neighs]
    caps = auto_capacities(samples, g_cap=64)
    batches = pack_samples(samples, *caps, n_queries=len(queries))
    ubs = neighborhood_count_bounds(batches, queries)
    assert ubs.shape == (len(neighs), len(queries))

    truth = np.stack([
        canonical_counts(nb.graph, queries)[nb.canonical] for nb in neighs
    ])
    # soundness: bound >= exact canonical count everywhere (small f32
    # slack for the DP arithmetic)
    assert np.all(ubs >= truth * (1 - 1e-5) - 1e-4), (
        (ubs - truth).min())

    # clamping exact truth is a no-op
    clamped = clamp_counts(truth.astype(np.float32), ubs)
    np.testing.assert_allclose(clamped, truth.astype(np.float32),
                               rtol=1e-6)

    # and an absurd prediction gets pulled to the bound
    crazy = np.full_like(truth, 5e8, dtype=np.float32)
    assert np.all(clamp_counts(crazy, ubs) <= ubs)
