"""Order-4 edge-orbit counting (the orca replacement): exact parity
against brute-force enumeration of all 3-/4-node induced subgraphs."""

import itertools

import numpy as np

from desco_tpu.graph.orbits import (
    N_ORDER4_TYPES,
    _G4,
    _ORBIT4,
    edge_orbit_counts,
    order4_edge_types,
)

from conftest import random_graph


def brute_force_orbits(g):
    adj = [set() for _ in range(g.n_nodes)]
    for a, b in g.edges:
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    eid = {}
    for i, (a, b) in enumerate(g.edges):
        a, b = int(a), int(b)
        eid[(min(a, b), max(a, b))] = i
    out = np.zeros((len(g.edges), 13), np.int64)
    out[:, 0] = 1
    for k in (3, 4):
        for sub in itertools.combinations(range(g.n_nodes), k):
            deg = {v: sum(1 for w in sub if w in adj[v]) for v in sub}
            if min(deg.values()) == 0:
                continue
            # connectivity check (degree > 0 is not enough at k=4)
            seen = {sub[0]}
            stack = [sub[0]]
            while stack:
                v = stack.pop()
                for w in sub:
                    if w in adj[v] and w not in seen:
                        seen.add(w)
                        stack.append(w)
            if len(seen) < k:
                continue
            if k == 3:
                tri = min(deg.values()) == 2
                for a, b in itertools.combinations(sub, 2):
                    if b in adj[a]:
                        out[eid[(min(a, b), max(a, b))],
                            2 if tri else 1] += 1
            else:
                name = _G4[tuple(sorted(deg.values()))]
                for a, b in itertools.combinations(sub, 2):
                    if b in adj[a]:
                        orb = _ORBIT4[
                            (name, tuple(sorted((deg[a], deg[b]))))]
                        out[eid[(min(a, b), max(a, b))], orb] += 1
    return out


def test_edge_orbits_match_brute_force(rng):
    for trial in range(3):
        g = random_graph(rng, 14, 0.3)
        got = edge_orbit_counts(g)
        ref = brute_force_orbits(g)
        np.testing.assert_array_equal(got, ref)


def test_edge_orbits_known_small_graphs():
    from desco_tpu.graph.container import Graph

    # K4: every edge is in 1 K4, 2 diamonds-chord? No: induced subgraphs
    # of K4 of size 4 = K4 itself; size-3 subsets are all triangles
    k4 = Graph(4, np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3),
                            (2, 3)], np.int32))
    c = edge_orbit_counts(k4)
    assert (c[:, 2] == 2).all()    # each edge in 2 triangles
    assert (c[:, 12] == 1).all()   # one K4
    assert c[:, 3:12].sum() == 0   # no other 4-node graphlets (induced)

    # C4: each edge in one C4, two induced P3... per edge: P3 count =
    # subgraphs {edge + one neighbor} -> 2 per edge; P4-end: each edge
    # is an end edge of... C4 has no induced P4 (any 4 nodes = the C4)
    c4 = Graph(4, np.array([(0, 1), (1, 2), (2, 3), (3, 0)], np.int32))
    c = edge_orbit_counts(c4)
    assert (c[:, 6] == 1).all()
    assert (c[:, 1] == 2).all()
    assert c[:, 2].sum() == 0 and c[:, 3:6].sum() == 0

    # star K1,3: every edge is in 1 claw and 2 P3s
    star = Graph(4, np.array([(0, 1), (0, 2), (0, 3)], np.int32))
    c = edge_orbit_counts(star)
    assert (c[:, 5] == 1).all()
    assert (c[:, 1] == 2).all()


def test_order4_edge_types_priority_and_range(rng):
    g = random_graph(rng, 16, 0.3)
    t = order4_edge_types(g)
    assert t.shape == (len(g.edges),)
    assert t.min() >= 0 and t.max() < N_ORDER4_TYPES
    counts = edge_orbit_counts(g)
    # any edge inside a K4 must take the top type
    in_k4 = counts[:, 12] > 0
    assert (t[in_k4] == 10).all()


def test_order4_shmp_forward_smoke(rng):
    """Order-4 SHMP end-to-end: orbit-typed neighborhood sample through
    the full SHMP core (33 edge types) gives finite embeddings."""
    import jax
    import numpy as np

    from desco_tpu.batch.build import neighborhood_sample
    from desco_tpu.batch.packed import auto_capacities, pack_samples
    from desco_tpu.graph import canonical_neighborhood
    from desco_tpu.models.shmp_gnn import (
        apply_shmp_core,
        init_shmp,
        neighborhood_target_config,
    )

    g = random_graph(rng, 24, 0.25)
    nb = canonical_neighborhood(g, g.n_nodes - 1, depth=4)
    s = neighborhood_sample(nb, order=4)
    assert s.edge_type.max() < 33
    cfg = neighborhood_target_config(order=4, layer_num=2, hidden_dim=8)
    params = init_shmp(jax.random.PRNGKey(0), cfg)
    [b] = pack_samples([s], *auto_capacities([s], g_cap=1))
    out = np.asarray(apply_shmp_core(params, cfg, b))
    assert np.all(np.isfinite(out))
    assert np.abs(out).sum() > 0


def test_order4_pipeline_plumbing(rng, tmp_path):
    """--neigh_order 4 flows PipelineConfig -> model_configs (33 edge
    types) -> prepare_stage_data (orbit-typed samples) -> forward."""
    import jax
    import numpy as np

    from desco_tpu.models.neighborhood import (
        forward_counts,
        init_neighborhood_model,
    )
    from desco_tpu.pipeline import (
        PipelineConfig,
        build_query_batch,
        model_configs,
        prepare_stage_data,
    )
    from tests.conftest import random_graph

    cfg = PipelineConfig(order=4, neigh_layer_num=2, neigh_hidden_dim=8,
                         depth=2, query_sizes=(3,),
                         data_root=str(tmp_path))
    tgt, qry = model_configs(cfg)
    assert tgt.n_edge_types == 33
    graphs = [random_graph(rng, 12, 0.3) for _ in range(3)]
    stage = prepare_stage_data(cfg, graphs, "o4", need_truth=False)
    types = np.concatenate([np.asarray(s.edge_type)
                            for s in stage.samples])
    assert types.max() < 33
    assert len(np.unique(types)) > 2  # orbit classes actually vary
    params = init_neighborhood_model(jax.random.PRNGKey(0), tgt, qry)
    qb = build_query_batch(cfg)
    out = forward_counts(params, tgt, qry, stage.batches[0], qb)
    assert np.all(np.isfinite(np.asarray(out)))
