"""LRP baseline: permutation semantics, the factored contraction, and
learning. (Reference: LRP_dataset.py:315-390 preprocessing,
gnn_model.py:466-620 LRP_PURE_layer.)"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desco_tpu.batch.build import gossip_sample
from desco_tpu.batch.packed import auto_capacities, pack_samples
from desco_tpu.graph import Graph
from desco_tpu.models.lrp import (
    LRPConfig,
    _lrp_contract,
    apply_lrp_batch,
    init_lrp,
    lrp_arrays_for_batch,
    lrp_permutations,
)

from conftest import random_graph


def test_lrp_permutations_semantics(rng):
    """Sequences are [v] + ordered <=width neighbor subsets, adjacency
    pattern matches the graph, owner maps back to v."""
    g = Graph(4, np.array([(0, 1), (0, 2), (0, 3), (1, 2)], np.int32))
    pn, pa, po = lrp_permutations(g, sub_len=4, width=3)
    # node 0 has 3 neighbors -> 3! = 6 ordered width-3 sequences
    rows0 = pn[po == 0]
    assert len(rows0) == 6
    assert all(r[0] == 0 for r in rows0)
    assert {tuple(sorted(r[1:])) for r in rows0} == {(1, 2, 3)}
    # adjacency pattern: slot pair adjacent iff edge in g
    row = rows0[0]
    a = pa[po == 0][0]
    for i in range(4):
        for j in range(4):
            u, v = row[i], row[j]
            expect = float(
                u >= 0 and v >= 0 and
                ((min(u, v), max(u, v)) in {(0, 1), (0, 2), (0, 3),
                                            (1, 2)}))
            assert a[i, j] == expect
    # degree-1 node (3): only one neighbor -> k=1, a single sequence
    rows3 = pn[po == 3]
    assert len(rows3) == 1 and rows3[0][0] == 3 and rows3[0][1] == 0


def test_factored_contraction_matches_dense(rng):
    """_lrp_contract == the dense [P, S*S*H] @ W contraction it
    replaced (the memory-safe refactor must be exact)."""
    s, h, c = 4, 8, 8
    P = 13
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (h, c, s * s))
    e0 = jax.random.normal(jax.random.fold_in(key, 1), (h,))
    diag = jax.random.normal(jax.random.fold_in(key, 2), (P, s, h))
    adj = (jax.random.uniform(jax.random.fold_in(key, 3),
                              (P, s, s)) > 0.5).astype(jnp.float32)
    adj = adj * (1.0 - jnp.eye(s))  # no self loops, like the host arrays

    got = _lrp_contract(w, e0, diag, adj, s)

    eye = jnp.eye(s)
    off = adj[..., None] * e0
    nf = (eye[None, :, :, None] * diag[:, :, None, :]
          + (1.0 - eye)[None, :, :, None] * off)
    nf = nf.reshape(P, s * s * h)
    w2 = jnp.transpose(w, (2, 0, 1)).reshape(s * s * h, c)
    want = nf @ w2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _toy_batch(rng, n_graphs=12, n_q=3):
    graphs = [random_graph(rng, int(rng.integers(6, 12)), 0.4)
              for _ in range(n_graphs)]
    # targets: log2(edge count + 1)-style graph scalars per query
    samples = []
    for g in graphs:
        y = np.array([g.n_edges, g.n_nodes, g.n_edges * 2],
                     np.float32)[:n_q]
        s = gossip_sample(g, np.zeros((g.n_nodes, n_q), np.float32),
                          np.zeros((g.n_nodes, n_q), np.float32))
        import dataclasses

        s = dataclasses.replace(s, y=y[None, :].repeat(1, 0),
                                x=np.zeros((g.n_nodes, 1), np.float32))
        samples.append(s)
    caps = auto_capacities(samples, g_cap=n_graphs)
    [b] = pack_samples(samples, *caps, n_queries=n_q)
    return b


def test_lrp_learns_graph_statistics(rng):
    """A few Adam steps on the scaled init must fit simple graph-level
    targets (edge/node counts) — guards both init sanity and gradients
    through the factored contraction."""
    import optax

    b = _toy_batch(rng)
    cfg = LRPConfig(hid_dim=8, num_layers=2, num_tasks=3)
    pn, pa, po, dg = lrp_arrays_for_batch(b, cfg)
    pn, pa, po, dg = map(jnp.asarray, (pn, pa, po, dg))
    params = init_lrp(jax.random.PRNGKey(0), cfg)

    target = jnp.log2(jnp.asarray(b.y) + 1.0)
    m = jnp.asarray(b.graph_mask)

    def loss_fn(p):
        pred = apply_lrp_batch(p, cfg, b, pn, pa, po, dg)
        return (((pred - target) ** 2) * m[:, None]).sum() / m.sum()

    tx = optax.adam(3e-3)
    opt = tx.init(params)
    step = jax.jit(lambda p, o: (lambda l, g: (l, *_upd(tx, p, o, g)))(
        *jax.value_and_grad(loss_fn)(p)))
    l0 = float(loss_fn(params))
    assert np.isfinite(l0) and l0 < 1e3, f"init loss not sane: {l0}"
    for _ in range(60):
        l, params, opt = step(params, opt)
    assert float(l) < 0.5 * l0, (l0, float(l))


def _upd(tx, p, o, g):
    import optax

    u, o = tx.update(g, o, p)
    return optax.apply_updates(p, u), o
