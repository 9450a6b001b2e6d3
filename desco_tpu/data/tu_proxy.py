"""Structural proxies for the TU benchmark suite.

The reference's headline table (README.md:76-83) evaluates on five TU
datasets — MUTAG, COX2, ENZYMES, IMDB-BINARY, MSRC-21 — whose raw files
cannot be materialized in this environment (no network egress, and the
reference repo does not vendor them). These generators produce *honest
structural proxies*: synthetic families whose published summary
statistics (graph count, size range, mean nodes/edges, structural
character) match the corresponding TU dataset, so the cross-distribution
claim (train on Syn_1827 -> test on molecule/protein/ego-net/superpixel
graphs) can still be exercised end-to-end. They are clearly NOT the real
benchmarks; results on them are labeled as proxies everywhere they are
reported.

Families:

* ``ChemProxy`` (MUTAG-like, 188 graphs): fused 5/6-rings + pendant
  chains, valence cap 4 — mutagenic small molecules are ring systems
  with nitro/methyl decorations. Target stats n~17.9, m~19.8, n in
  [10, 28].
* ``ChemBigProxy`` (COX2-like, 467 graphs): same chemistry at COX2
  scale (n~41.2, m~43.5).
* ``GeoProxy`` (ENZYMES-like, 600 graphs): random geometric graphs —
  protein secondary-structure-element adjacency is contact-radius
  driven (n~32.6, m~62.1).
* ``EgoProxy`` (IMDB-BINARY-like, 1000 graphs): overlapping actor
  cliques (one clique per movie over a shared cast) — IMDB ego-nets
  are unions of near-cliques (n~19.8, m~96.5, very dense).
* ``SuperpixelProxy`` (MSRC-21-like, 563 graphs): Delaunay triangulation
  of jittered points, thinned to the published density — superpixel
  region-adjacency graphs are planar meshes (n~77.5, m~198.3).

All generators are deterministic in ``seed`` and disk-cached in the
reference's TU raw format via the same writer used for ``Syn_N``
(synthetic.py), so ground-truth caches key on stable content.
"""

from __future__ import annotations

from typing import List

import networkx as nx
import numpy as np

from ..graph.container import Graph


def _lognormal_size(rng: np.random.Generator, mean: float,
                    lo: int, hi: int, sigma: float = 0.45) -> int:
    """Right-skewed graph-size sampler whose mean tracks ``mean``
    (TU size histograms are lognormal-ish: many small, a long tail)."""
    mu = np.log(mean) - 0.5 * sigma * sigma
    return int(np.clip(round(rng.lognormal(mu, sigma)), lo, hi))


# --------------------------------------------------------------------- #
# chemistry-like: fused rings + pendants, valence-capped
# --------------------------------------------------------------------- #

def _gen_molecule(rng: np.random.Generator, target_n: int) -> nx.Graph:
    """One molecule-like graph: a fused/bridged ring system grown to
    ``target_n`` atoms with degree-capped pendant chains."""
    g = nx.Graph()

    def ring_size() -> int:
        return 6 if rng.random() < 0.7 else 5

    # first ring
    k = ring_size()
    g.add_edges_from((i, (i + 1) % k) for i in range(k))
    n_rings = 1 + int(rng.integers(0, max(1, target_n // 7)))
    for _ in range(n_rings - 1):
        if g.number_of_nodes() + 4 > target_n:
            break
        k = ring_size()
        if rng.random() < 0.6:
            # fuse: share an existing edge whose endpoints can take one
            # more bond each (aromatic fusion, naphthalene-style)
            cands = [(u, v) for u, v in g.edges()
                     if g.degree[u] <= 2 and g.degree[v] <= 2]
            if not cands:
                cands = list(g.edges())
            u, v = cands[int(rng.integers(len(cands)))]
            new = list(range(g.number_of_nodes(),
                             g.number_of_nodes() + k - 2))
            path = [u] + new + [v]
            g.add_edges_from(zip(path, path[1:]))
        else:
            # bridge: a fresh ring joined by a single bond (biphenyl-style)
            anchors = [x for x in g.nodes() if g.degree[x] < 3]
            a = (anchors[int(rng.integers(len(anchors)))] if anchors
                 else int(rng.integers(g.number_of_nodes())))
            base = g.number_of_nodes()
            ring = [base + i for i in range(k)]
            g.add_edges_from(
                (ring[i], ring[(i + 1) % k]) for i in range(k))
            g.add_edge(a, ring[0])
    # pendant chains (substituents) until the size target is met
    while g.number_of_nodes() < target_n:
        anchors = [x for x in g.nodes() if g.degree[x] < 4]
        if not anchors:
            break
        a = anchors[int(rng.integers(len(anchors)))]
        chain = 1 + int(rng.integers(0, 2))
        for _ in range(min(chain, target_n - g.number_of_nodes())):
            b = g.number_of_nodes()
            g.add_edge(a, b)
            a = b
    return g


def generate_chem_proxy(
    num_graphs: int, seed: int = 0,
    min_size: int = 10, max_size: int = 28, mean_size: float = 17.9,
) -> List[Graph]:
    """MUTAG-statistics fused-ring molecules (COX2 scale via params)."""
    rng = np.random.default_rng(seed)
    graphs: List[Graph] = []
    # triangular-ish distribution centered on the published mean
    lo, hi = min_size, max_size
    mode = min(max(mean_size, lo), hi)
    for _ in range(num_graphs):
        n = int(round(rng.triangular(lo, mode, hi)))
        g = _gen_molecule(rng, n)
        graphs.append(_to_graph(g, rng))
    return graphs


# --------------------------------------------------------------------- #
# geometric: protein-contact-like random geometric graphs
# --------------------------------------------------------------------- #

def generate_geo_proxy(
    num_graphs: int, seed: int = 0,
    min_size: int = 12, max_size: int = 96, mean_size: float = 32.6,
    avg_degree: float = 4.3,
) -> List[Graph]:
    """ENZYMES-statistics random geometric graphs (2D contact radius
    tuned per graph to the published average degree), forced connected
    by linking each non-giant component to its nearest giant node."""
    rng = np.random.default_rng(seed)
    graphs: List[Graph] = []
    for _ in range(num_graphs):
        n = _lognormal_size(rng, mean_size, min_size, max_size)
        pts = rng.random((n, 2))
        # expected degree of an RGG away from the border ~ n*pi*r^2
        r = float(np.sqrt(avg_degree / (np.pi * max(n - 1, 1))))
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        adj = (d2 <= r * r) & ~np.eye(n, dtype=bool)
        g = nx.from_numpy_array(adj.astype(np.int8))
        comps = sorted(nx.connected_components(g), key=len, reverse=True)
        giant = list(comps[0])
        for comp in comps[1:]:
            comp = list(comp)
            sub = d2[np.ix_(comp, giant)]
            i, j = np.unravel_index(int(np.argmin(sub)), sub.shape)
            g.add_edge(comp[i], giant[j])
            giant.extend(comp)
        graphs.append(_to_graph(g, rng))
    return graphs


# --------------------------------------------------------------------- #
# ego-nets: unions of overlapping cliques (actor collaboration)
# --------------------------------------------------------------------- #

def generate_ego_proxy(
    num_graphs: int, seed: int = 0,
    min_size: int = 12, max_size: int = 60, mean_size: float = 19.8,
) -> List[Graph]:
    """IMDB-BINARY-statistics ego networks: each graph is an actor's
    ego-net — one clique per movie over a shared, overlapping cast, plus
    the ego connected to everyone. Published stats n~19.8, m~96.5."""
    rng = np.random.default_rng(seed)
    graphs: List[Graph] = []
    for _ in range(num_graphs):
        n = _lognormal_size(rng, mean_size, min_size, max_size)
        g = nx.Graph()
        g.add_nodes_from(range(n))
        # node 0 is the ego; co-stars are 1..n-1
        others = np.arange(1, n)
        n_movies = 1 + int(rng.integers(1, 5))
        for _ in range(n_movies):
            cast = rng.choice(
                others, size=min(len(others),
                                 3 + int(rng.integers(2, 10))),
                replace=False)
            members = np.concatenate([[0], cast])
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    g.add_edge(int(members[i]), int(members[j]))
        # every co-star appeared with the ego in at least one movie
        for v in others:
            g.add_edge(0, int(v))
        graphs.append(_to_graph(g, rng))
    return graphs


# --------------------------------------------------------------------- #
# superpixels: thinned Delaunay meshes (region adjacency)
# --------------------------------------------------------------------- #

def generate_superpixel_proxy(
    num_graphs: int, seed: int = 0,
    min_size: int = 40, max_size: int = 140, mean_size: float = 77.5,
    target_degree: float = 5.1,
) -> List[Graph]:
    """MSRC-21-statistics planar meshes: Delaunay triangulation of
    jittered grid points, edges thinned (longest first) to the published
    average degree while keeping the graph connected."""
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    graphs: List[Graph] = []
    for _ in range(num_graphs):
        n = int(round(rng.triangular(min_size, mean_size, max_size)))
        side = int(np.ceil(np.sqrt(n)))
        xs, ys = np.meshgrid(np.arange(side), np.arange(side))
        pts = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64)
        pts = pts[rng.permutation(len(pts))[:n]]
        pts += rng.normal(0, 0.25, pts.shape)
        tri = Delaunay(pts)
        g = nx.Graph()
        g.add_nodes_from(range(n))
        for simplex in tri.simplices:
            a, b, c = (int(x) for x in simplex)
            g.add_edge(a, b)
            g.add_edge(b, c)
            g.add_edge(a, c)
        target_m = int(round(target_degree * n / 2))
        # drop longest edges first; skip bridges to stay connected
        lengths = sorted(
            ((float(((pts[u] - pts[v]) ** 2).sum()), u, v)
             for u, v in g.edges()),
            reverse=True)
        for _, u, v in lengths:
            if g.number_of_edges() <= target_m:
                break
            g.remove_edge(u, v)
            if not nx.is_connected(g):
                g.add_edge(u, v)
        graphs.append(_to_graph(g, rng))
    return graphs


# --------------------------------------------------------------------- #

def _to_graph(g: nx.Graph, rng: np.random.Generator) -> Graph:
    """Randomly relabel (node order must not leak generation order —
    same convention as synthetic.py) and convert to the Graph container."""
    n = g.number_of_nodes()
    perm = rng.permutation(n)
    edges = np.array(
        [(perm[u], perm[v]) for u, v in g.edges() if u != v],
        dtype=np.int32).reshape(-1, 2)
    return Graph(n, edges)


# registry: proxy name -> (generator, num_graphs kwargs)
TU_PROXY_RECIPES = {
    # name: (fn, default count, kwargs)
    "ChemProxy": (generate_chem_proxy, 188, {}),
    "ChemBigProxy": (generate_chem_proxy, 467, dict(
        min_size=26, max_size=56, mean_size=41.2)),
    "GeoProxy": (generate_geo_proxy, 600, {}),
    "EgoProxy": (generate_ego_proxy, 1000, {}),
    "SuperpixelProxy": (generate_superpixel_proxy, 563, {}),
}

# which real TU dataset each proxy imitates (for reporting)
TU_PROXY_OF = {
    "ChemProxy": "MUTAG",
    "ChemBigProxy": "COX2",
    "GeoProxy": "ENZYMES",
    "EgoProxy": "IMDB-BINARY",
    "SuperpixelProxy": "MSRC-21",
}


def load_or_generate_proxy(name: str, root: str, seed: int = 0
                           ) -> List[Graph]:
    """Disk-cached proxy dataset in the shared Syn raw format."""
    import os

    from .synthetic import read_edge_list_dataset

    fn, count, kwargs = TU_PROXY_RECIPES[name]
    raw = os.path.join(root, "raw")
    a_path = os.path.join(raw, "Syn_A.txt")
    ind_path = os.path.join(raw, "Syn_graph_indicator.txt")
    if os.path.exists(a_path) and os.path.exists(ind_path):
        return read_edge_list_dataset(a_path, ind_path)
    graphs = fn(count, seed=seed, **kwargs)
    os.makedirs(raw, exist_ok=True)
    with open(a_path, "w") as fa, open(ind_path, "w") as fi:
        off = 1
        for gid, g in enumerate(graphs):
            for _ in range(g.n_nodes):
                fi.write(f"{gid + 1}\n")
            for u, v in g.edges:
                fa.write(f"{u + off}, {v + off}\n")
                fa.write(f"{v + off}, {u + off}\n")
            off += g.n_nodes
    return graphs
