"""Synthetic training datasets.

Re-implements the reference's synthetic recipe
(/root/reference/subgraph_counting/syn_data.py:43-200, 479-746): six graph
families (ER, WS, uniform GNM, BA, extended BA, powerlaw-cluster) chosen
uniformly, parameterized by sampled (node count, edge count), forced
connected by joining components along a random tree, then randomly
relabeled. ``Syn_1827`` uses the stratified size/degree grid of
``_gen_Synthetic_1827`` (syn_data.py:658-746): 1380 graphs over sizes
10..69 x average degrees 1..12, plus 447 graphs over sizes 60..800 x
degrees 1..3.

Graphs are materialized once and cached on disk as edge-list text files
(mirroring DeSCoSyntheticDataset's raw format, data.py:665-750) so every
run sees the same dataset.
"""

from __future__ import annotations

import os
from math import sqrt
from typing import Callable, List, Optional

import networkx as nx
import numpy as np

from ..graph.container import Graph

_DELTA = 0.001
GENERATORS = ("ER", "WS", "Random", "BA", "EBA", "Power")


def _connect_components(g: nx.Graph, rng: np.random.Generator) -> nx.Graph:
    comps = [list(c) for c in nx.connected_components(g)]
    if len(comps) <= 1:
        return g
    # join components along a uniform random tree (random Prüfer sequence)
    k = len(comps)
    if k == 2:
        tree_edges = [(0, 1)]
    else:
        prufer = rng.integers(0, k, size=k - 2).tolist()
        tree_edges = list(nx.from_prufer_sequence(prufer).edges())
    for a, b in tree_edges:
        u = comps[a][rng.integers(len(comps[a]))]
        v = comps[b][rng.integers(len(comps[b]))]
        g.add_edge(u, v)
    return g


def _seeded(rng: np.random.Generator) -> int:
    return int(rng.integers(0, 2**31 - 1))


def gen_er(node: int, edge: int, rng) -> nx.Graph:
    p = 2 * edge / (node * (node - 1))
    g = nx.erdos_renyi_graph(node, p, seed=_seeded(rng))
    return _connect_components(g, rng)


def gen_ws(node: int, edge: int, rng, p: float = 0.1) -> nx.Graph:
    k = min(int(2 * edge / node), node - 1)
    try:
        return nx.connected_watts_strogatz_graph(node, k, p, seed=_seeded(rng))
    except nx.exception.NetworkXError:
        g = nx.gnm_random_graph(node, edge, seed=_seeded(rng))
        return _connect_components(g, rng)


def gen_random(node: int, edge: int, rng) -> nx.Graph:
    g = nx.gnm_random_graph(node, edge, seed=_seeded(rng))
    return _connect_components(g, rng)


def gen_ba(node: int, edge: int, rng) -> nx.Graph:
    m = min(max(int(edge / node), 1), node - 1)
    g = nx.barabasi_albert_graph(node, m, seed=_seeded(rng))
    return _connect_components(g, rng)


def _extended_ba(n: int, m: int, p: float, q: float,
                 rng: np.random.Generator) -> nx.Graph:
    """Fast extended Barabási–Albert model (Albert & Barabási 2000).

    Matches the *reference's fork* of nx's generator (syn_data.py:203-363),
    whose key change is that a new node is added EVERY iteration ("ALWAYS
    m new nodes") — with prob p additionally add m edges, with prob q
    additionally rewire m edges — so the process runs exactly n-m steps
    and total edges stay ~ m*n*(1+p) (nx's original only grows on the
    else-branch, which explodes in both runtime and density as p+q -> 1).
    Implemented with an O(1)-amortized repeated-node attachment list."""
    edges: set = set()
    edge_list: list = []
    attach: list = []  # node repeated by degree (preferential sampling)
    num_nodes = m

    def pref_target(exclude_u: int) -> int:
        for _ in range(8):
            t = (attach[rng.integers(len(attach))] if attach
                 else int(rng.integers(num_nodes)))
            if t != exclude_u:
                return t
        return -1

    def add_edge(u: int, v: int) -> bool:
        if u == v:
            return False
        key = (u, v) if u < v else (v, u)
        if key in edges:
            return False
        edges.add(key)
        edge_list.append(key)
        attach.extend((u, v))
        return True

    while num_nodes < n:
        r = rng.random()
        if r < p and num_nodes >= 2:
            # add m edges between existing nodes
            for _ in range(m):
                u = int(rng.integers(num_nodes))
                v = pref_target(u)
                if v >= 0:
                    add_edge(u, v)
        elif p <= r < p + q and edge_list:
            # rewire m edges: detach one endpoint, reattach preferentially
            for _ in range(m):
                if not edge_list:
                    break
                ei = int(rng.integers(len(edge_list)))
                u, v = edge_list[ei]
                w = pref_target(u)
                if w < 0 or ((u, w) if u < w else (w, u)) in edges:
                    continue
                edge_list[ei] = edge_list[-1]
                edge_list.pop()
                edges.discard((u, v))
                attach.remove(v)  # one degree decrement for v
                key = (u, w) if u < w else (w, u)
                edges.add(key)
                edge_list.append(key)
                attach.append(w)
        # ALWAYS add a new node with m preferential edges (the fork's
        # defining deviation from nx: no else)
        u = num_nodes
        num_nodes += 1
        made = 0
        for _ in range(4 * m):
            if made >= min(m, num_nodes - 1):
                break
            v = pref_target(u)
            if v >= 0 and add_edge(u, v):
                made += 1
        if made == 0 and num_nodes >= 2:
            add_edge(u, int(rng.integers(num_nodes - 1)))

    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(edge_list)
    return g


def gen_eba(node: int, edge: int, rng, q: float = 0.1) -> nx.Graph:
    m = min(max(int(edge / node), 1), node - 1)
    p = (edge - m * node) / node
    p = max(p, 0.0)
    if p + q >= 1:
        s = p + q
        p, q = p / s - _DELTA, q / s - _DELTA
    g = _extended_ba(node, m, p, q, rng)
    return _connect_components(g, rng)


def gen_power(node: int, edge: int, rng, p: float = 0.1) -> nx.Graph:
    if node ** 2 - 4 * edge > 0:
        m = int((node - sqrt(node ** 2 - 4 * edge)) / 2)
        if m > 1:
            p = (edge - (node - m) * m) / ((m - 1) * (node - m))
        else:
            p = 0.0
        while p < 0:
            m -= 1
            p = edge / ((node - m) * m) - 1
    else:
        m = int(node / 2)
        p = 0.0
    p = min(p, 1)
    m = max(m, 1)
    g = nx.powerlaw_cluster_graph(node, m, p, seed=_seeded(rng))
    return _connect_components(g, rng)


_GEN_FNS = {
    "ER": gen_er, "WS": gen_ws, "Random": gen_random,
    "BA": gen_ba, "EBA": gen_eba, "Power": gen_power,
}


def _syn_1827_samplers(rng: np.random.Generator):
    """The stratified Syn_1827 grid (syn_data.py:658-746)."""

    def node_num(sid: int) -> int:
        if sid < 60 * 23:
            return sid // 23 + 10
        node = 5 * ((sid - 1380) // 3) + 60
        return int(node + rng.triangular(-5, 0, 5))

    def avg_degree(sid: int) -> float:
        if sid < 60 * 23:
            return 0.5 * (sid % 23) + 1 + rng.triangular(-0.5, 0, 0.5)
        degree = (sid - 1380) % 3 + 1
        if degree == 1:
            return degree + rng.triangular(0, 0, 1)
        if degree == 2:
            return degree + rng.triangular(-1, 0, 1)
        return degree + rng.triangular(-1, 0, 0)

    return node_num, avg_degree


def _uniform_samplers(rng: np.random.Generator, min_size: int, max_size: int):
    def node_num(sid: int) -> int:
        return int(rng.integers(min_size, max_size))

    def avg_degree(sid: int) -> float:
        return float(rng.uniform(1, 4))

    return node_num, avg_degree


def generate_synthetic(
    num_graphs: int, min_size: int = 10, max_size: int = 500,
    seed: int = 0,
) -> List[Graph]:
    """Generate the synthetic dataset; ``num_graphs == 1827`` selects the
    standard stratified recipe."""
    rng = np.random.default_rng(seed)
    if num_graphs == 1827:
        node_num, avg_degree = _syn_1827_samplers(rng)
    else:
        node_num, avg_degree = _uniform_samplers(rng, min_size, max_size)

    graphs: List[Graph] = []
    for sid in range(num_graphs):
        n = max(int(node_num(sid)), 2)
        avg_edges = int(n * avg_degree(sid))
        edge = int(rng.normal(1, 0.1) * avg_edges)
        edge = min(edge, n * (n - 1) // 2)
        edge = max(edge, n - 1)
        name = GENERATORS[int(rng.integers(len(GENERATORS)))]
        g = _GEN_FNS[name](n, edge, rng)
        # random relabel (syn_data.py:749-757) — node order must not
        # correlate with generator structure (canonical partition depends
        # on node order)
        perm = rng.permutation(g.number_of_nodes())
        edges = np.array(
            [(perm[u], perm[v]) for u, v in g.edges() if u != v],
            dtype=np.int32).reshape(-1, 2)
        graphs.append(Graph(g.number_of_nodes(), edges))
    return graphs


def generate_combined_syn(
    num_graphs: int, min_size: int = 5, max_size: int = 41, seed: int = 0,
) -> List[Graph]:
    """Legacy ``syn_N`` datasets: the deepsnap-EnsembleGenerator mix
    (reference combined_syn.py:10-142 + data.py:444-467).

    Semantics reproduced exactly:
      * sizes drawn uniformly from ``range(min_size + 1, max_size + 1)``
        (data.py:466);
      * one of four generators chosen uniformly (gen_prob 1/4 each):
        - ER: p ~ Beta(1.3, b) with mean 0.8*log2(n)/n; resample until
          connected (combined_syn.py:10-33, m_scale=0.8)
        - WS: k = max(2, int(Beta(1.3, b)*n)) with density mean
          log2(n)/n, rewire p ~ Beta(2, 2); connected variant
          (combined_syn.py:36-76)
        - extended BA: m ~ 1 + choice(int(2*log2(n))),
          p, q = min(Exp(mean=20), 0.2); largest connected component
          (combined_syn.py:79-101)
        - powerlaw cluster: m ~ 1 + choice(int(2*log2(n))),
          triangle p ~ U(0, 0.5); largest CC (combined_syn.py:104-123)
    Unlike the ``Syn_N`` recipe there is NO forced connection by
    tree-join — BA/PLC graphs shrink to their largest component.
    """
    rng = np.random.default_rng(seed)
    sizes = np.arange(min_size + 1, max_size + 1)

    def gen_er_beta(n: int) -> nx.Graph:
        alpha = 1.3
        mean = 0.8 * np.log2(n) / n
        beta = alpha / mean - alpha
        while True:
            p = rng.beta(alpha, beta)
            g = nx.gnp_random_graph(n, p, seed=_seeded(rng))
            if nx.is_connected(g):
                return g

    def gen_ws_beta(n: int) -> nx.Graph:
        d_alpha = 1.3
        d_mean = np.log2(n) / n
        d_beta = d_alpha / d_mean - d_alpha
        while True:
            k = max(int(rng.beta(d_alpha, d_beta) * n), 2)
            p = rng.beta(2, 2)
            try:
                return nx.connected_watts_strogatz_graph(
                    n, k, p, seed=_seeded(rng))
            except nx.NetworkXException:
                continue

    def largest_cc(g: nx.Graph) -> nx.Graph:
        c = max(nx.connected_components(g), key=len)
        return nx.convert_node_labels_to_integers(g.subgraph(c).copy())

    def gen_ba_ext(n: int) -> nx.Graph:
        max_m = max(int(2 * np.log2(n)), 1)
        m = int(rng.integers(max_m)) + 1
        p = min(rng.exponential(20), 0.2)
        q = min(rng.exponential(20), 0.2)
        if p + q >= 1:  # defensive; cannot happen with 0.2 caps
            p = q = 0.2
        return largest_cc(_extended_ba(n, min(m, n - 1), p, q, rng))

    def gen_plc(n: int) -> nx.Graph:
        max_m = max(int(2 * np.log2(n)), 1)
        m = int(rng.integers(max_m)) + 1
        p = rng.uniform(0.0, 0.5)
        return largest_cc(
            nx.powerlaw_cluster_graph(n, min(m, n - 1), p,
                                      seed=_seeded(rng)))

    gens = (gen_er_beta, gen_ws_beta, gen_ba_ext, gen_plc)
    graphs: List[Graph] = []
    for _ in range(num_graphs):
        n = int(rng.choice(sizes))
        g = gens[int(rng.integers(len(gens)))](n)
        perm = rng.permutation(g.number_of_nodes())
        edges = np.array(
            [(perm[u], perm[v]) for u, v in g.edges() if u != v],
            dtype=np.int32).reshape(-1, 2)
        graphs.append(Graph(g.number_of_nodes(), edges))
    return graphs


def load_or_generate_synthetic(
    num_graphs: int, root: str, min_size: int = 10, max_size: int = 500,
    seed: int = 0, recipe: str = "Syn",
) -> List[Graph]:
    """Disk-cached synthetic dataset (edge-list + indicator text files,
    mirroring the reference's raw format, data.py:665-750). ``recipe``
    selects 'Syn' (DeSCo stratified/uniform) or 'combined' (the legacy
    deepsnap-ensemble mix of combined_syn.py)."""
    raw = os.path.join(root, "raw")
    a_path = os.path.join(raw, "Syn_A.txt")
    ind_path = os.path.join(raw, "Syn_graph_indicator.txt")
    if os.path.exists(a_path) and os.path.exists(ind_path):
        return read_edge_list_dataset(a_path, ind_path)
    if recipe == "combined":
        graphs = generate_combined_syn(num_graphs, min_size, max_size, seed)
    else:
        graphs = generate_synthetic(num_graphs, min_size, max_size, seed)
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
    # read the cache back so the GENERATING run returns bit-identical
    # edge order/orientation to every later cached run (the reader
    # canonicalizes to sorted u<v pairs; the in-memory graphs carry nx
    # iteration order — float accumulation order in the forward would
    # otherwise differ between run 1 and run 2+)
    return read_edge_list_dataset(a_path, ind_path)


def read_edge_list_dataset(a_path: str, ind_path: str) -> List[Graph]:
    """Parse TU-style DS_A.txt / DS_graph_indicator.txt into Graphs."""
    indicator = np.loadtxt(ind_path, dtype=np.int64).reshape(-1)
    edges = np.loadtxt(a_path, delimiter=",", dtype=np.int64).reshape(-1, 2)
    n_graphs = int(indicator.max())
    # node id offsets per graph (TU format: global 1-based ids)
    counts = np.bincount(indicator, minlength=n_graphs + 1)[1:]
    offsets = np.concatenate([[0], np.cumsum(counts)])
    graphs: List[Graph] = []
    eg = indicator[edges[:, 0] - 1] - 1  # graph of each edge
    for gid in range(n_graphs):
        mask = eg == gid
        e = edges[mask] - 1 - offsets[gid]
        # deduplicate (TU lists both directions)
        e = np.unique(np.sort(e, axis=1), axis=0) if len(e) else e.reshape(0, 2)
        e = e[e[:, 0] != e[:, 1]] if len(e) else e
        graphs.append(Graph(int(counts[gid]), e.astype(np.int32)))
    return graphs
