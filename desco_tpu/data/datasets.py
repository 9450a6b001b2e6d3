"""Dataset registry and loaders.

Mirrors the reference's named dataset zoo and naming conventions
(/root/reference/subgraph_counting/data.py:91-232):

  * ``<name>_train`` / ``_val`` / ``_test``: fixed-seed shuffled
    25/25/50 split of the full dataset (data.py:207-227).
  * ``<name>_decreaseByDegree`` / ``_increaseByDegree`` / ``_random``:
    per-graph node relabeling before anything else (node order is
    load-bearing for canonical partition).
  * ``Syn_<N>``: deterministic synthetic dataset (``Syn_1827`` = the
    standard pre-training set).

TU-format graph datasets (MUTAG, COX2, ENZYMES, MSRC_21, IMDB-BINARY, ...)
are read from local files at ``<root>/<name>/raw/<name>_A.txt`` etc. —
this environment has no network egress, so files must be present on disk
(the reference downloads them via PyG)."""

from __future__ import annotations

import os
import random
from typing import List, Optional, Tuple

import numpy as np

from ..graph.container import Graph, relabel_graph
from .synthetic import load_or_generate_synthetic, read_edge_list_dataset

# canonical-name table: registry name -> TU directory name
TU_NAMES = {
    "MUTAG": "MUTAG",
    "COX2": "COX2",
    "ENZYMES": "ENZYMES",
    "MSRC-21": "MSRC_21",
    "IMDB-BINARY": "IMDB-BINARY",
    "IMDB-MULTI": "IMDB-MULTI",
    "FIRSTMM-DB": "FIRSTMM_DB",
    "REDDIT-BINARY": "REDDIT-BINARY",
    "COLORS-3": "COLORS-3",
    "DD": "DD",
}


def load_tu_dataset(root: str, name: str,
                    with_labels: bool = False) -> List[Graph]:
    """Standard TU format reader: ``<root>/<name>/raw/<name>_A.txt``,
    ``_graph_indicator.txt``, optional ``_node_labels.txt``."""
    raw = os.path.join(root, name, "raw")
    a = os.path.join(raw, f"{name}_A.txt")
    ind = os.path.join(raw, f"{name}_graph_indicator.txt")
    if not os.path.exists(a):
        raise FileNotFoundError(
            f"TU dataset files not found under {raw}. This environment has "
            "no network access; place the standard TU files there "
            f"({name}_A.txt, {name}_graph_indicator.txt)."
        )
    graphs = read_edge_list_dataset(a, ind)
    lab = os.path.join(raw, f"{name}_node_labels.txt")
    if with_labels and os.path.exists(lab):
        labels = np.loadtxt(lab, dtype=np.int64).reshape(-1)
        off = 0
        n_lab = int(labels.max()) + 1
        for g in graphs:
            onehot = np.eye(n_lab, dtype=np.float32)[labels[off:off + g.n_nodes]]
            g.node_feat = onehot
            off += g.n_nodes
    return graphs


def load_snap_edgelist(root: str, name: str,
                       filename: str = "edges.txt") -> List[Graph]:
    """Single-graph SNAP-style edge-list datasets (P2P = p2p-Gnutella04,
    Astro = ca-AstroPh; reference data.py:753-886 downloads these — this
    environment has no egress, so the file must exist locally at
    ``<root>/<name>/raw/<filename>``). Node ids are compacted to 0..n-1
    preserving order; the graph is undirected and deduplicated."""
    path = os.path.join(root, name, "raw", filename)
    if not os.path.exists(path):
        sources = {"P2P": "p2p-Gnutella04 (snap.stanford.edu)",
                   "Astro": "ca-AstroPh (snap.stanford.edu)"}
        raise FileNotFoundError(
            f"edge list not found at {path}; this environment has no "
            f"network access — export/download "
            f"{sources.get(name, name)} and place the edge list there.")
    edges = np.loadtxt(path, dtype=np.int64, comments="#").reshape(-1, 2)
    ids = np.unique(edges)
    remap = {int(v): i for i, v in enumerate(ids)}
    e = np.array([(remap[int(u)], remap[int(v)]) for u, v in edges
                  if u != v], np.int64)
    e = np.unique(np.sort(e, axis=1), axis=0)
    return [Graph(len(ids), e.astype(np.int32))]


def _relabel_all(graphs: List[Graph], mode: str, seed: int = 0) -> List[Graph]:
    rng = np.random.default_rng(seed)
    out = []
    for g in graphs:
        deg = g.degrees()
        if mode == "decreasing_degree":
            order = np.argsort(-deg, kind="stable")
        elif mode == "increasing_degree":
            order = np.argsort(deg, kind="stable")
        elif mode == "random":
            order = rng.permutation(g.n_nodes)
        else:
            raise ValueError(mode)
        mapping = np.empty(g.n_nodes, dtype=np.int32)
        mapping[order] = np.arange(g.n_nodes, dtype=np.int32)
        out.append(relabel_graph(g, mapping))
    return out


def load_data(
    dataset_name: str,
    root_folder: str = "data",
    train_split: float = 0.25,
    val_split: float = 0.25,
    with_labels: bool = False,
) -> List[Graph]:
    """Named dataset loader with the reference's suffix conventions."""
    name = dataset_name
    split = None
    for s in ("_train", "_val", "_test"):
        if s in name:
            split = s[1:]
            name = name.replace(s, "")
            break
    relabel = None
    for s, mode in (
        ("_decreaseByDegree", "decreasing_degree"),
        ("_increaseByDegree", "increasing_degree"),
        ("_random", "random"),
    ):
        if s in name:
            relabel = mode
            name = name.replace(s, "")
            break

    if name.startswith("Syn_"):
        n = int(name.split("_")[1])
        graphs = load_or_generate_synthetic(
            n, os.path.join(root_folder, name), min_size=10, max_size=500)
    elif name.startswith("syn_"):
        # legacy lowercase synthetic names: the deepsnap-ensemble mix
        # (ER-beta/WS/extended-BA/powerlaw-cluster, uniform 1/4 each)
        # with sizes 6-41 (reference data.py:175-187 + combined_syn.py)
        n = int(name.split("_")[1])
        graphs = load_or_generate_synthetic(
            n, os.path.join(root_folder, name), min_size=5, max_size=41,
            recipe="combined")
    elif name in TU_NAMES:
        graphs = load_tu_dataset(root_folder, TU_NAMES[name], with_labels)
    elif name in ("P2P", "Astro"):
        graphs = load_snap_edgelist(root_folder, name)
    elif name in ("Cora", "CiteSeer", "ZINC", "arXiv"):
        # single-graph citation / molecule sets: accept a pre-exported
        # local edge list (no egress; the reference downloads via PyG —
        # export edges to <root>/<name>/raw/edges.txt to use here)
        graphs = load_snap_edgelist(root_folder, name)
    else:
        raise NotImplementedError(f"unknown dataset: {name}")

    if relabel:
        graphs = _relabel_all(graphs, relabel)

    if split is None:
        return graphs
    # fixed-seed shuffled split, matching data.py:207-227 exactly
    idx = list(range(len(graphs)))
    random.Random(0).shuffle(idx)
    train_len = int(len(graphs) * train_split)
    val_len = int(len(graphs) * val_split)
    if split == "train":
        sel = idx[:train_len]
    elif split == "val":
        sel = idx[train_len:train_len + val_len]
    else:
        sel = idx[train_len + val_len:]
    return [graphs[i] for i in sel]
