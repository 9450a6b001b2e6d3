"""Workload: dataset -> ground truth -> pipeline samples, with disk caches.

The TPU-native counterpart of the reference's ``Workload``
(/root/reference/subgraph_counting/workload.py:363-747): bundles a graph
dataset with (a) exact canonical-count ground truth (cached, keyed by the
query-set signature like workload.py:703-724), (b) the canonical
neighborhood sample set (cached, keyed by depth/typing flags like
workload.py:197-213), and (c) gossip samples over the original graphs.

All expensive work runs through the native C++ kernels when available.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import numpy as np

from ..batch.build import (
    gossip_sample,
    homogeneous_neighborhood_sample,
    neighborhood_sample,
)
from ..batch.packed import GraphSample
from ..graph.atlas import gen_queries as atlas_queries
from ..graph.canonical import extract_all_neighborhoods
from ..graph.container import Graph
from ..truth import native as truth_native
from ..truth.vf2 import canonical_counts as py_canonical_counts
from ..truth.vf2 import symmetric_factor


def _query_signature(query_ids: Sequence[int], max_len: int = 30) -> str:
    # mirrors the reference's cache-key convention (workload.py:494-500)
    return ("query_num_{:d}_atlas_ids_".format(len(query_ids))
            + "_".join(map(str, list(query_ids)[:max_len])))


@dataclasses.dataclass
class NeighborhoodIndex:
    index: np.ndarray      # (#neigh, 2) of (gid, vid)
    indicator: np.ndarray  # (#total_nodes,) bool


class Workload:
    def __init__(self, graphs: List[Graph], root: str,
                 name: str = "dataset") -> None:
        self.graphs = graphs
        self.root = root
        self.name = name
        self.node_offsets = np.concatenate(
            [[0], np.cumsum([g.n_nodes for g in graphs])]).astype(np.int64)
        self.total_nodes = int(self.node_offsets[-1])

    # ------------------------------------------------------------ truth
    def groundtruth_path(self, query_ids: Sequence[int]) -> str:
        return os.path.join(self.root, "CanonicalCountTruth",
                            _query_signature(query_ids) + ".npy")

    def compute_groundtruth(
        self, query_ids: Sequence[int],
        queries: Optional[List[Graph]] = None,
        num_workers: Optional[int] = None,
        use_cache: bool = True,
    ) -> np.ndarray:
        """(total_nodes, n_queries) float64 canonical counts."""
        path = self.groundtruth_path(query_ids)
        if use_cache and os.path.exists(path):
            truth = np.load(path)
            if truth.shape == (self.total_nodes, len(query_ids)):
                return truth
        if queries is None:
            queries = atlas_queries(list(query_ids))
        if truth_native.native_available():
            per_graph = truth_native.parallel_canonical_counts(
                self.graphs, queries, num_workers)
        else:
            per_graph = [py_canonical_counts(g, queries) for g in self.graphs]
        truth = np.concatenate(per_graph, axis=0)
        if use_cache:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            np.save(path, truth)
        return truth

    # ---------------------------------------------------- neighborhoods
    def extract_neighborhoods(self, depth: int):
        """(neighborhoods, NeighborhoodIndex) via the native kernel when
        available (semantics of extract_all_neighborhoods)."""
        from ..graph.canonical import Neighborhood

        if not truth_native.native_available():
            neighs, index, indicator = extract_all_neighborhoods(
                self.graphs, depth)
            return neighs, NeighborhoodIndex(index, indicator)

        neighs, index, indicator = [], [], []
        for gid, g in enumerate(self.graphs):
            sizes, flat = truth_native.extract_neighborhoods_native(g, depth)
            off = 0
            for v in range(g.n_nodes):
                if sizes[v] == 0:
                    indicator.append(False)
                    continue
                nodes = flat[off:off + sizes[v]]
                off += sizes[v]
                sub, orig = g.induced_subgraph(nodes)
                neighs.append(Neighborhood(
                    graph=sub, canonical=len(nodes) - 1, nodes=orig,
                    gid=gid, vid=v))
                indicator.append(True)
                index.append((gid, v))
        return neighs, NeighborhoodIndex(
            np.array(index, dtype=np.int64).reshape(-1, 2),
            np.array(indicator, dtype=bool))

    def neighborhood_samples(
        self, depth: int, query_ids: Sequence[int],
        use_tconv: bool = True, use_hetero: bool = True,
        truth: Optional[np.ndarray] = None,
        num_workers: Optional[int] = None,
    ) -> tuple[List[GraphSample], NeighborhoodIndex]:
        """Canonical-neighborhood GraphSamples with truth labels attached
        (the reference's NeighborhoodDataset, workload.py:153-324)."""
        if truth is None:
            truth = self.compute_groundtruth(query_ids,
                                             num_workers=num_workers)
        neighs, nindex = self.extract_neighborhoods(depth)
        samples = []
        for nb in neighs:
            y = truth[self.node_offsets[nb.gid] + nb.vid].astype(np.float32)
            if use_hetero:
                s = neighborhood_sample(nb, use_tconv=use_tconv, y=y)
            else:
                s = homogeneous_neighborhood_sample(nb, y=y)
            samples.append(s)
        return samples, nindex

    # ---------------------------------------------------------- gossip
    def gossip_samples(
        self, neigh_counts: np.ndarray, nindex: NeighborhoodIndex,
        truth: np.ndarray,
    ) -> List[GraphSample]:
        """Gossip GraphSamples over the ORIGINAL graphs; node features =
        stage-1 counts scattered via the indicator (zeros where the
        neighborhood was dropped — workload.py:107-126), labels = truth."""
        n_q = truth.shape[1]
        x_all = np.zeros((self.total_nodes, n_q), dtype=np.float32)
        x_all[nindex.indicator] = neigh_counts.astype(np.float32)
        samples = []
        for gid, g in enumerate(self.graphs):
            lo, hi = self.node_offsets[gid], self.node_offsets[gid + 1]
            samples.append(gossip_sample(
                g, x_all[lo:hi], truth[lo:hi].astype(np.float32)))
        return samples

    # ------------------------------------------------------ aggregation
    def aggregate_neighborhood_counts(
        self, neigh_counts: np.ndarray, nindex: NeighborhoodIndex,
    ) -> np.ndarray:
        """(#graphs, Q): sum stage-1 neighborhood counts per graph
        (workload.py:303-324)."""
        out = np.zeros((len(self.graphs), neigh_counts.shape[1]),
                       dtype=np.float64)
        np.add.at(out, nindex.index[:, 0], neigh_counts)
        return out

    def aggregate_node_counts(self, node_counts: np.ndarray) -> np.ndarray:
        """(#graphs, Q): sum per-node counts per graph (used for gossip
        predictions and the truth — GossipDataset.aggregate, workload.py:
        136-150)."""
        out = np.zeros((len(self.graphs), node_counts.shape[1]),
                       dtype=np.float64)
        gids = np.repeat(np.arange(len(self.graphs)),
                         [g.n_nodes for g in self.graphs])
        np.add.at(out, gids, node_counts)
        return out
