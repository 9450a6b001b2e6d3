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
    # mirrors the reference's cache-key convention (workload.py:494-500),
    # plus a full-set digest: the human-readable prefix truncates at
    # ``max_len`` ids, so two >30-id sets sharing a prefix and length
    # would otherwise collide on the same cache file
    ids = list(query_ids)
    sig = ("query_num_{:d}_atlas_ids_".format(len(ids))
           + "_".join(map(str, ids[:max_len])))
    if len(ids) > max_len:
        import hashlib

        digest = hashlib.sha1(
            ",".join(map(str, ids)).encode()).hexdigest()[:10]
        sig += "_h" + digest
    return sig


def _labeled_query_signature(queries, q_labels) -> str:
    """Cache key for labeled truth: a digest of the full query
    STRUCTURE (edges + label assignment per query). Count + summed
    size alone collide across different label expansions of same-shaped
    query sets — and the stale truth would load silently (the shape
    check passes)."""
    import hashlib

    h = hashlib.sha1()
    for q, ql in zip(queries, q_labels):
        h.update(np.int64(q.n_nodes).tobytes())
        e = np.asarray(q.edges, np.int64).reshape(-1, 2)
        h.update(e[np.lexsort((e[:, 1], e[:, 0]))].tobytes())
        h.update(np.asarray(ql, np.int64).tobytes())
    return ("query_num_{:d}_node_feat_h{}"
            .format(len(queries), h.hexdigest()[:12]))


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

    # ------------------------------------------- multi-host truth shards
    def shard_path(self, query_ids: Sequence[int], shard: int,
                   num_shards: int) -> str:
        return os.path.join(
            self.root, "CanonicalCountTruth",
            _query_signature(query_ids)
            + f".shard{shard}of{num_shards}.npz")

    def compute_groundtruth_shard(
        self, query_ids: Sequence[int], shard: int, num_shards: int,
        queries: Optional[List[Graph]] = None,
        num_workers: Optional[int] = None,
    ) -> str:
        """Exact truth for the graphs with ``gi % num_shards == shard``,
        saved as a partial file. The multi-host materialization story
        (SURVEY §2.2 task-parallelism row): each host runs one shard of
        the VF2 workload — the reference's ProcessPoolExecutor
        (workload.py:655-671) is single-host only — and
        ``merge_groundtruth_shards`` assembles the canonical cache.
        Returns the shard file path."""
        if not 0 <= shard < num_shards:
            raise ValueError(f"shard {shard} not in [0, {num_shards})")
        if queries is None:
            queries = atlas_queries(list(query_ids))
        idx = list(range(shard, len(self.graphs), num_shards))
        gs = [self.graphs[gi] for gi in idx]
        if truth_native.native_available():
            per_graph = truth_native.parallel_canonical_counts(
                gs, queries, num_workers)
        else:
            per_graph = [py_canonical_counts(g, queries) for g in gs]
        path = self.shard_path(query_ids, shard, num_shards)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez(path, **{str(gi): arr
                          for gi, arr in zip(idx, per_graph)})
        return path

    def merge_groundtruth_shards(
        self, query_ids: Sequence[int], num_shards: int,
        cleanup: bool = False,
    ) -> np.ndarray:
        """Assemble shard files into the full (total_nodes, Q) truth and
        write the canonical cache (so later runs hit the normal path).
        Raises if any shard file is missing."""
        out = np.zeros((self.total_nodes, len(query_ids)), np.float64)
        seen = np.zeros(len(self.graphs), bool)
        paths = []
        for k in range(num_shards):
            path = self.shard_path(query_ids, k, num_shards)
            if not os.path.exists(path):
                raise FileNotFoundError(f"missing truth shard: {path}")
            paths.append(path)
            with np.load(path) as z:
                for key in z.files:
                    gi = int(key)
                    lo = self.node_offsets[gi]
                    hi = self.node_offsets[gi + 1]
                    out[lo:hi] = z[key]
                    seen[gi] = True
        if not seen.all():
            missing = np.nonzero(~seen)[0][:5].tolist()
            raise ValueError(f"graphs missing from shards: {missing}...")
        cache = self.groundtruth_path(query_ids)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.save(cache, out)
        if cleanup:
            for path in paths:
                os.remove(path)
        return out

    def compute_groundtruth_labeled(
        self, queries: List[Graph],
        num_workers: Optional[int] = None,
        use_cache: bool = True,
    ) -> np.ndarray:
        """(total_nodes, len(queries)) canonical counts under node-label
        matching (the use_node_feature mode, workload.py:336-341,
        551-726). ``queries`` and ``self.graphs`` carry one-hot
        ``node_feat``; labels are the argmax."""
        from ..truth.vf2 import count_induced_embeddings

        q_labels = [q.node_feat.argmax(-1).astype(np.int32)
                    for q in queries]
        sig = _labeled_query_signature(queries, q_labels)
        path = os.path.join(self.root, "CanonicalCountTruth", sig + ".npy")
        if use_cache and os.path.exists(path):
            truth = np.load(path)
            if truth.shape == (self.total_nodes, len(queries)):
                return truth
        t_labels = [g.node_feat.argmax(-1).astype(np.int32)
                    for g in self.graphs]
        sf = [max(symmetric_factor(q, ql), 1)
              for q, ql in zip(queries, q_labels)]
        use_native = truth_native.native_available()
        out = np.zeros((self.total_nodes, len(queries)), np.float64)

        def one_graph(gi):
            g = self.graphs[gi]
            lo = self.node_offsets[gi]
            for qi, q in enumerate(queries):
                per = np.zeros(g.n_nodes, np.int64)
                if use_native:
                    # releases the GIL -> real thread parallelism
                    truth_native.vf2_count_native(
                        g, q, per, t_labels[gi], q_labels[qi])
                else:
                    count_induced_embeddings(g, q, per, t_labels[gi],
                                             q_labels[qi])
                out[lo:lo + g.n_nodes, qi] = per / sf[qi]

        if use_native and len(self.graphs) > 1:
            # same fan-out as the unlabeled path: the C call releases
            # the GIL, so the labeled truth scales with cores too
            from concurrent.futures import ThreadPoolExecutor

            w = num_workers or os.cpu_count() or 4
            with ThreadPoolExecutor(max_workers=w) as ex:
                list(ex.map(one_graph, range(len(self.graphs))))
        else:
            for gi in range(len(self.graphs)):
                one_graph(gi)
        if use_cache:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            np.save(path, out)
        return out

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

    def _neigh_cache_path(self, depth, use_tconv, use_hetero,
                          use_node_feat=False, order=3) -> str:
        # keyed by depth/typing flags like the reference's processed file
        # names (workload.py:197-213)
        suffix = ("" if use_hetero else "_homo") + (
            "_tconv" if use_tconv else "") + (
            "_node_feat" if use_node_feat else "") + (
            f"_order{order}" if order != 3 else "")
        return os.path.join(
            self.root, "NeighborhoodDataset",
            f"neighs_depth_{depth}{suffix}")

    def neighborhood_samples(
        self, depth: int, query_ids: Sequence[int],
        use_tconv: bool = True, use_hetero: bool = True,
        truth: Optional[np.ndarray] = None,
        num_workers: Optional[int] = None,
        use_cache: bool = True,
        use_node_feat: bool = False,
        order: int = 3,
    ) -> tuple[List[GraphSample], NeighborhoodIndex]:
        """Canonical-neighborhood GraphSamples with truth labels attached
        (the reference's NeighborhoodDataset, workload.py:153-324).
        Structure (not labels) is cached on disk; truth columns are
        re-applied per query set. ``order=4`` types edges by 4-node
        orbit class x canonical combo (33 types, graph/orbits.py — the
        to_hetero(order=4) expansion the reference declares but never
        wires, lightning_model.py:441-458). Orbit typing enumerates
        induced 4-sets per neighborhood (exact, host Python) — use it
        at molecular scale (<~100-node graphs, the regime the reference
        evaluates); the order-3 tconv path is the production default."""
        if use_node_feat and truth is None:
            raise ValueError(
                "use_node_feat=True needs an explicit labeled `truth` "
                "(compute_groundtruth_labeled over the expanded query "
                "set) — the unlabeled default would silently target "
                "label-blind counts")
        if use_node_feat and not use_hetero:
            raise ValueError(
                "use_node_feat=True with use_hetero=False is "
                "unsupported: the homogeneous sample builder carries no "
                "node features, so labels would be silently dropped")
        if truth is None:
            truth = self.compute_groundtruth(query_ids,
                                             num_workers=num_workers)
        cache = self._neigh_cache_path(depth, use_tconv, use_hetero,
                                       use_node_feat, order)
        if use_cache and os.path.exists(cache):
            samples, nindex = self._load_neigh_cache(cache)
            # stale-cache guard: a dataset regenerated in the same root
            # (different seed/graph count) leaves the old sample cache
            # behind; its (gid, vid) rows would index the NEW truth —
            # IndexError at best, silently wrong labels at worst
            idx = np.asarray(nindex.index)
            if (len(nindex.indicator) != self.total_nodes
                    or (len(idx)
                        and (idx[:, 0].max() >= len(self.graphs)
                             or np.any(self.node_offsets[idx[:, 0]]
                                       + idx[:, 1] >= self.total_nodes)))):
                import warnings

                warnings.warn(
                    f"neighborhood cache at {cache} does not match the "
                    f"current dataset (stale after regeneration?) — "
                    f"recomputing", stacklevel=2)
                samples = None
        else:
            samples = None
        if samples is not None:
            pass
        elif (order == 3 and use_hetero and use_tconv
              and truth_native.native_available()):
            samples, nindex = self._native_fast_samples(
                depth, use_node_feat, num_workers=num_workers)
            if use_cache:
                self._save_neigh_cache(cache, samples, nindex)
        else:
            neighs, nindex = self.extract_neighborhoods(depth)
            samples = []
            for nb in neighs:
                feat = (self.graphs[nb.gid].node_feat[nb.nodes]
                        if use_node_feat else None)
                if use_hetero:
                    s = neighborhood_sample(nb, use_tconv=use_tconv,
                                            x=feat, order=order)
                else:
                    s = homogeneous_neighborhood_sample(nb)
                samples.append(s)
            if use_cache:
                self._save_neigh_cache(cache, samples, nindex)
        for s, (gid, vid) in zip(samples, nindex.index):
            s.y = truth[self.node_offsets[gid] + vid].astype(np.float32)
        return samples, nindex

    def _native_fast_samples(self, depth: int, use_node_feat: bool,
                             num_workers: Optional[int] = None):
        """6-type tconv samples via ONE fused C call per graph
        (native prepare_samples: partition + induced subgraph + triangle
        typing + directed expansion), thread-parallel across graphs (the
        C call releases the GIL). Replaces the per-neighborhood Python
        glue of the generic path — identical output up to edge order
        (the packer re-sorts edges by (dst, type) anyway)."""
        from concurrent.futures import ThreadPoolExecutor

        workers = num_workers or os.cpu_count() or 1
        with ThreadPoolExecutor(max_workers=workers) as ex:
            per_graph = list(ex.map(
                lambda g: truth_native.prepare_samples_native(g, depth),
                self.graphs))
        samples, index, indicator = [], [], []
        for gid, (g, (sizes, esizes, nodes, src, dst, et)) in enumerate(
                zip(self.graphs, per_graph)):
            keep = sizes > 0
            indicator.append(keep)
            vids = np.nonzero(keep)[0]
            index.extend((gid, int(v)) for v in vids)
            no = np.concatenate([[0], np.cumsum(sizes[keep])])
            eo = np.concatenate([[0], np.cumsum(esizes[keep])])
            if use_node_feat:
                x_flat = g.node_feat[nodes].astype(np.float32)
            else:
                x_flat = np.zeros((len(nodes), 1), np.float32)
            nt_flat = np.zeros(len(nodes), np.int32)
            nt_flat[no[1:] - 1] = 1  # canonical node is last per slice
            for i in range(len(vids)):
                samples.append(GraphSample(
                    node_type=nt_flat[no[i]:no[i + 1]],
                    x=x_flat[no[i]:no[i + 1]],
                    edge_src=src[eo[i]:eo[i + 1]],
                    edge_dst=dst[eo[i]:eo[i + 1]],
                    edge_type=et[eo[i]:eo[i + 1]],
                ))
        return samples, NeighborhoodIndex(
            np.array(index, np.int64).reshape(-1, 2),
            np.concatenate(indicator) if indicator
            else np.zeros(0, bool))

    def _save_neigh_cache(self, path, samples, nindex) -> None:
        # a directory of raw .npy files: loads back as file-backed memmaps
        # (anonymous memory on this host faults in at ~9MB/s; file pages
        # come from the page cache at full speed)
        from ..utils.memory import prefault

        os.makedirs(path, exist_ok=True)

        def cat(parts, dtype, width=None):
            # concatenate into a PREFAULTED buffer: np.concatenate's own
            # fresh allocation would fault in at ~9MB/s on this host
            if not parts:
                return (np.zeros(0, dtype) if width is None
                        else np.zeros((0, width), dtype))
            total = sum(len(p) for p in parts)
            shape = (total,) if width is None else (total, width)
            out = np.empty(shape, dtype)
            prefault(out)
            off = 0
            for p in parts:
                out[off:off + len(p)] = p
                off += len(p)
            return out

        fields = {
            "n_nodes": np.array([s.n_nodes for s in samples], np.int32),
            "n_edges": np.array([s.n_edges for s in samples], np.int32),
            "node_type": cat([s.node_type for s in samples], np.int32),
            "x": cat([s.x for s in samples], np.float32,
                     width=samples[0].x.shape[1] if samples else 1),
            "edge_src": cat([s.edge_src for s in samples], np.int32),
            "edge_dst": cat([s.edge_dst for s in samples], np.int32),
            "edge_type": cat([s.edge_type for s in samples], np.int32),
            "index": nindex.index, "indicator": nindex.indicator,
        }
        for k, v in fields.items():
            np.save(os.path.join(path, k + ".npy"), v)

    def _load_neigh_cache(self, path):
        def ld(k, mmap=True):
            return np.load(os.path.join(path, k + ".npy"),
                           mmap_mode="r" if mmap else None)

        n_nodes = np.asarray(ld("n_nodes", mmap=False))
        n_edges = np.asarray(ld("n_edges", mmap=False))
        no = np.concatenate([[0], np.cumsum(n_nodes)])
        eo = np.concatenate([[0], np.cumsum(n_edges)])
        nt, x = ld("node_type"), ld("x")
        es, ed, et = ld("edge_src"), ld("edge_dst"), ld("edge_type")
        samples = []
        for i in range(len(n_nodes)):
            samples.append(GraphSample(
                node_type=nt[no[i]:no[i + 1]],
                x=x[no[i]:no[i + 1]],
                edge_src=es[eo[i]:eo[i + 1]],
                edge_dst=ed[eo[i]:eo[i + 1]],
                edge_type=et[eo[i]:eo[i + 1]],
            ))
        return samples, NeighborhoodIndex(
            np.asarray(ld("index", mmap=False)),
            np.asarray(ld("indicator", mmap=False)))

    # ------------------------------------------------- wo-canonical mode
    def wo_canonical_samples(
        self, query_ids: Sequence[int],
        use_tconv: bool = True,
        truth: Optional[np.ndarray] = None,
        num_workers: Optional[int] = None,
    ) -> List[GraphSample]:
        """Whole-graph samples for the no-canonical-partition ablation
        (reference Workload_baseline.generate_wo_canonical_dataset,
        workload.py:800-833): each target graph becomes ONE untyped
        (union_node) sample labeled with its graph-level counts.

        Labels here are RAW graphlet counts; the standard training path
        applies log2(+1) once. (The reference stores y=log2(count+1) and
        its unchanged train_forward logs again — a double-log we do not
        reproduce.)
        """
        from ..batch.build import query_sample

        if truth is None:
            truth = self.compute_groundtruth(query_ids,
                                             num_workers=num_workers)
        graphlet = self.aggregate_node_counts(truth)
        samples = []
        for gid, g in enumerate(self.graphs):
            s = query_sample(g, use_tconv=use_tconv)
            s.y = graphlet[gid].astype(np.float32)
            samples.append(s)
        return samples

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
