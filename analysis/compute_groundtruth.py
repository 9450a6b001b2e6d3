"""Offline exact ground truth for arbitrary query sets (size-6+).

TPU-native counterpart of the reference's
``analysis/compute_groundtruth.py:33-93``: compute canonical-count
ground truth for a dataset against a query set that is NOT the standard
3/4/5 atlas sweep — by size (``--query_sizes 6``), by explicit atlas
ids, or from a pickle of mined networkx patterns (the mfinder/ESU
output of ``desco_tpu.utils.mining``) — then print/save the graph-level
(graphlet) count sums alongside each query's size.

All counting runs through the thread-pooled C++ VF2
(truth/native.py) with a disk cache keyed by the query signature.

Usage:
  python analysis/compute_groundtruth.py --dataset ENZYMES \
      --query_sizes 6 --output out/ground_truth_size6.csv
  python analysis/compute_groundtruth.py --dataset MUTAG \
      --queries_pickle mined_patterns.p
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="ENZYMES")
    p.add_argument("--query_sizes", type=int, nargs="+", default=[6])
    p.add_argument("--query_ids", type=int, nargs="+", default=None,
                   help="explicit atlas ids (overrides --query_sizes)")
    p.add_argument("--queries_pickle", type=str, default=None,
                   help="pickle of a list of networkx query graphs "
                        "(overrides ids/sizes)")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--output", type=str, default=None)
    args = p.parse_args()

    from desco_tpu.data.datasets import load_data
    from desco_tpu.data.workload import Workload
    from desco_tpu.graph.atlas import gen_queries, gen_query_ids
    from desco_tpu.graph.container import Graph

    if args.queries_pickle:
        with open(args.queries_pickle, "rb") as f:
            nx_queries = pickle.load(f)
        queries = [Graph.from_networkx(q) for q in nx_queries]
        query_ids = list(range(len(queries)))  # signature only
        print(f"loaded {len(queries)} mined queries from "
              f"{args.queries_pickle}")
    else:
        query_ids = args.query_ids or gen_query_ids(args.query_sizes)
        queries = gen_queries(query_ids)
        print("use queries with atlas ids:", query_ids)

    graphs = load_data(args.dataset, args.data_root)
    wl = Workload(graphs, os.path.join(args.data_root, args.dataset))
    truth = wl.compute_groundtruth(query_ids, queries=queries)

    # graph-level counts = per-graph column sums of canonical counts
    graphlet = np.stack([
        truth[wl.node_offsets[i]:wl.node_offsets[i + 1]].sum(0)
        for i in range(len(graphs))
    ])
    total = graphlet.sum(0).astype(np.int64)
    sizes = np.array([q.n_nodes for q in queries], np.int64)
    out = np.stack([total, sizes], axis=1)
    print("ground truth sum (count, query_size):")
    print(out)
    if args.output:
        os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
        with open(args.output, "w") as f:
            f.write(",count,query_size\n")
            for i, (c, s) in enumerate(out):
                f.write(f"{i},{c},{s}\n")
        print(f"saved to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
