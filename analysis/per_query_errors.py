"""Per-query error breakdown of a main.py output directory.

The headline metric (analysis.py / reference analysis.py:22-43) groups
the 29 standard queries by size; this tool splits the same normed MSE
by individual query id so a bad size-group cell can be attributed to
the specific pattern(s) driving it.

Usage: python analysis/per_query_errors.py output/r3_chem --dataset ChemProxy
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def load_csv(path: str) -> np.ndarray:
    with open(path) as f:
        rows = list(csv.reader(f))
    return np.array([[float(x) for x in r[1:]] for r in rows[1:]])


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("output_dir")
    p.add_argument("--dataset", required=True)
    p.add_argument("--stage", default="gossip",
                   choices=["gossip", "neighborhood"])
    p.add_argument("--top", type=int, default=10)
    a = p.parse_args()

    from desco_tpu.graph.atlas import gen_queries, gen_query_ids

    pred = load_csv(os.path.join(
        a.output_dir, f"{a.stage}_graphlet_{a.dataset}.csv"))
    truth = load_csv(os.path.join(
        a.output_dir, f"graphlet_truth_{a.dataset}.csv"))
    qids = gen_query_ids([3, 4, 5])
    queries = gen_queries(qids)
    sizes = np.array([q.n_nodes for q in queries])

    err2 = (pred - truth) ** 2
    rows = []
    for j, qid in enumerate(qids):
        var = truth[:, j].var()
        nmse = err2[:, j].mean() / var if var > 0 else float(
            err2[:, j].mean() > 0) * np.inf
        rows.append((nmse, qid, sizes[j], err2[:, j].mean() ** 0.5,
                     np.abs(pred[:, j] - truth[:, j]).mean(),
                     truth[:, j].mean()))
    # the size-group normed MSE this decomposes (weights: per-query
    # squared error normalized by the GROUP's pooled variance differs —
    # report both views)
    for s in (3, 4, 5):
        g = sizes == s
        print(f"size {s}: group normed MSE "
              f"{(err2[:, g].mean() / truth[:, g].var()):.3e}")
    print(f"\nworst {a.top} queries by per-query normed MSE "
          f"({a.stage} stage):")
    print(f"{'atlas id':>9} {'size':>4} {'normedMSE':>11} {'rmse':>9} "
          f"{'mae':>9} {'mean truth':>11}")
    for nmse, qid, s, rmse, mae, mt in sorted(rows, reverse=True)[:a.top]:
        print(f"{qid:>9} {s:>4} {nmse:>11.3e} {rmse:>9.3f} "
              f"{mae:>9.3f} {mt:>11.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
