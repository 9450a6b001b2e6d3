"""Decomposition complexity study.

Counterpart of the reference's experimental/complexity_analysis.py:35-90:
compares Σ f(n) over whole graphs (graphlet counting) vs over canonical
neighborhoods, for f ∈ {n², 2ⁿ, n·n!} — quantifying why canonical
partition makes counting tractable (neighborhood sizes are bounded by the
depth-d ball regardless of target-graph size).

Usage: python experimental/complexity_analysis.py --dataset Syn_64
"""

from __future__ import annotations

import argparse
import math
import sys
from decimal import Decimal

sys.path.insert(0, ".")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="Syn_64")
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--data_root", type=str, default="data")
    args = p.parse_args()

    from desco_tpu.data.datasets import load_data
    from desco_tpu.data.workload import Workload

    graphs = load_data(args.dataset, args.data_root)
    wl = Workload(graphs, root=f"{args.data_root}/{args.dataset}",
                  name=args.dataset)
    neighs, _ = wl.extract_neighborhoods(args.depth)

    funcs = {
        "n^2": lambda x: x ** 2,
        "2^n": lambda x: 2 ** x,
        "n*n!": lambda x: x * math.factorial(x),
    }
    whole = [g.n_nodes for g in graphs]
    parts = [nb.graph.n_nodes for nb in neighs]
    print(f"dataset: {args.dataset}  graphs={len(whole)} "
          f"neighborhoods={len(parts)}")
    for name, f in funcs.items():
        cw = sum(f(n) for n in whole)
        cp = sum(f(n) for n in parts)
        print(f"  f={name:5s}  graphlet: {Decimal(cw):.2e}   "
              f"neighborhood: {Decimal(cp):.2e}   "
              f"ratio: {Decimal(cw) / Decimal(max(cp, 1)):.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
