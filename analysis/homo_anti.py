"""Gossip gate analysis: homophily / antisymmetry figure.

Counterpart of the reference's analysis/homo_anti_draw.py (the paper's
inductive-bias figure, built there from hard-coded gate values,
homo_anti_draw.py:11-104): here it reads the ``gossip_gate_<ds>.csv``
emitted by main.py (rows = gossip layers, columns = queries) and plots
each query's gate value per layer. Gate ~0.5 = symmetric (homophily-like
averaging); gate near 0/1 = antisymmetric directed propagation.

Usage: python analysis/homo_anti.py output/.../gossip_gate_DS.csv \
           [--out gates.png]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("gate_csv", type=str)
    p.add_argument("--out", type=str, default="gossip_gates.png")
    args = p.parse_args()

    import numpy as np

    gates = np.loadtxt(args.gate_csv, delimiter=",", skiprows=1)[:, 1:]
    n_layers, n_queries = gates.shape
    print(f"{n_layers} gossip layers x {n_queries} queries")
    for l in range(n_layers):
        g = gates[l]
        print(f"layer {l}: mean {g.mean():.3f}  "
              f"symmetric(|g-0.5|<0.1): {(np.abs(g - 0.5) < 0.1).sum()}  "
              f"antisymmetric(|g-0.5|>0.3): {(np.abs(g - 0.5) > 0.3).sum()}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 3))
    for l in range(n_layers):
        ax.plot(range(n_queries), gates[l], "o-", label=f"layer {l}",
                alpha=0.8)
    ax.axhline(0.5, color="gray", ls="--", lw=0.8)
    ax.set_xlabel("query index")
    ax.set_ylabel("gate value g")
    ax.set_ylim(0, 1)
    ax.legend()
    ax.set_title("gossip direction gates (0.5 = symmetric)")
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
