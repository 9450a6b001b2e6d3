"""Paper-parity table: this repo's graphlet normed-MSE/MAE per query
size next to the reference's published README row (BASELINE.md,
/root/reference/README.md:76-83).

Usage: python analysis/parity_table.py output/r3_mutag [--dataset MUTAG]

Reads analyze_results_<dataset>.txt (written by main.py) and prints a
markdown table against the published DeSCo numbers for the dataset, when
the paper reports that dataset (MUTAG/COX2/ENZYMES/IMDB-BINARY/MSRC-21).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# normed MSE (q3 / q4 / q5), README.md:83 (bold row = DeSCo)
PUBLISHED = {
    "MUTAG": (2.3e-03, 8.4e-04, 6.5e-03),
    "COX2": (6.9e-04, 5.3e-04, 5.4e-03),
    "ENZYMES": (5.3e-03, 5.7e-02, 5.3e-02),
    "IMDB-BINARY": (8.7e-03, 2.1e-01, 4.5e-01),
    "MSRC-21": (2.6e-03, 3.9e-03, 8.5e-02),
}


def parse_results(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            k, v = line.split(": ", 1)
            out[k.strip()] = [float(x) for x in
                              v.strip().strip("[]").split(",")]
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("output_dir")
    p.add_argument("--dataset", default="MUTAG")
    a = p.parse_args()
    path = os.path.join(a.output_dir,
                        f"analyze_results_{a.dataset}.txt")
    res = parse_results(path)
    pub = PUBLISHED.get(a.dataset)
    proxy_of = None
    if pub is None:
        # structural proxy families stand in for the unobtainable TU
        # sets (tu_proxy.py); compare against the imitated dataset's
        # published row, clearly labeled as a proxy comparison
        from desco_tpu.data.tu_proxy import TU_PROXY_OF
        proxy_of = TU_PROXY_OF.get(a.dataset)
        pub = PUBLISHED.get(proxy_of) if proxy_of else None

    def fmt(vals):
        return " / ".join(f"{v:.1E}" for v in vals)

    title = a.dataset if not proxy_of else (
        f"{a.dataset} (structural proxy for {proxy_of} — "
        "NOT the real benchmark)")
    print(f"### {title} graphlet normed MSE (q3 / q4 / q5)\n")
    print("| model | normed MSE | MAE |")
    print("|---|---|---|")
    if pub:
        label = ("DeSCo (published, README.md:83)" if not proxy_of else
                 f"DeSCo (published on real {proxy_of}, README.md:83)")
        print(f"| {label} | {fmt(pub)} | — |")
    print(f"| desco_tpu stage 1 (neighborhood) | "
          f"{fmt(res['graphlet_norm_mse_neighborhood'])} | "
          f"{fmt(res['graphlet_mae_neighborhood'])} |")
    if "graphlet_norm_mse_gossip" in res:
        print(f"| desco_tpu + gossip | "
              f"{fmt(res['graphlet_norm_mse_gossip'])} | "
              f"{fmt(res['graphlet_mae_gossip'])} |")
    if pub:
        got = res.get("graphlet_norm_mse_gossip",
                      res["graphlet_norm_mse_neighborhood"])
        ratios = [g / p for g, p in zip(got, pub)]
        print(f"\nratio vs published (x, lower is better): "
              + " / ".join(f"{r:.2f}" for r in ratios))
    return 0


if __name__ == "__main__":
    sys.exit(main())
