"""Offline dataset materialization — counterpart of the reference's
gen_dataset.py (9-75): generate/load a dataset, compute and cache the
exact canonical-count ground truth, and build the pipeline sample caches.

Usage: python gen_dataset.py --dataset Syn_1827 --depth 4
"""

from __future__ import annotations

import argparse
import time

from desco_tpu.data.datasets import load_data
from desco_tpu.graph.atlas import gen_query_ids
from desco_tpu.pipeline import PipelineConfig, prepare_stage_data


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="Syn_1827")
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--query_sizes", type=int, nargs="+", default=[3, 4, 5])
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--num_cpu", type=int, default=None)
    args = p.parse_args()

    cfg = PipelineConfig(query_sizes=tuple(args.query_sizes),
                         depth=args.depth, data_root=args.data_root,
                         num_workers=args.num_cpu)
    t0 = time.time()
    graphs = load_data(args.dataset, args.data_root)
    print(f"loaded {len(graphs)} graphs in {time.time() - t0:.1f}s")

    t0 = time.time()
    stage = prepare_stage_data(cfg, graphs, args.dataset)
    print(f"ground truth + {len(stage.samples)} neighborhoods in "
          f"{time.time() - t0:.1f}s "
          f"({len(stage.batches)} packed batches)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
