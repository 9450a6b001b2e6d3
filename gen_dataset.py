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
    p.add_argument("--shard", type=int, default=None,
                   help="compute ONLY this truth shard (graphs with "
                        "gi %% num_shards == shard) and exit — run one "
                        "shard per host, then --merge_shards")
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--merge_shards", action="store_true",
                   help="assemble all --num_shards shard files into the "
                        "canonical truth cache, then build samples")
    args = p.parse_args()

    cfg = PipelineConfig(query_sizes=tuple(args.query_sizes),
                         depth=args.depth, data_root=args.data_root,
                         num_workers=args.num_cpu)
    t0 = time.time()
    graphs = load_data(args.dataset, args.data_root)
    print(f"loaded {len(graphs)} graphs in {time.time() - t0:.1f}s")

    if args.shard is not None or args.merge_shards:
        import os

        from desco_tpu.data.workload import Workload

        wl = Workload(graphs, root=os.path.join(cfg.data_root,
                                                args.dataset),
                      name=args.dataset)
        qids = gen_query_ids(list(args.query_sizes))
        if args.shard is not None:
            t0 = time.time()
            path = wl.compute_groundtruth_shard(
                qids, args.shard, args.num_shards,
                num_workers=args.num_cpu)
            print(f"shard {args.shard}/{args.num_shards} -> {path} in "
                  f"{time.time() - t0:.1f}s")
            return 0
        t0 = time.time()
        truth = wl.merge_groundtruth_shards(qids, args.num_shards)
        print(f"merged {args.num_shards} shards -> "
              f"{truth.shape} truth in {time.time() - t0:.1f}s")
        # fall through: build the sample caches against the merged truth

    t0 = time.time()
    stage = prepare_stage_data(cfg, graphs, args.dataset)
    print(f"ground truth + {len(stage.samples)} neighborhoods in "
          f"{time.time() - t0:.1f}s "
          f"({len(stage.batches)} packed batches)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
