"""Scaling-efficiency harness: halo-partitioned SHMP forward, 1..D devices.

The north-star scaling metric (BASELINE.md): edges/s scaling efficiency
for the edge-partitioned batched graph with halo exchange. On real
multi-chip hardware this measures ICI-overlapped throughput; on a CPU
mesh (this container has one physical chip) it validates the harness and
the partition/exchange overheads functionally.

Usage:
  python analysis/scaling.py --nodes 20000 --degree 8 [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, ".")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=20000)
    p.add_argument("--degree", type=int, default=8)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--platform", type=str, default="cpu",
                   help="cpu simulates an 8-device mesh; set to 'tpu' on "
                        "real multi-chip hardware")
    args = p.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from desco_tpu.batch.build import neighborhood_sample
    from desco_tpu.graph.canonical import Neighborhood
    from desco_tpu.graph.container import Graph
    from desco_tpu.models.shmp_gnn import init_shmp, neighborhood_target_config
    from desco_tpu.parallel.halo import halo_shmp_core, partition_typed_graph

    rng = np.random.default_rng(0)
    n, m = args.nodes, args.nodes * args.degree // 2
    e = set()
    while len(e) < m:
        u, v = rng.integers(0, n, 2)
        if u != v:
            e.add((min(u, v), max(u, v)))
    g = Graph(n, np.array(sorted(e), np.int32))
    nb = Neighborhood(graph=g, canonical=n - 1,
                      nodes=np.arange(n, dtype=np.int32))
    s = neighborhood_sample(nb)
    cfg = neighborhood_target_config(layer_num=args.layers,
                                     hidden_dim=args.hidden)
    params = init_shmp(jax.random.PRNGKey(0), cfg)
    n_edges = s.n_edges

    results = {}
    for d in args.devices:
        if d > len(jax.devices()):
            continue
        part = partition_typed_graph(
            n, s.node_type, s.x, s.edge_src, s.edge_dst, s.edge_type, d)
        mesh = Mesh(np.array(jax.devices()[:d]), ("graph",))

        @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("graph")),
                 out_specs=P("graph"))
        def run(params, shard):
            shard = jax.tree_util.tree_map(lambda a: a[0], shard)
            return halo_shmp_core(params, cfg, shard)[None]

        with mesh:
            f = jax.jit(run)
            # block_until_ready returns at enqueue on this platform —
            # end every window with a host read-back (bench.py pattern)
            _ = np.asarray(f(params, part))
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = f(params, part)
            _ = np.asarray(out)
            per = (time.perf_counter() - t0) / args.reps
            n_iters = max(args.reps, int(0.5 / max(per, 1e-6)))
            reps3 = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_iters):
                    out = f(params, part)
                _ = np.asarray(out)
                reps3.append((time.perf_counter() - t0) / n_iters)
            dt = sorted(reps3)[1]
        eps = n_edges * args.layers / dt
        results[d] = eps
        base = results[min(results)]
        eff = eps / (base * d / min(results))
        print(f"D={d}: {dt * 1e3:8.2f} ms/fwd  {eps / 1e6:8.1f}M "
              f"edge-layers/s  efficiency {eff * 100:5.1f}%  "
              f"(halo slots/dev: {part.h_max})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
