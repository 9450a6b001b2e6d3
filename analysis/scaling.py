"""Scaling-efficiency harness: halo-partitioned SHMP forward, 1..D devices.

The north-star scaling metric (BASELINE.md): edges/s scaling efficiency
for the edge-partitioned graph with hybrid pull/push halo exchange.

Two efficiencies are reported per device count:

  * strong  — eps(D) / (D * eps(1)).  Meaningful on real multi-chip
    hardware where each chip brings its own compute.  On the CPU mesh of
    this container (FOUR cores shared by all virtual devices) the
    zero-communication ceiling itself saturates near D=2 — strong
    efficiency at D=8 is bounded by core count, not by the halo design,
    so the harness prints the measured ceiling alongside.
  * comm    — T_control(D) / T_halo(D), where the control is the same
    partition with cross-device edges dropped (drop_cross=True): an
    identical-shape zero-communication workload.  This isolates what the
    halo design actually controls (exchange volume + collective count)
    from host-resource saturation it cannot control, and is the number
    expected to transfer to real chips (ICI overlapped with compute).

Graph families: er/ba are expanders — ANY balanced D-cut severs Ω(E)
edges, so communication is intrinsically ~1 feature row per edge and no
partitioner can do better than shrink constants (the hybrid pull/push
min does that). rgg/comm have geometric/community locality where the
BFS ordering + contiguous cuts collapse the halo to the boundary sets.

Usage:
  python analysis/scaling.py --graph comm --locality bfs [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, ".")


def build_graph(kind: str, n: int, degree: int, rng):
    import networkx as nx
    import numpy as np

    if kind == "ba":
        nxg = nx.barabasi_albert_graph(n, max(1, degree // 2), seed=0)
        return np.array(sorted(nxg.edges()), np.int32)
    if kind == "rgg":
        # random geometric graph: radius tuned for ~degree mean
        r = (degree / (np.pi * n)) ** 0.5
        nxg = nx.random_geometric_graph(n, r, seed=0)
        return np.array(sorted(nxg.edges()), np.int32)
    if kind == "comm":
        # 8 ER communities, 1% of edges cross-community
        k = 8
        per = n // k
        m_in = n * degree // 2
        edges = set()
        while len(edges) < m_in:
            c = rng.integers(k)
            u, v = c * per + rng.integers(0, per, 2)
            if u != v:
                edges.add((min(u, v), max(u, v)))
        m_x = m_in // 100
        while len(edges) < m_in + m_x:
            u, v = rng.integers(0, n, 2)
            if u != v and u // per != v // per:
                edges.add((min(u, v), max(u, v)))
        return np.array(sorted(edges), np.int32)
    # er
    m = n * degree // 2
    e = set()
    while len(e) < m:
        u, v = rng.integers(0, n, 2)
        if u != v:
            e.add((min(u, v), max(u, v)))
    return np.array(sorted(e), np.int32)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=20000)
    p.add_argument("--degree", type=int, default=8)
    p.add_argument("--graph", type=str, default="er",
                   choices=["er", "ba", "rgg", "comm"],
                   help="er: uniform random; ba: preferential attachment "
                        "(hub skew); rgg: random geometric (spatial "
                        "locality); comm: 8 ER communities w/ 1%% cross")
    p.add_argument("--locality", type=str, default="metis",
                   choices=["none", "bfs", "metis"],
                   help="node reordering before contiguous cuts: "
                        "multilevel coarsening (metis, recovers "
                        "communities) or BFS")
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--platform", type=str, default="cpu",
                   help="cpu simulates an 8-device mesh; set to 'tpu' on "
                        "real multi-chip hardware")
    p.add_argument("--json", type=str, default=None,
                   help="write the per-D results as a JSON artifact")
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
    from desco_tpu.parallel.halo import (
        halo_shmp_core,
        locality_order,
        partition_typed_graph,
    )

    rng = np.random.default_rng(0)
    n = args.nodes
    raw = build_graph(args.graph, n, args.degree, rng)
    # permute node ids: generators emit structured orders (communities
    # contiguous, BA hubs first) that no real input guarantees — the
    # locality step must EARN its cut, not inherit it
    pm = rng.permutation(n).astype(np.int32)
    g = Graph(n, pm[raw])
    nb = Neighborhood(graph=g, canonical=n - 1,
                      nodes=np.arange(n, dtype=np.int32))
    s = neighborhood_sample(nb)
    cfg = neighborhood_target_config(layer_num=args.layers,
                                     hidden_dim=args.hidden)
    params = init_shmp(jax.random.PRNGKey(0), cfg)
    n_edges = s.n_edges

    node_type, x = s.node_type, s.x
    e_src, e_dst, e_ty = s.edge_src, s.edge_dst, s.edge_type
    if args.locality != "none":
        order = locality_order(n, e_src, e_dst, method=args.locality)
        inv = np.empty_like(order)
        inv[order] = np.arange(n)
        node_type, x = node_type[order], x[order]
        e_src, e_dst = inv[e_src].astype(np.int32), inv[e_dst].astype(
            np.int32)

    def timed(f, *inputs):
        _ = np.asarray(f(*inputs))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(*inputs)
        _ = np.asarray(out)
        per = (time.perf_counter() - t0) / args.reps
        n_iters = max(args.reps, int(0.5 / max(per, 1e-6)))
        reps3 = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = f(*inputs)
            _ = np.asarray(out)
            reps3.append((time.perf_counter() - t0) / n_iters)
        return sorted(reps3)[1]

    results = {}
    rows = []
    for d in args.devices:
        if d > len(jax.devices()):
            continue
        mesh = Mesh(np.array(jax.devices()[:d]), ("graph",))

        @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("graph")),
                 out_specs=P("graph"))
        def run(params, shard):
            shard = jax.tree_util.tree_map(lambda a: a[0], shard)
            return halo_shmp_core(params, cfg, shard)[None]

        part = partition_typed_graph(
            n, node_type, x, e_src, e_dst, e_ty, d,
            n_types=cfg.n_edge_types)
        ctrl = partition_typed_graph(
            n, node_type, x, e_src, e_dst, e_ty, d,
            n_types=cfg.n_edge_types, drop_cross=True)
        with mesh:
            f = jax.jit(run)
            dt = timed(f, params, part)
            dt_ctrl = timed(f, params, ctrl) if d > 1 else dt
        eps = n_edges * args.layers / dt
        results[d] = eps
        base = results[min(results)]
        strong = eps / (base * d / min(results))
        comm = dt_ctrl / dt
        print(f"D={d}: {dt * 1e3:8.2f} ms/fwd  {eps / 1e6:8.1f}M "
              f"edge-layers/s  strong {strong * 100:5.1f}%  "
              f"comm {comm * 100:5.1f}%  (ctrl {dt_ctrl * 1e3:.2f} ms, "
              f"pull/pair {part.h_max}, push/pair {part.p_max})")
        rows.append(dict(d=d, ms_fwd=dt * 1e3, edge_layers_per_s=eps,
                         strong=strong, comm=comm,
                         ctrl_ms=dt_ctrl * 1e3, pull_pair=int(part.h_max),
                         push_pair=int(part.p_max)))
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(dict(
                graph=args.graph, nodes=args.nodes, degree=args.degree,
                locality=args.locality, hidden=args.hidden,
                layers=args.layers, platform=args.platform,
                results=rows), f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
