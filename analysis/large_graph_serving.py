"""Single-LARGE-graph end-to-end serving: the long-context analog.

Runs the full DeSCo pipeline on ONE big graph (P2P/Astro scale —
SURVEY §5.7): canonical decomposition bounds the stage-1 working set to
depth-d neighborhoods regardless of graph size (packed batches on one
chip), then the gossip refinement — which must see the WHOLE graph —
runs halo-sharded over a ``graph`` mesh axis, one pull/push boundary
exchange per layer per query. The reference processes such graphs whole
on a single device (data.py:753-886); here no device ever holds the
full graph during stage 2.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python analysis/large_graph_serving.py --nodes 20000 --devices 8 \
      --platform cpu
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--query_sizes", type=int, nargs="+", default=[3])
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from desco_tpu.batch.build import gossip_sample
    from desco_tpu.graph.container import Graph
    from desco_tpu.models import neighborhood as neigh_mod
    from desco_tpu.models.gossip import init_gossip_model
    from desco_tpu.parallel.halo import (
        halo_gossip_single,
        locality_order,
        partition_node_values,
        partition_typed_graph,
        unpartition_nodes,
    )
    from desco_tpu.pipeline import (
        PipelineConfig,
        build_query_batch,
        model_configs,
        neighborhood_predictions,
        prepare_stage_data,
    )

    # one big connected sparse graph (BA-style preferential attachment)
    rng = np.random.default_rng(args.seed)
    n = args.nodes
    pairs = set()
    for v in range(1, n):
        m = min(v, max(1, args.degree // 2))
        for t in set(rng.integers(0, v, m).tolist()):
            pairs.add((t, v))
    edges = np.array(sorted(pairs), np.int32)
    g = Graph(n, edges)
    es = np.concatenate([edges[:, 0], edges[:, 1]]).astype(np.int32)
    ed = np.concatenate([edges[:, 1], edges[:, 0]]).astype(np.int32)
    print(f"graph: {n} nodes, {g.n_edges} undirected edges")

    cfg = PipelineConfig(query_sizes=tuple(args.query_sizes),
                         data_root=tempfile.mkdtemp(prefix="lgs_"),
                         clamp_counts=False, verify_budget=0.0)
    tgt_cfg, qry_cfg = model_configs(cfg)
    qb = build_query_batch(cfg)
    params = neigh_mod.init_neighborhood_model(
        jax.random.PRNGKey(0), tgt_cfg, qry_cfg)

    # ---- stage 1: decomposition bounds the working set (packed batches)
    t0 = time.perf_counter()
    stage = prepare_stage_data(cfg, [g], "lgs", need_truth=False)
    t_prep = time.perf_counter() - t0
    t0 = time.perf_counter()
    counts = neighborhood_predictions(params, tgt_cfg, qry_cfg, qb,
                                      stage, cfg)
    t_s1 = time.perf_counter() - t0
    n_q = counts.shape[1]
    print(f"stage 1: {len(stage.samples)} neighborhoods, prep "
          f"{t_prep:.1f}s, predict {t_s1:.1f}s")

    # scatter stage-1 counts to node features (indicator semantics)
    x_all = np.zeros((n, n_q), np.float32)
    x_all[np.asarray(stage.nindex.indicator)] = counts.astype(np.float32)

    # ---- stage 2: gossip halo-sharded over the graph axis
    d = args.devices
    order = locality_order(n, es, ed, method="metis")
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    s = gossip_sample(g, x_all, x_all)  # labels unused at serving
    # relabel into locality order for low cuts
    es_l, ed_l = inv[s.edge_src], inv[s.edge_dst]
    x_l = x_all[order]

    t0 = time.perf_counter()
    part = partition_typed_graph(
        n, s.node_type[order], x_l, es_l.astype(np.int32),
        ed_l.astype(np.int32), s.edge_type, d, n_types=2)
    t_part = time.perf_counter() - t0

    gparams = init_gossip_model(
        jax.random.PRNGKey(1), input_dim=1,
        hidden_dim=cfg.gossip_hidden_dim,
        emb_channels=cfg.neigh_hidden_dim,
        layer_num=cfg.gossip_layer_num)
    query_embs = neigh_mod.embed_queries(params, qry_cfg, qb)

    mesh = Mesh(np.array(jax.devices()[:d]), ("graph",))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("graph"), P("graph"), P()),
             out_specs=P("graph"))
    def run_one(gp, shard, xc, q_emb):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        return halo_gossip_single(gp, shard, xc[0], q_emb)[None]  # [1,n_loc]

    xcols = partition_node_values(part, x_all[order])  # [D, n_loc, Q]
    t0 = time.perf_counter()
    refined = np.empty((n, n_q), np.float32)
    with mesh:
        fn = jax.jit(run_one)
        for qi in range(n_q):
            out = np.asarray(fn(gparams, part, xcols[:, :, qi],
                                query_embs[qi]))  # [D, n_loc]
            refined[:, qi] = (unpartition_nodes(part, out)
                              + x_all[order][:, qi])
    t_s2 = time.perf_counter() - t0
    # back to original node order, graph-level counts
    refined_orig = np.empty_like(refined)
    refined_orig[order] = refined
    graphlet = np.maximum(np.round(refined_orig), 0).sum(0)
    assert np.all(np.isfinite(graphlet))
    print(f"stage 2 (halo, D={d}): partition {t_part:.1f}s, "
          f"predict {t_s2:.1f}s")
    print(f"graphlet counts (first 5 queries): {graphlet[:5].tolist()}")
    print(f"TOTAL {t_prep + t_s1 + t_part + t_s2:.1f}s — no device ever "
          f"held more than {part.n_loc}/{n} nodes in stage 2")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
