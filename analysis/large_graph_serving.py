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
    from desco_tpu.graph.container import Graph
    from desco_tpu.models import neighborhood as neigh_mod
    from desco_tpu.models.gossip import init_gossip_model
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

    # ---- stage 2: gossip halo-sharded over the graph axis (the same
    # library path CountingService.count_large_graph serves from)
    from desco_tpu.parallel.halo import serve_gossip_counts

    d = args.devices
    gparams = init_gossip_model(
        jax.random.PRNGKey(1), input_dim=1,
        hidden_dim=cfg.gossip_hidden_dim,
        emb_channels=cfg.neigh_hidden_dim,
        layer_num=cfg.gossip_layer_num)
    query_embs = neigh_mod.embed_queries(params, qry_cfg, qb)

    t0 = time.perf_counter()
    refined, stats = serve_gossip_counts(gparams, g, x_all, query_embs,
                                         n_devices=d, return_stats=True)
    t_s2 = time.perf_counter() - t0
    graphlet = np.maximum(np.round(refined), 0).sum(0)
    assert np.all(np.isfinite(graphlet))
    print(f"stage 2 (halo, D={d}): partition+predict {t_s2:.1f}s")
    print(f"graphlet counts (first 5 queries): {graphlet[:5].tolist()}")
    print(f"TOTAL {t_prep + t_s1 + t_s2:.1f}s — no device ever "
          f"held more than {stats['n_loc']}/{n} nodes in stage 2")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
