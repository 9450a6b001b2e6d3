"""End-to-end serving throughput: graphs in -> graphlet counts out.

Measures the FULL inference pipeline on fresh synthetic graphs (no
caches): canonical decomposition + triangle typing + packing (host),
stage-1 SHMP prediction (device), combinatorial clamp + optional exact
tail verification, gossip refinement (device), graph-level aggregation.
Reports per-phase seconds and one graphs/s / nodes/s summary — the
BASELINE.md north-star serving metric.

Usage: python analysis/serving_bench.py [--graphs 64] [--min 30]
       [--max 120] [--verify 0.001] [--platform cpu]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=64)
    ap.add_argument("--min", type=int, default=30)
    ap.add_argument("--max", type=int, default=120)
    ap.add_argument("--verify", type=float, default=0.001)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import dataclasses
    import tempfile

    from desco_tpu.data.synthetic import generate_synthetic
    from desco_tpu.models import neighborhood as neigh_mod
    from desco_tpu.pipeline import (
        PipelineConfig,
        build_query_batch,
        model_configs,
        neighborhood_predictions,
        prepare_gossip_batches,
        prepare_stage_data,
    )
    from desco_tpu.train.loop import predict_gossip_counts
    from desco_tpu.models.gossip import init_gossip_model

    graphs = generate_synthetic(args.graphs, min_size=args.min,
                                max_size=args.max, seed=args.seed)
    n_nodes = sum(g.n_nodes for g in graphs)
    n_edges = sum(g.n_edges for g in graphs)
    print(f"{len(graphs)} graphs, {n_nodes} nodes, {n_edges} edges")

    cfg = PipelineConfig(
        data_root=tempfile.mkdtemp(prefix="serve_bench_"),
        clamp_counts=True, verify_budget=args.verify)
    tgt_cfg, qry_cfg = model_configs(cfg)
    qb = build_query_batch(cfg)
    params = neigh_mod.init_neighborhood_model(
        jax.random.PRNGKey(0), tgt_cfg, qry_cfg)
    gparams = init_gossip_model(
        jax.random.PRNGKey(1), input_dim=1,
        hidden_dim=cfg.gossip_hidden_dim,
        emb_channels=cfg.neigh_hidden_dim,
        layer_num=cfg.gossip_layer_num)

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    # need_truth=False: serving has no labels — only decomposition,
    # typing, packing
    stage = prepare_stage_data(cfg, graphs, "serve_bench",
                               need_truth=False)
    t_host = time.perf_counter() - t0

    t0 = time.perf_counter()
    counts, _ = neighborhood_predictions(
        params, tgt_cfg, qry_cfg, qb, stage, cfg, return_verified=True)
    t_stage1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    gb = prepare_gossip_batches(cfg, stage, counts)
    query_embs = neigh_mod.embed_queries(params, qry_cfg, qb)
    node_counts = predict_gossip_counts(gparams, query_embs, gb)
    graphlet = stage.workload.aggregate_node_counts(node_counts)
    t_gossip = time.perf_counter() - t0
    dt = time.perf_counter() - t_all

    # warm pass: same shapes -> jit cache hits. Steady-state serving
    # (a stream of batches at fixed capacities) runs at THIS rate.
    t0 = time.perf_counter()
    counts, _ = neighborhood_predictions(
        params, tgt_cfg, qry_cfg, qb, stage, cfg, return_verified=True)
    w_stage1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    gb = prepare_gossip_batches(cfg, stage, counts)
    node_counts = predict_gossip_counts(gparams, query_embs, gb)
    graphlet = stage.workload.aggregate_node_counts(node_counts)
    w_gossip = time.perf_counter() - t0
    w_total = t_host + w_stage1 + w_gossip

    print(f"host decompose+pack: {t_host:.2f}s")
    print(f"stage-1 predict+clamp+verify: cold {t_stage1:.2f}s / "
          f"warm {w_stage1:.2f}s")
    print(f"gossip refine+aggregate: cold {t_gossip:.2f}s / "
          f"warm {w_gossip:.2f}s")
    print(f"COLD  {dt:.2f}s -> {len(graphs) / dt:.1f} graphs/s")
    print(f"WARM  {w_total:.2f}s -> {len(graphs) / w_total:.1f} graphs/s, "
          f"{n_nodes / w_total:.0f} nodes/s "
          f"(graphlet shape {graphlet.shape})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
