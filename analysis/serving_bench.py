"""End-to-end serving throughput: graphs in -> graphlet counts out.

Measures the FULL inference pipeline on fresh synthetic graphs (no
caches): canonical decomposition + triangle typing + packing (host),
stage-1 SHMP prediction (device), combinatorial clamp + optional exact
tail verification, gossip refinement (device), graph-level aggregation.
Reports per-phase seconds and one graphs/s / nodes/s summary — the
BASELINE.md north-star serving metric.

Usage: python analysis/serving_bench.py [--graphs 64] [--min 30]
       [--max 120] [--verify 0.001] [--platform cpu]
       [--mode raw|service|stream|latency]

Modes: ``raw`` drives the pipeline functions directly (the historical
harness); ``service`` drives the public ``CountingService.count`` API;
``stream`` drives ``count_stream`` (host prep of request k+1 overlaps
device compute of request k — the steady-state production shape);
``latency`` reports warm single-graph p50/p90/p99 via ``count_graph``.
Pass --neigh_ckpt/--gossip_ckpt to bench trained weights; defaults are
random-init (throughput is weight-independent).
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
    ap.add_argument("--mode", default="raw",
                    choices=["raw", "service", "stream", "latency"])
    ap.add_argument("--requests", type=int, default=8,
                    help="stream mode: number of --graphs-sized requests")
    ap.add_argument("--neigh_ckpt", default=None, nargs="+",
                    help="one path, or several for a serving ensemble")
    ap.add_argument("--gossip_ckpt", default=None)
    ap.add_argument("--n_devices", type=int, default=1,
                    help="service modes: DP-serve over this many devices")
    ap.add_argument("--exact_size", type=int, default=0,
                    help="recount queries with <= N nodes exactly "
                         "(serving knob; measures its cost)")
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

    if args.mode != "raw":
        return service_modes(args, graphs, n_nodes)

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


def service_modes(args, graphs, n_nodes: int) -> int:
    """service / stream / latency modes over the public API."""
    import dataclasses
    import tempfile

    import jax

    from desco_tpu.data.synthetic import generate_synthetic
    from desco_tpu.models import neighborhood as neigh_mod
    from desco_tpu.models.gossip import init_gossip_model
    from desco_tpu.pipeline import PipelineConfig, model_configs
    from desco_tpu.serving import CountingService
    from desco_tpu.train.checkpoint import save_checkpoint

    cfg = PipelineConfig(
        data_root=tempfile.mkdtemp(prefix="serve_bench_"),
        clamp_counts=True, verify_budget=args.verify)
    np_path, gp_path = args.neigh_ckpt, args.gossip_ckpt
    if isinstance(np_path, list) and len(np_path) == 1:
        np_path = np_path[0]
    if np_path is None:
        tgt, qry = model_configs(cfg)
        params = neigh_mod.init_neighborhood_model(
            jax.random.PRNGKey(0), tgt, qry)
        gparams = init_gossip_model(
            jax.random.PRNGKey(1), input_dim=1,
            hidden_dim=cfg.gossip_hidden_dim,
            emb_channels=cfg.neigh_hidden_dim,
            layer_num=cfg.gossip_layer_num)
        root = tempfile.mkdtemp(prefix="serve_bench_ckpt_")
        np_path, gp_path = root + "/neigh", root + "/gossip"
        blob = dataclasses.asdict(cfg)
        save_checkpoint(np_path, params, config=blob)
        save_checkpoint(gp_path, gparams, config=blob)
    svc = CountingService(
        np_path, gp_path, n_devices=args.n_devices,
        config_overrides={"verify_budget": args.verify,
                          "exact_size": args.exact_size,
                          "data_root": cfg.data_root})

    # warm-up: compile + pin capacities on a representative request
    t0 = time.perf_counter()
    svc.count(graphs)
    print(f"cold first request: {time.perf_counter() - t0:.2f}s")

    if args.mode == "service":
        t0 = time.perf_counter()
        res = svc.count(graphs)
        dt = time.perf_counter() - t0
        print(f"WARM service.count  {dt:.2f}s -> "
              f"{len(graphs) / dt:.1f} graphs/s, {n_nodes / dt:.0f} "
              f"nodes/s (graphlet shape {res.graphlet_counts.shape})")
    elif args.mode == "stream":
        reqs = [generate_synthetic(args.graphs, min_size=args.min,
                                   max_size=args.max, seed=args.seed + i)
                for i in range(args.requests)]
        total_g = sum(len(r) for r in reqs)
        total_n = sum(g.n_nodes for r in reqs for g in r)
        # sequential per-request calls vs the pipelined stream
        t0 = time.perf_counter()
        for r in reqs:
            svc.count(r)
        seq = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_out = sum(1 for _ in svc.count_stream(reqs, prefetch=2))
        pipe = time.perf_counter() - t0
        assert n_out == len(reqs)
        print(f"sequential {seq:.2f}s ({total_g / seq:.1f} graphs/s) | "
              f"pipelined {pipe:.2f}s ({total_g / pipe:.1f} graphs/s, "
              f"{total_n / pipe:.0f} nodes/s) | overlap gain "
              f"{seq / pipe:.2f}x")
    else:  # latency
        # warm every capacity bucket these singles will land in (one
        # compile per pow2 bucket, a one-time cost in steady state)
        for g in graphs:
            svc.count_graph(g)
        lat = []
        for g in graphs:
            t0 = time.perf_counter()
            svc.count_graph(g)
            lat.append(time.perf_counter() - t0)
        # pinned capacities make every single-graph request the same
        # packed shape as the warm-up -> all calls after the first are
        # jit-cache hits; the distribution is true warm serving latency
        lat_ms = np.sort(np.asarray(lat) * 1e3)
        print(f"single-graph latency over {len(lat_ms)} graphs: "
              f"p50 {np.percentile(lat_ms, 50):.1f}ms  "
              f"p90 {np.percentile(lat_ms, 90):.1f}ms  "
              f"p99 {np.percentile(lat_ms, 99):.1f}ms  "
              f"(min {lat_ms[0]:.1f}, max {lat_ms[-1]:.1f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
