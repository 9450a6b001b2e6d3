"""desco_tpu CLI driver — the counterpart of the reference's main.py.

Usage (mirrors README.md:38,59 of the reference):
    python main.py --train_neigh --train_gossip --test_gossip \
        --train_dataset Syn_1827 --test_dataset MUTAG

Pipeline: load datasets -> exact ground truth (C++ VF2) -> canonical
partition -> train/eval SHMP neighborhood model -> scatter counts into
gossip features -> train/eval gossip model -> CSV outputs + normed
MSE/MAE per query size (reference main.py:31-517).
"""

from __future__ import annotations

import dataclasses
import datetime
import json
import os
import sys
import time

import numpy as np

from desco_tpu.analysis import round_relu
from desco_tpu.config import build_parser, to_pipeline_config
from desco_tpu.data.datasets import load_data
from desco_tpu.models import neighborhood as neigh_mod
from desco_tpu.models.shmp_gnn import SHMPConfig
from desco_tpu.pipeline import (
    apply_verified_override,
    build_query_batch,
    clamp_node_counts,
    evaluate_graphlet_counts,
    model_configs,
    neighborhood_predictions,
    prepare_gossip_batches,
    prepare_stage_data,
    train_gossip_stage,
    train_neighborhood_stage,
)
from desco_tpu.train.checkpoint import load_checkpoint
from desco_tpu.train.loop import predict_gossip_counts
from desco_tpu.models.gossip import gate_values, init_gossip_model


class _phase:
    """Wall-clock phase timer: serving runs are minutes-scale and the
    cost split (host packing vs device predict vs VF2 verify) is the
    first question when one is slow."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        print(f"[timing] {self.name}: "
              f"{time.perf_counter() - self.t0:.1f}s", flush=True)


def main(argv=None) -> int:
    # honor JAX_PLATFORMS=cpu even when a TPU plugin was registered at
    # interpreter start (this container's sitecustomize does; the env
    # var alone is silently ignored then)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    args = build_parser().parse_args(argv)
    cfg = to_pipeline_config(args)

    # Eval-only runs (--neigh_checkpoint without --train_neigh) adopt the
    # checkpoint's model/feature fields — mirroring CountingService's
    # config rehydration (serving.py:_rehydrate_config). Without this, a
    # checkpoint trained with e.g. --neigh_degree_feature or
    # --neigh_order 4 evaluated without the matching flags would stage
    # samples with DIFFERENT edge typing/features than it was trained
    # on and produce silently-wrong counts (same-shaped params load
    # fine). Each adopted difference is announced.
    if not args.train_neigh and args.neigh_checkpoint:
        _MODEL_FIELDS = (
            "query_sizes", "depth", "use_hetero", "use_tconv", "order",
            "conv_type", "neigh_layer_num", "neigh_hidden_dim",
            "neigh_input_dim", "degree_feature", "use_node_feature",
            "custom_query_ids", "gossip_layer_num", "gossip_hidden_dim")
        try:
            with open(args.neigh_checkpoint[0] + ".json") as f:
                _saved = (json.load(f).get("config") or {})
        except (OSError, ValueError):
            _saved = {}
        _adopt = {}
        for k in _MODEL_FIELDS:
            if k not in _saved:
                continue
            v = _saved[k]
            if isinstance(v, list):
                v = tuple(v)
            if getattr(cfg, k) != v:
                print(f"adopting {k}={v!r} from checkpoint config "
                      f"(CLI had {getattr(cfg, k)!r})")
                _adopt[k] = v
        if _adopt:
            cfg = dataclasses.replace(cfg, **_adopt)

    if args.compile_cache:
        from desco_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)

    output_dir = args.output_dir or os.path.join(
        "output", args.test_dataset,
        datetime.datetime.now().strftime("%Y%m%d_%H%M%S"))
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir,
                           f"config_{args.test_dataset}.txt"), "w") as f:
        json.dump({"args": vars(args),
                   "pipeline": dataclasses.asdict(cfg)}, f, indent=2)

    # ---------------------------------------------------------- datasets
    print(f"loading datasets: train={args.train_dataset} "
          f"valid={args.valid_dataset} test={args.test_dataset}")
    qb = build_query_batch(cfg)
    tgt_cfg, qry_cfg = model_configs(cfg)

    # datasets load exactly as named (reference main.py:90-100: the
    # README train command uses the FULL Syn_1827 for both train and
    # valid). Explicit splits remain available via the _train/_val/_test
    # name suffixes load_data parses (data.py:104-115 conventions).
    train_needed = args.train_neigh or args.train_gossip
    if train_needed:
        train_graphs = load_data(args.train_dataset, cfg.data_root,
                                 with_labels=cfg.use_node_feature)
        val_graphs = (
            train_graphs if args.valid_dataset == args.train_dataset
            else load_data(args.valid_dataset, cfg.data_root,
                           with_labels=cfg.use_node_feature))
        train_stage = prepare_stage_data(
            cfg, train_graphs, args.train_dataset)
        val_stage = (
            train_stage if args.valid_dataset == args.train_dataset
            else prepare_stage_data(cfg, val_graphs, args.valid_dataset))
    with _phase(f"load+stage {args.test_dataset}"):
        test_graphs = load_data(args.test_dataset, cfg.data_root,
                                with_labels=cfg.use_node_feature)
        test_stage = prepare_stage_data(cfg, test_graphs,
                                        args.test_dataset)

    # ---------------------------------------------- neighborhood stage
    import jax

    # DP mesh (reference main.py:242-255 wires Lightning DDP from
    # --gpu); n_devices 0 = all available, 1 = explicit single-device.
    # Both training stages and serving shard over the mesh's `data`
    # axis (parallel/dp.py) — bit-identical to single-device.
    mesh = None
    n_avail = len(jax.devices())
    n_dev = min(args.n_devices if args.n_devices > 0 else n_avail, n_avail)
    if n_dev > 1:
        from desco_tpu.parallel.dp import make_mesh

        mesh = make_mesh(n_dev)
        print(f"data-parallel mesh: {mesh.devices.size} devices")

    if args.train_neigh:
        print("training neighborhood model...")
        res, tgt_cfg, qry_cfg = train_neighborhood_stage(
            cfg, train_stage, val_stage, qb, mesh=mesh,
            ckpt_path=args.neigh_model_path, resume=args.resume)
        neigh_params = res.best_params
        print(f"best neighborhood val loss: {res.best_val:.5f}")
    else:
        ckpts = args.neigh_checkpoint
        if not ckpts:
            raise SystemExit("need --train_neigh or --neigh_checkpoint")
        template = neigh_mod.init_neighborhood_model(
            jax.random.PRNGKey(0), tgt_cfg, qry_cfg)
        members = [load_checkpoint(c, template)[0] for c in ckpts]
        # several checkpoints -> serve their ensemble (pipeline.py
        # averages stage-1 predictions in log2(count+1) space)
        neigh_params = members[0] if len(members) == 1 else members
        print(f"loaded neighborhood model from {', '.join(ckpts)}")

    # stage-1 predictions (verified rows carry EXACT counts)
    with _phase("stage-1 predict+verify (test)"):
        counts_test, verified_rows = neighborhood_predictions(
            neigh_params, tgt_cfg, qry_cfg, qb, test_stage, cfg,
            return_verified=True, mesh=mesh)
    counts = {"test": counts_test}
    # train/val stage-1 predictions feed ONLY gossip training — skip
    # the full-train-set forward + VF2 tail recounts otherwise
    if args.train_gossip:
        counts["train"] = neighborhood_predictions(
            neigh_params, tgt_cfg, qry_cfg, qb, train_stage, cfg,
            mesh=mesh)
        counts["val"] = (
            counts["train"] if val_stage is train_stage
            else neighborhood_predictions(
                neigh_params, tgt_cfg, qry_cfg, qb, val_stage, cfg,
                mesh=mesh))

    # ---------------------------------------------------- gossip stage
    skip_gossip = not (args.train_gossip or args.test_gossip)
    gossip_node_counts = None
    if not skip_gossip:
        with _phase("gossip batch prep (test)"):
            test_gbatches = prepare_gossip_batches(cfg, test_stage,
                                                   counts["test"])
        if args.train_gossip:
            print("training gossip model...")
            train_gb = prepare_gossip_batches(cfg, train_stage,
                                              counts["train"])
            val_gb = (train_gb if val_stage is train_stage
                      else prepare_gossip_batches(cfg, val_stage,
                                                  counts["val"]))
            gres, query_embs = train_gossip_stage(
                cfg,
                neigh_params[0] if isinstance(neigh_params, list)
                else neigh_params,
                tgt_cfg, qry_cfg, qb, train_gb, val_gb,
                mesh=mesh,
                ckpt_path=args.gossip_model_path, resume=args.resume)
            gossip_params = gres.best_params
            print(f"best gossip val loss: {gres.best_val:.5f}")
        else:
            ckpt = args.gossip_checkpoint
            if ckpt is None:
                raise SystemExit(
                    "need --train_gossip or --gossip_checkpoint")
            template = init_gossip_model(
                jax.random.PRNGKey(1), input_dim=1,
                hidden_dim=cfg.gossip_hidden_dim,
                emb_channels=cfg.neigh_hidden_dim,
                layer_num=cfg.gossip_layer_num)
            gossip_params, _, _ = load_checkpoint(ckpt, template)
            # gossip conditions on ONE query tower; with an ensemble,
            # the first member's embeddings are the representative
            query_embs = neigh_mod.embed_queries(
                neigh_params[0] if isinstance(neigh_params, list)
                else neigh_params, qry_cfg, qb)
            print(f"loaded gossip model from {ckpt}")

        with _phase("gossip predict (test)"):
            if mesh is not None and int(mesh.devices.size) > 1:
                from desco_tpu.parallel.dp import dp_predict_gossip_counts

                gossip_node_counts = dp_predict_gossip_counts(
                    gossip_params, query_embs, test_gbatches, mesh)
            else:
                gossip_node_counts = predict_gossip_counts(
                    gossip_params, query_embs, test_gbatches)
        if cfg.clamp_counts:
            # same combinatorial bound as stage 1, applied to the
            # refined per-node counts (gossip residuals can overshoot
            # on OOD tails); verified-exact rows are restored after
            gossip_node_counts = clamp_node_counts(
                gossip_node_counts, test_stage, cfg,
                canonical_type=tgt_cfg.canonical_type)
        gossip_node_counts = apply_verified_override(
            gossip_node_counts, counts["test"], verified_rows,
            test_stage.nindex)
        if cfg.exact_size > 0:
            from desco_tpu.pipeline import (
                apply_exact_column_override, exact_columns)

            gossip_node_counts = apply_exact_column_override(
                gossip_node_counts, counts["test"], exact_columns(cfg),
                test_stage.nindex)

        # gossip gate analysis (main.py:432-439)
        gates = np.asarray(gate_values(gossip_params, query_embs))
        _save_csv(output_dir, f"gossip_gate_{args.test_dataset}.csv", gates)

    # -------------------------------------------------------- outputs
    wl = test_stage.workload
    graphlet_neigh = wl.aggregate_neighborhood_counts(
        counts["test"], test_stage.nindex)
    _save_csv(output_dir, f"neighborhood_graphlet_{args.test_dataset}.csv",
              round_relu(graphlet_neigh))
    _save_csv(output_dir, f"neighborhood_node_{args.test_dataset}_results.csv",
              counts["test"])
    _save_csv(output_dir, f"neighborhood_node_{args.test_dataset}_index.csv",
              test_stage.nindex.index)
    final_graphlet = graphlet_neigh
    if gossip_node_counts is not None:
        graphlet_gossip = wl.aggregate_node_counts(gossip_node_counts)
        final_graphlet = graphlet_gossip
        _save_csv(output_dir, f"gossip_graphlet_{args.test_dataset}.csv",
                  round_relu(graphlet_gossip))
        _save_csv(output_dir, f"gossip_node_{args.test_dataset}_results.csv",
                  gossip_node_counts)
    # the pipeline's final graphlet counts (gossip-refined when stage 3
    # ran, stage-1 otherwise) + exact truth, for external analysis
    _save_csv(output_dir, f"graphlet_count_{args.test_dataset}.csv",
              round_relu(final_graphlet))
    _save_csv(output_dir, f"graphlet_truth_{args.test_dataset}.csv",
              wl.aggregate_node_counts(test_stage.truth))
    # the test graphs themselves, for external analysis (the reference
    # pickles nx graphs, main.py:444-449; flat arrays instead of pickle)
    np.savez_compressed(
        os.path.join(output_dir, f"test_graphs_{args.test_dataset}.npz"),
        edges=np.concatenate([g.edges for g in test_graphs], axis=0),
        edge_offsets=np.concatenate(
            [[0], np.cumsum([g.n_edges for g in test_graphs])]),
        n_nodes=np.array([g.n_nodes for g in test_graphs]))

    # -------------------------------------------------------- analysis
    metrics = evaluate_graphlet_counts(cfg, test_stage, counts["test"],
                                       gossip_node_counts)
    for k, v in metrics.items():
        print(f"graphlet_{k}: {v}")
    with open(os.path.join(
            output_dir, f"analyze_results_{args.test_dataset}.txt"),
            "w") as f:
        for k, v in metrics.items():
            f.write(f"graphlet_{k}: {v}\n")
    print("done")
    return 0


def _save_csv(output_dir: str, name: str, arr: np.ndarray) -> None:
    arr = np.asarray(arr)
    if arr.ndim == 1:
        arr = arr[:, None]
    header = "," + ",".join(str(i) for i in range(arr.shape[1]))
    rows = "\n".join(
        f"{i}," + ",".join(repr(float(x)) for x in row)
        for i, row in enumerate(arr))
    with open(os.path.join(output_dir, name), "w") as f:
        f.write(header + "\n" + rows + "\n")


if __name__ == "__main__":
    sys.exit(main())
