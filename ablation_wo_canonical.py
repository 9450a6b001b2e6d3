"""Ablation: no canonical partition (whole-graph counting).

Counterpart of the reference's ablation_wo_canonical.py: the SHMP model
regresses graph-level (graphlet) counts on WHOLE graphs converted as
single-type (union_node) hetero graphs — no neighborhood decomposition,
no anchor node (to_hetero_wo_canonical, lightning_model.py:325-369;
Workload_baseline.generate_wo_canonical_dataset, workload.py:800-833).
Shows the canonical partition is load-bearing.

Usage: python ablation_wo_canonical.py --train_dataset Syn_1827
       --test_dataset Syn_1827_test [--neigh_epoch_num N] ...
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None) -> int:
    import jax

    from desco_tpu.analysis import mae, norm_mse, round_relu
    from desco_tpu.batch.packed import auto_capacities, pack_samples
    from desco_tpu.config import build_parser, to_pipeline_config
    from desco_tpu.data.datasets import load_data
    from desco_tpu.data.workload import Workload
    from desco_tpu.graph.atlas import groupby_size
    from desco_tpu.models import neighborhood as neigh_mod
    from desco_tpu.models.shmp_gnn import query_config
    from desco_tpu.pipeline import build_query_batch
    from desco_tpu.train import loop as train_loop

    args = build_parser().parse_args(argv)
    cfg = to_pipeline_config(args)
    qb = build_query_batch(cfg)

    # both towers are union_node models (no canonical type, anchor unused)
    tgt_cfg = query_config(
        use_tconv=cfg.use_tconv, input_dim=cfg.neigh_input_dim,
        hidden_dim=cfg.neigh_hidden_dim, output_dim=cfg.neigh_hidden_dim,
        layer_num=cfg.neigh_layer_num, conv_type=cfg.conv_type,
        dropout=cfg.neigh_dropout)
    qry_cfg = tgt_cfg

    def stage(name):
        graphs = load_data(name, cfg.data_root)
        wl = Workload(graphs, root=os.path.join(cfg.data_root, name),
                      name=name)
        samples = wl.wo_canonical_samples(cfg.query_ids,
                                          use_tconv=cfg.use_tconv)
        caps = auto_capacities(samples, g_cap=cfg.neigh_batch_size)
        batches = pack_samples(samples, *caps,
                               n_queries=len(cfg.query_ids))
        return wl, samples, batches

    wl_tr, s_tr, b_tr = stage(args.train_dataset + "_train")
    wl_va, s_va, b_va = stage(args.valid_dataset + "_val")
    wl_te, s_te, b_te = stage(args.test_dataset)

    params = neigh_mod.init_neighborhood_model(
        jax.random.PRNGKey(cfg.seed), tgt_cfg, qry_cfg)
    res = train_loop.train_neighborhood(
        params, tgt_cfg, qry_cfg, qb, b_tr, b_va,
        epochs=cfg.neigh_epochs, lr=cfg.neigh_lr,
        weight_decay=cfg.neigh_weight_decay, seed=cfg.seed)
    print(f"best val loss: {res.best_val:.5f}")

    preds = train_loop.predict_neighborhood_counts(
        res.best_params, tgt_cfg, qry_cfg, qb, b_te)
    truth = np.stack([s.y for s in s_te])
    groups = groupby_size(cfg.query_ids)
    nm = norm_mse(round_relu(preds), truth, groups)
    ma = mae(round_relu(preds), truth, groups)
    print(f"wo_canonical graphlet_norm_mse: {nm}")
    print(f"wo_canonical graphlet_mae: {ma}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
