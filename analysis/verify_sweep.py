"""Serving-knob study: exact-verification budget vs accuracy vs cost.

The serving pipeline recounts the top ``--verify_budget`` fraction of
neighborhoods exactly (per-query-column top-k union, pipeline.py
verify_tail_counts) with the C++ VF2. This sweep quantifies the knob on
a given test dataset: graphlet normed MSE per query size and the
wall-clock of the verification pass, at several budgets.

This is a capability the reference lacks entirely (its 2^pred de-log,
lightning_model.py:195-222, ships unguarded); the sweep shows the
neural/exact trade curve a deployment would tune.

Usage:
  python analysis/verify_sweep.py --dataset EgoProxy \
      --neigh_checkpoint ckpt/r3/neigh.best \
      --budgets 0 0.001 0.01 0.03
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--neigh_checkpoint", nargs="+", required=True)
    p.add_argument("--budgets", type=float, nargs="+",
                   default=[0.0, 1e-3, 1e-2, 3e-2])
    p.add_argument("--data_root", default="data")
    a = p.parse_args()

    import dataclasses

    import jax

    from desco_tpu.data.datasets import load_data
    from desco_tpu.models import neighborhood as neigh_mod
    from desco_tpu.pipeline import (
        PipelineConfig, build_query_batch, evaluate_graphlet_counts,
        model_configs, neighborhood_predictions, prepare_stage_data,
        verify_tail_counts)
    from desco_tpu.train.checkpoint import load_checkpoint

    cfg = PipelineConfig(data_root=a.data_root)
    tgt_cfg, qry_cfg = model_configs(cfg)
    qb = build_query_batch(cfg)
    template = neigh_mod.init_neighborhood_model(
        jax.random.PRNGKey(0), tgt_cfg, qry_cfg)
    members = [load_checkpoint(c, template)[0]
               for c in a.neigh_checkpoint]
    params = members[0] if len(members) == 1 else members

    graphs = load_data(a.dataset, a.data_root)
    stage = prepare_stage_data(cfg, graphs, a.dataset)

    # ONE forward + clamp (budget-independent), then sweep only the
    # verification pass so per-budget wall-clock isolates the knob
    base_cfg = dataclasses.replace(cfg, verify_budget=0.0)
    raw = neighborhood_predictions(
        params, tgt_cfg, qry_cfg, qb, stage, base_cfg)

    print(f"{a.dataset}: {len(graphs)} graphs, "
          f"{raw.shape[0]} neighborhoods")
    print(f"{'budget':>8} {'rows verified':>14} {'verify s':>9} "
          f"  normed MSE q3 / q4 / q5")
    for b in a.budgets:
        if b > 0:
            c = dataclasses.replace(cfg, verify_budget=b)
            t0 = time.perf_counter()
            counts, verified = verify_tail_counts(raw.copy(), stage, c)
            dt = time.perf_counter() - t0
        else:
            counts, verified, dt = raw, np.zeros(0, np.int64), 0.0
        res = evaluate_graphlet_counts(cfg, stage, counts)
        nm = res["norm_mse_neighborhood"]
        print(f"{b:>8g} {len(verified):>14} {dt:>9.1f}   "
              + " / ".join(f"{v:.3e}" for v in nm))
    return 0


if __name__ == "__main__":
    sys.exit(main())
