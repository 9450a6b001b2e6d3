"""Differential profile of the real bench forward: where does the time go?

Times the full neighborhood forward under different aggregation modes,
plus a 'noagg' variant (conv transform without gather/scatter) and a
'nocount' variant (embedding towers only, no 29-query count head), so the
aggregate's and head's shares fall out by subtraction. Also reports the
workload's actual shapes.

    timeout 590 python scripts/fwd_profile.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=30):
    out = fn(*args)
    _ = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main():
    import dataclasses

    import jax

    from bench import build_workload
    from desco_tpu.models import neighborhood as neigh_mod
    from desco_tpu.models.shmp_gnn import (
        apply_shmp, neighborhood_target_config, query_config,
    )
    import desco_tpu.models.shmp_gnn as shmp

    batch, qb = build_workload()
    print(f"batch: n_cap={batch.n_cap} e_cap={batch.e_cap} "
          f"g_cap={batch.g_cap} valid_edges="
          f"{int((np.asarray(batch.node_mask)[np.asarray(batch.edge_src)] > 0).sum())}",
          flush=True)

    qry_cfg = query_config(layer_num=8, hidden_dim=64, output_dim=64)
    cfgs = {
        mode: neighborhood_target_config(
            layer_num=8, hidden_dim=64, output_dim=64, agg_mode=mode)
        for mode in ("aggregate_first", "transform_first", "pallas")
    }
    params = neigh_mod.init_neighborhood_model(
        jax.random.PRNGKey(0), cfgs["aggregate_first"], qry_cfg)
    batch = jax.device_put(batch)
    qb = jax.device_put(qb)
    params = jax.device_put(params)

    valid_edges = int((np.asarray(batch.node_mask)[
        np.asarray(batch.edge_src)] > 0).sum())

    for mode, cfg in cfgs.items():
        f = jax.jit(lambda p, b, q, cfg=cfg: neigh_mod.predict_counts(
            p, cfg, qry_cfg, b, q))
        dt = timeit(f, params, batch, qb)
        print(f"full fwd [{mode}]: {dt * 1e3:.2f} ms "
              f"({valid_edges / dt / 1e6:.1f}M edges/s)", flush=True)

    # noagg: replace the aggregation with a plain matmul (keeps pre/update
    # linears, skip/anchor/pool/count head) — the non-aggregate floor
    orig = shmp.packed_aggregator

    def noagg_aggregator(cfg, batch):
        def agg_fn(x, conv_w):
            return x @ conv_w[0]
        return agg_fn

    shmp.packed_aggregator = noagg_aggregator
    try:
        cfg = cfgs["aggregate_first"]
        f = jax.jit(lambda p, b, q: neigh_mod.predict_counts(
            p, cfg, qry_cfg, b, q))
        dt = timeit(f, params, batch, qb)
        print(f"full fwd [noagg floor]: {dt * 1e3:.2f} ms", flush=True)
    finally:
        shmp.packed_aggregator = orig

    # towers only (no count head): isolates the head's share
    cfg = cfgs["aggregate_first"]
    f = jax.jit(lambda p, b: apply_shmp(p["target"], cfg, b))
    dt = timeit(f, params, batch)
    print(f"target tower only [aggregate_first]: {dt * 1e3:.2f} ms",
          flush=True)
    cfgp = cfgs["pallas"]
    f = jax.jit(lambda p, b: apply_shmp(p["target"], cfgp, b))
    dt = timeit(f, params, batch)
    print(f"target tower only [pallas]: {dt * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
