"""Where the serving forward spends its time, component by component.

Times (host read-back windows, median of 3) on the bench.py workload:
the full counting forward, the target tower alone, the query tower
alone, the count head alone, and the 8-layer core per agg_mode — the
numbers that decide which kernel work pays next.

Usage: python analysis/fwd_breakdown.py [--platform cpu] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from bench import build_workload
    from desco_tpu.models import neighborhood as nm
    from desco_tpu.models.shmp_gnn import (
        apply_shmp, apply_shmp_core, neighborhood_target_config,
        query_config,
    )
    from desco_tpu.ops.pallas_segment import default_agg_mode

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    batch, qb = build_workload()
    tgt = neighborhood_target_config(layer_num=8, hidden_dim=64,
                                     output_dim=64, dtype=dtype,
                                     agg_mode=default_agg_mode())
    qry = query_config(layer_num=8, hidden_dim=64, output_dim=64)
    params = nm.init_neighborhood_model(jax.random.PRNGKey(0), tgt, qry)
    params, batch, qb = jax.device_put((params, batch, qb))
    valid_edges = int((np.asarray(batch.node_mask)[
        np.asarray(batch.edge_src)] > 0).sum())
    print(f"workload: n_cap={batch.n_cap} e_cap={batch.e_cap} "
          f"valid_edges={valid_edges} agg={tgt.agg_mode} dtype={args.dtype}")

    def timeit(fn, *a):
        out = fn(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        per = (time.perf_counter() - t0) / 5
        n = max(10, int(0.5 / max(per, 1e-6)))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*a)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
            reps.append((time.perf_counter() - t0) / n)
        return sorted(reps)[1]

    emb_q = jax.jit(lambda p, q: nm.embed_queries(p, qry, q))(params, qb)
    emb_t = jax.jit(lambda p, b: nm.embed_targets(p, tgt, b))(params, batch)

    rows = [
        ("full predict_counts", jax.jit(
            lambda p, b, q: nm.predict_counts(p, tgt, qry, b, q)),
         (params, batch, qb)),
        ("hoisted-query predict", jax.jit(
            lambda p, b, eq: nm.predict_counts_from_embs(p, tgt, b, eq)),
         (params, batch, emb_q)),
        ("target tower (core+pool+post)", jax.jit(
            lambda p, b: nm.embed_targets(p, tgt, b)), (params, batch)),
        # .sum() inside jit: the raw [N, 576] core output is ~40MB and
        # would be read back over the device tunnel each timing window,
        # dwarfing the compute being measured
        ("target core only", jax.jit(
            lambda p, b: apply_shmp_core(p["target"], tgt, b).sum()),
         (params, batch)),
        ("query tower", jax.jit(
            lambda p, q: nm.embed_queries(p, qry, q)), (params, qb)),
        ("count head", jax.jit(
            lambda p, et, eq: nm.count_head(p, et, eq)),
         (params, emb_t, emb_q)),
    ]
    for name, fn, a in rows:
        dt = timeit(fn, *a)
        print(f"{name:>32}: {dt * 1e3:7.2f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
