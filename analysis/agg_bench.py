"""A/B the SHMP typed-aggregation modes on the current platform.

Times the full 8-layer SHMP core forward (and optionally the train-step
value+grad) per agg_mode on the bench.py workload, with host read-back
timing (block_until_ready returns at enqueue on the axon platform).

Usage: python analysis/agg_bench.py [--modes pallas cumsum ...] [--grad]
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
    ap.add_argument("--modes", nargs="+",
                    default=["aggregate_first", "transform_first",
                             "cumsum", "pallas"])
    ap.add_argument("--grad", action="store_true",
                    help="also time value_and_grad of a sum loss")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from bench import build_workload
    from desco_tpu.models.shmp_gnn import (
        apply_shmp_core, init_shmp, neighborhood_target_config,
    )

    batch, _ = build_workload()
    valid_edges = int((np.asarray(batch.node_mask)[
        np.asarray(batch.edge_src)] > 0).sum())
    print(f"workload: n_cap={batch.n_cap} e_cap={batch.e_cap} "
          f"valid_edges={valid_edges}")

    base = neighborhood_target_config(layer_num=8, hidden_dim=64,
                                      output_dim=64)
    params = init_shmp(jax.random.PRNGKey(0), base)
    batch = jax.device_put(batch)
    params = jax.device_put(params)

    def timeit(fn, *a):
        out = fn(*a)
        _ = jax.tree_util.tree_map(np.asarray, out)  # compile+complete
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*a)
        _ = jax.tree_util.tree_map(np.asarray, out)
        per = (time.perf_counter() - t0) / 5
        iters = max(10, int(1.0 / max(per, 1e-6)))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*a)
            _ = jax.tree_util.tree_map(np.asarray, out)
            reps.append((time.perf_counter() - t0) / iters)
        return sorted(reps)[1]

    for mode in args.modes:
        cfg = dataclasses.replace(base, agg_mode=mode)
        # reduce to a scalar INSIDE jit: the [N, 576] core output is
        # ~50MB — reading it back over the device tunnel would dwarf
        # the compute being measured
        fwd = jax.jit(lambda p, b: apply_shmp_core(p, cfg, b).sum())
        try:
            dt = timeit(fwd, params, batch)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:>16}: FAILED ({type(e).__name__}: {e})")
            continue
        el = valid_edges * 8 / dt
        print(f"{mode:>16}: {dt * 1e3:8.2f} ms/fwd   "
              f"{el / 1e6:8.1f}M edge-layers/s")
        if args.grad:
            loss = jax.jit(jax.value_and_grad(
                lambda p, b: (apply_shmp_core(p, cfg, b) ** 2).sum()))
            dt = timeit(loss, params, batch)
            print(f"{'':>16}  {dt * 1e3:8.2f} ms/val+grad")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
