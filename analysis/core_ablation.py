"""In-graph ablation of the 8-layer SHMP core: time the full core and
variants with constituent ops removed, all INSIDE one jit each, so
per-call dispatch overhead (large on the tunneled platform) cancels.

Each variant keeps the same layer loop and data flow shape; the delta
vs 'full' attributes real in-graph time to the removed op.

Usage: python analysis/core_ablation.py [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from desco_tpu.models.shmp_gnn import (
        SHMPConfig, _per_type_linear, init_shmp,
        neighborhood_target_config,
    )
    from desco_tpu.ops.pallas_segment import (
        LANES, default_agg_mode, pallas_sorted_segment_sum,
    )

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    batch, _ = build_workload()
    cfg = neighborhood_target_config(layer_num=8, hidden_dim=64,
                                     output_dim=64, dtype=dtype,
                                     agg_mode=default_agg_mode())
    params = init_shmp(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)
    batch = jax.device_put(batch)
    t_n, h = cfg.n_edge_types, cfg.hidden_dim
    n = batch.n_cap
    keys = (batch.edge_dst.astype(jnp.int32) * t_n
            + batch.edge_type.astype(jnp.int32))
    dst = (keys // t_n).astype(jnp.int32)
    typ = (keys - dst * t_n).astype(jnp.int32)
    idx = jnp.clip(typ, 0, t_n - 1) * n + batch.edge_src.astype(jnp.int32)

    def core(params, batch, *, do_transform=True, do_gather=True,
             do_segsum=True, do_update=True):
        nmask = batch.node_mask[:, None].astype(cfg.dtype)
        ntype = batch.node_type
        x = _per_type_linear(batch.x.astype(cfg.dtype),
                             params["pre"][0], params["pre"][1],
                             ntype, cfg.n_node_types)
        x = x * nmask
        embs = [x]
        for l in range(cfg.layer_num):
            conv_w = params["conv"][0][l]
            if do_transform:
                z = jnp.einsum("nh,thk->tnk", x, conv_w).reshape(
                    t_n * n, h)
            else:
                z = jnp.tile(x, (t_n, 1))  # same shape, no matmul
            zp = jnp.zeros((t_n * n, LANES), jnp.bfloat16)
            zp = zp.at[:, :h].set(z.astype(jnp.bfloat16))
            if do_gather:
                msgs = jnp.take(zp, idx, axis=0, fill_value=0.0)
            else:
                msgs = jax.lax.dynamic_slice_in_dim(
                    jnp.tile(zp, (batch.e_cap // zp.shape[0] + 1, 1)),
                    0, batch.e_cap, 0)
            if do_segsum:
                x_neigh = pallas_sorted_segment_sum(
                    msgs, dst, n)[:, :h].astype(cfg.dtype)
            else:
                x_neigh = msgs[:n, :h].astype(cfg.dtype)
            if do_update:
                upd_in = jnp.concatenate([x_neigh, x], axis=-1)
                x = _per_type_linear(upd_in, params["upd"][0][l],
                                     params["upd"][1][l], ntype,
                                     cfg.n_node_types)
            else:
                x = x_neigh
            x = jax.nn.relu(x) * nmask
            embs.append(x)
        return jnp.concatenate(embs, axis=-1).sum()

    def timeit(fn):
        out = fn(params, batch)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(params, batch)
        _ = np.asarray(out)
        per = (time.perf_counter() - t0) / 5
        iters = max(20, int(1.0 / max(per, 1e-6)))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(params, batch)
            _ = np.asarray(out)
            reps.append((time.perf_counter() - t0) / iters)
        return sorted(reps)[1]

    import functools
    variants = [
        ("full", {}),
        ("no transform", {"do_transform": False}),
        ("no gather", {"do_gather": False}),
        ("no segsum", {"do_segsum": False}),
        ("no update", {"do_update": False}),
        ("segsum only", {"do_transform": False, "do_gather": False,
                         "do_update": False}),
    ]
    base = None
    for name, kw in variants:
        fn = jax.jit(functools.partial(core, **kw))
        dt = timeit(fn)
        if name == "full":
            base = dt
            print(f"{name:>16}: {dt * 1e3:7.3f} ms")
        else:
            print(f"{name:>16}: {dt * 1e3:7.3f} ms  (delta "
                  f"{(base - dt) * 1e3:+6.3f} ms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
