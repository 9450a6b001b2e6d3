"""Micro-bench the SHMP layer's constituent ops on the bench workload.

One layer = transform einsum (z = x @ W_t), gather (z -> edge msgs),
Pallas sorted segment-sum, update linear. Times each alone (host
read-back windows) to show where the per-layer ~0.4 ms goes.

Usage: python analysis/layer_microbench.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from desco_tpu.ops.pallas_segment import (
        LANES, pallas_sorted_segment_sum,
    )

    batch, _ = build_workload()
    n, e = batch.n_cap, batch.e_cap
    t_, h, k = 6, 64, 64
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, h), jnp.float32)
    w = jax.random.normal(key, (t_, h, k), jnp.float32) * 0.1
    keys = jnp.asarray(batch.edge_keys if hasattr(batch, "edge_keys")
                       else batch.edge_dst * t_ + batch.edge_type)
    src = jnp.asarray(batch.edge_src, jnp.int32)
    dst = (keys // t_).astype(jnp.int32)
    typ = (keys - dst * t_).astype(jnp.int32)
    idx = jnp.clip(typ, 0, t_ - 1) * n + src
    zp = jax.random.normal(key, (t_ * n, LANES), jnp.bfloat16)
    msgs = jax.random.normal(key, (e, LANES), jnp.bfloat16)

    def timeit(fn, *a):
        out = fn(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        per = (time.perf_counter() - t0) / 5
        iters = max(10, int(0.5 / max(per, 1e-6)))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*a)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
            reps.append((time.perf_counter() - t0) / iters)
        return sorted(reps)[1]

    rows = [
        ("transform einsum z=x@W", jax.jit(
            lambda x, w: jnp.einsum("nh,thk->tnk", x, w).sum()), (x, w)),
        ("gather z->msgs", jax.jit(
            lambda zp, idx: jnp.take(zp, idx, axis=0,
                                     fill_value=0.0).sum()), (zp, idx)),
        ("pallas segsum", jax.jit(
            lambda m, d: pallas_sorted_segment_sum(m, d, n).sum()),
         (msgs, dst)),
        ("gather+segsum", jax.jit(
            lambda zp, idx, d: pallas_sorted_segment_sum(
                jnp.take(zp, idx, axis=0, fill_value=0.0), d, n).sum()),
         (zp, idx, dst)),
        ("update linear", jax.jit(
            lambda x: (jnp.concatenate([x, x], -1)
                       @ jnp.ones((2 * h, k))).sum()), (x,)),
    ]
    for name, fn, a in rows:
        dt = timeit(fn, *a)
        print(f"{name:>24}: {dt * 1e3:7.3f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
