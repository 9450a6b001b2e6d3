"""Micro-profile of backward candidates for the fused typed aggregate.

Times, at bench shapes (N=22144, E=71168, T=6, H=K=64):
  current _bwd (per-type masked matmuls + unsorted dx scatter)
  candidate: pallas segsum over (dst,type) keys for dw-side aggregate
  candidate: pallas segsum over (src,type) keys for dx
  the unsorted XLA dx scatter alone

    timeout 590 python scripts/bwd_profile.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=30):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def main():
    from desco_tpu.ops.pallas_segment import (
        pallas_sorted_segment_sum, _bwd as cur_bwd)

    rng = np.random.default_rng(0)
    N, E, T, H, K = 22144, 71168, 6, 64, 64
    x = rng.standard_normal((N, H)).astype(np.float32)
    g = rng.standard_normal((N, K)).astype(np.float32)
    w = (rng.standard_normal((T, H, K)) * 0.1).astype(np.float32)
    dst = np.sort(rng.integers(0, N - 1, E)).astype(np.int32)
    typ = rng.integers(0, T, E).astype(np.int32)
    src = rng.integers(0, N - 1, E).astype(np.int32)
    keys = (dst * T + typ).astype(np.int32)
    order = np.argsort(keys, kind="stable")
    keys, src, dst, typ = keys[order], src[order], dst[order], typ[order]
    # src-sorted companion stream
    skeys = (src * T + typ).astype(np.int32)
    sorder = np.argsort(skeys, kind="stable")
    skeys_s, dst_by_src = skeys[sorder], dst[sorder]

    xd, gd, wd = map(jnp.asarray, (x, g, w))
    srcd, keysd = jnp.asarray(src), jnp.asarray(keys)
    skeysd, dstbysrcd = jnp.asarray(skeys_s), jnp.asarray(dst_by_src)

    # current full backward
    f_cur = jax.jit(lambda xx, gg, ww: cur_bwd(
        T, N, (xx, srcd, keysd, ww), gg))
    dt = timeit(f_cur, xd, gd, wd)
    print(f"current _bwd:            {dt*1e3:7.2f} ms", flush=True)

    # dx scatter alone (unsorted segment_sum over src)
    def dx_scatter(gg, ww):
        g_rows = jnp.take(gg, jnp.minimum(keysd // T, N - 1), axis=0)
        dmsgs = jnp.zeros((E, H), jnp.float32)
        for t in range(T):
            dmsgs = dmsgs + (g_rows @ ww[t].T) * (typ == t)[:, None]
        return jax.ops.segment_sum(dmsgs, srcd, N)

    dt = timeit(jax.jit(dx_scatter), gd, wd)
    print(f"dx via unsorted scatter: {dt*1e3:7.2f} ms", flush=True)

    # candidate dx: pallas segsum of g over (src,type) keys + einsum
    def dx_pallas(gg, ww):
        msgs = jnp.take(gg, dstbysrcd, axis=0)
        u = pallas_sorted_segment_sum(msgs, skeysd, N * T)
        u = u[:, :K].reshape(N, T, K)
        return jnp.einsum("ntk,thk->nh", u, ww)

    dt = timeit(jax.jit(dx_pallas), gd, wd)
    print(f"dx via pallas (src,t):   {dt*1e3:7.2f} ms", flush=True)

    # candidate dw: pallas segsum of x[src] over (dst,type) keys + matmul
    def dw_pallas(xx, gg):
        msgs = jnp.take(xx, srcd, axis=0)
        a = pallas_sorted_segment_sum(msgs, keysd, N * T)
        a = a[:, :H].reshape(N, T, H)
        return jnp.einsum("nth,nk->thk", a, gg)

    dt = timeit(jax.jit(dw_pallas), xd, gd)
    print(f"dw via pallas (dst,t):   {dt*1e3:7.2f} ms", flush=True)

    # numerics check vs current
    dx0, _, _, dw0 = f_cur(xd, gd, wd)
    dx1 = jax.jit(dx_pallas)(gd, wd)
    dw1 = jax.jit(dw_pallas)(xd, gd)
    e_dx = float(jnp.abs(dx1 - dx0).max() / (jnp.abs(dx0).max() + 1e-9))
    e_dw = float(jnp.abs(dw1 - dw0).max() / (jnp.abs(dw0).max() + 1e-9))
    print(f"rel err dx {e_dx:.2e} dw {e_dw:.2e}", flush=True)


if __name__ == "__main__":
    main()
