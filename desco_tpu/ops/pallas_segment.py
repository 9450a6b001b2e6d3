"""Pallas TPU kernel: fused typed segment-sum + per-type transform.

The SHMP hot op is x_neigh[i] = sum_t W_t^T-applied (sum over type-t
edges into i of x[src]). XLA's scatter-based segment-sum materializes a
[T*N, H] buffer (mostly zeros) at ~40GB/s effective — the pipeline
bottleneck. This kernel tiles over destination nodes and turns the
segmented reduction into MXU one-hot matmuls:

  for each tile of 128 dst nodes:
    for each chunk of CE edges in the tile's (sorted) edge range:
      DMA keys+msgs chunk HBM -> VMEM
      P[(t, local_dst), e] = one-hot of the chunk's (dst*T + t) keys
      acc += P @ msgs_chunk                  # [T*128, CE] x [CE, H] MXU
    out_tile = sum_t acc[t*128:(t+1)*128] @ W[t]

Requirements: edges sorted by (dst, type) — keys = dst*T + type sorted;
messages pre-gathered contiguously ([E, H] = x[src] in edge order, one
XLA gather); per-tile edge offsets from one searchsorted. Padding edges
carry keys >= N*T and fall past the last tile. No [T*N, H] buffer is
ever formed.

Exposes a custom VJP whose backward uses plain XLA ops (gather +
per-type masked matmuls), so training through the op stays correct.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # pragma: no cover
    PALLAS_OK = False

TILE_N = 128   # dst nodes per grid cell
CE = 128       # edges per inner chunk


def _kernel(offs_ref, keys_hbm, msgs_hbm, w_ref, out_ref,
            acc_ref, kbuf, mbuf, sem_k, sem_m, *, n_types: int, h: int):
    i = pl.program_id(0)
    base_row = i * TILE_N * n_types
    lo = offs_ref[i]
    hi = offs_ref[i + 1]

    acc_ref[:] = jnp.zeros_like(acc_ref)

    # ALIGNED global chunks: [c0, c1) covers this tile's edge range; edges
    # belonging to neighboring tiles (or padding) map outside [0, 128*T)
    # and match no one-hot row, so no explicit masking is needed.
    c0 = lo // CE
    c1 = (hi + CE - 1) // CE

    def chunk_body(c, _):
        ck = pltpu.make_async_copy(keys_hbm.at[pl.ds(c, 1), :], kbuf, sem_k)
        cm = pltpu.make_async_copy(
            msgs_hbm.at[pl.ds(c * CE, CE), :], mbuf, sem_m)
        ck.start()
        cm.start()
        ck.wait()
        cm.wait()
        local = kbuf[0, :] - base_row                     # [CE]
        # key layout is dst*T + t; acc layout is [t][dst] blocks — remap
        # row = t*TILE_N + dst_local, out-of-tile keys -> -1 (no row)
        d_loc = local // n_types
        t_loc = local - d_loc * n_types
        row_of_e = jnp.where(
            (local >= 0) & (local < TILE_N * n_types),
            t_loc * TILE_N + d_loc, -1)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_N * n_types, CE), 0)
        p = (rows == row_of_e[None, :]).astype(jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            p, mbuf[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(c0, c1, chunk_body, 0)

    out = jnp.zeros((TILE_N, h), jnp.float32)
    for t in range(n_types):
        out = out + jax.lax.dot_general(
            acc_ref[t * TILE_N:(t + 1) * TILE_N, :], w_ref[t],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] = out


def fused_typed_aggregate_fwd(
    msgs: jnp.ndarray,    # [E, H] pre-gathered x[src] in (dst,type) order
    keys: jnp.ndarray,    # [E] sorted keys = dst * n_types + type
    conv_w: jnp.ndarray,  # [T, H, H]
    n_nodes: int,
) -> jnp.ndarray:
    n_types, h, k = conv_w.shape
    assert h == k, "fused kernel requires square conv weights"
    assert n_nodes % TILE_N == 0, "pad node capacity to a TILE_N multiple"
    n_tiles = n_nodes // TILE_N
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * (TILE_N * n_types)
    offs = jnp.searchsorted(
        keys, bounds, method="scan_unrolled").astype(jnp.int32)

    # HBM memref slices need 128-aligned lanes: pad the edge stream to a
    # CE multiple, keys as [E/CE, CE] rows, features to 128 lanes
    hp = 128
    e = keys.shape[0]
    e_pad = ((e + CE - 1) // CE) * CE
    keys2 = jnp.concatenate(
        [keys.astype(jnp.int32),
         jnp.full((e_pad - e,), np.int32(2 ** 30), jnp.int32)]
    ).reshape(e_pad // CE, CE)
    msgs2 = jnp.zeros((e_pad, hp), jnp.float32).at[:e, :h].set(
        msgs.astype(jnp.float32))
    w2 = jnp.zeros((n_types, hp, hp), jnp.float32).at[:, :h, :h].set(
        conv_w.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # keys (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),   # msgs (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # conv_w
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, hp), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((TILE_N * n_types, hp), jnp.float32),
            pltpu.VMEM((1, CE), jnp.int32),
            pltpu.VMEM((CE, hp), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_types=n_types, h=hp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_nodes, hp), jnp.float32),
    )(offs, keys2, msgs2, w2)
    return out[:, :h]


# ------------------------------------------------------- public op (VJP)
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_typed_transform_aggregate(x, edge_src, keys, conv_w,
                                    n_types: int, n_nodes: int):
    """x_neigh [N, H]: W[type]-transformed sum of x[src] over
    (dst,type)-sorted edges (keys = dst*n_types + type; padding keys
    >= N*n_types are dropped)."""
    msgs = jnp.take(x, edge_src, axis=0, fill_value=0.0)
    return fused_typed_aggregate_fwd(msgs, keys, conv_w, n_nodes)


def _fwd(x, edge_src, keys, conv_w, n_types, n_nodes):
    out = fused_typed_transform_aggregate(x, edge_src, keys, conv_w,
                                          n_types, n_nodes)
    return out, (x, edge_src, keys, conv_w)


def _bwd(n_types, n_nodes, res, g):
    x, edge_src, keys, conv_w = res
    dst = (keys // n_types).astype(jnp.int32)
    etype = (keys - dst * n_types).astype(jnp.int32)
    live = dst < n_nodes
    g_rows = jnp.take(g, jnp.minimum(dst, n_nodes - 1), axis=0)
    g_rows = g_rows * live[:, None]
    wt = jnp.take(conv_w, jnp.minimum(etype, n_types - 1), axis=0)
    dmsgs = jnp.einsum("ek,ehk->eh", g_rows, wt)
    dx = jax.ops.segment_sum(dmsgs, edge_src.astype(jnp.int32),
                             x.shape[0])
    msgs = jnp.take(x, edge_src, axis=0, fill_value=0.0)
    seg = jnp.where(live, etype, n_types)
    dw = jnp.stack([
        (msgs * (seg == t)[:, None]).T @ g_rows for t in range(n_types)
    ])
    return dx, None, None, dw


fused_typed_transform_aggregate.defvjp(_fwd, _bwd)
