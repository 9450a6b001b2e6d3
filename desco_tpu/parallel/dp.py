"""Data parallelism over a named device mesh.

Replaces Lightning DDP + NCCL allreduce (reference main.py:242-255, which
covers only the neighborhood stage) with ``shard_map`` over a ``data``
mesh axis: each device consumes its own packed batch, computes local
gradients, and XLA emits the ICI allreduce from ``psum``. Unlike the
reference, BOTH stages parallelize (gossip DDP is NotImplementedError
there, main.py:353-356).

Gradient semantics:
  * neighborhood (mean loss): grads are weighted by each device's valid
    graph count and renormalized globally, so padding/empty batches are
    exact no-ops.
  * gossip (sum loss): gradients simply psum — the loss over the combined
    batch is the sum of per-device sums.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int = 0) -> Mesh:
    devs = jax.devices()
    if n_devices <= 0:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), ("data",))


def pad_batches_to_multiple(batches: list, d: int) -> list:
    """Append all-masked-out copies of batch 0 so len % d == 0 (they carry
    zero weight in the DP gradient)."""
    if len(batches) % d == 0:
        return batches
    pad = batches[0]
    empty = pad.replace(
        node_mask=np.zeros_like(pad.node_mask),
        graph_mask=np.zeros_like(pad.graph_mask),
    )
    out = list(batches)
    while len(out) % d:
        out.append(empty)
    return out


def dp_step_fn(loss_fn: Callable, tx, mesh: Mesh,
               weight_kind: str = "graphs"):
    """Build a DP train step running under shard_map.

    loss_fn(params, batch, rng) -> scalar loss; batch arrives with a
    leading per-device axis of size 1 inside each shard.
    weight_kind: 'graphs' (weighted-mean loss) | 'sum' (summed loss).

    The GLOBAL loss is formed inside the shard (psum of local losses) and
    differentiated directly: under JAX's varying-axes (VMA) semantics the
    transpose of the replicated-params -> varying-loss broadcast already
    inserts the cross-device psum, so gradients of the psum'd loss come
    out replicated and exact. A manual grad psum here would double-count.
    """

    if weight_kind not in ("graphs", "sum"):
        raise ValueError(f"weight_kind must be 'graphs' or 'sum', "
                         f"got {weight_kind!r}")

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P("data"), P(), P()),
        out_specs=(P(), P(), P()),
    )
    def step(params, opt_state, batch, lr, rng):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        # fold the device id into the dropout rng
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        if weight_kind == "graphs":
            w = batch.graph_mask.sum()
            wsum = jnp.maximum(jax.lax.psum(w, "data"), 1.0)

            def objective(p):
                return jax.lax.psum(loss_fn(p, batch, rng) * w,
                                    "data") / wsum
        else:  # 'sum'
            def objective(p):
                return jax.lax.psum(loss_fn(p, batch, rng), "data")

        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


@lru_cache(maxsize=None)
def _dp_predict_fn(tgt_cfg, mesh: Mesh):
    """Jitted DP forward (memoized per config+mesh): each device runs
    the counting forward on its own packed batch."""
    from ..models import neighborhood as neigh_mod

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("data"), P()), out_specs=P("data"))
    def fwd(params, batch, emb_q):
        b = jax.tree_util.tree_map(lambda x: x[0], batch)
        return neigh_mod.predict_counts_from_embs(
            params, tgt_cfg, b, emb_q)[None]

    return jax.jit(fwd)


def dp_predict_neighborhood_counts(params, tgt_cfg, qry_cfg, query_batch,
                                   batches, mesh: Optional[Mesh] = None
                                   ) -> np.ndarray:
    """Stage-1 serving sharded over the ``data`` axis: batch i runs on
    device i % D, one dispatch per group of D batches — the serving
    counterpart of DDP inference the reference does not have. Returns
    exactly what the single-device ``predict_neighborhood_counts``
    returns (valid rows of every batch, concatenated in batch order);
    exactness is tested on the CPU mesh (tests/test_parallel.py)."""
    import dataclasses

    from ..batch.packed import stack_batches
    from ..models import neighborhood as neigh_mod

    from ..train.loop import _jit_embed_queries

    batches = list(batches)
    n_q = query_batch.graph_mask.shape[0]
    if not batches:
        return np.zeros((0, n_q), np.float32)
    mesh = mesh or make_mesh()
    d = int(mesh.devices.size)
    padded = pad_batches_to_multiple(batches, d)
    stacked = dataclasses.replace(
        stack_batches(padded), y=None, node_y=None, edge_bwd_perm=None)
    groups = reshape_for_dp(stacked, d)  # [B//d, d, ...]
    # memoized jit (train/loop.py): a fresh jit(lambda) here would
    # retrace the 8-layer query tower on every serving request
    emb_q = _jit_embed_queries(qry_cfg)(params, query_batch)
    fn = _dp_predict_fn(tgt_cfg, mesh)
    # dispatch ALL groups, then one host read-back: each np.asarray is
    # a full tunnel round trip, so per-group syncs would serialize them
    dev_out = []
    with mesh:
        for gi in range(len(padded) // d):
            g = jax.tree_util.tree_map(lambda x, i=gi: x[i], groups)
            dev_out.append(fn(params, g, emb_q))  # [d, g_cap, Q]
    all_preds = np.asarray(jnp.stack(dev_out))    # [B//d, d, g_cap, Q]
    out = []
    for bi in range(len(batches)):
        valid = np.asarray(batches[bi].graph_mask) > 0
        out.append(all_preds[bi // d, bi % d][valid])
    return np.concatenate(out, axis=0)


@lru_cache(maxsize=None)
def _dp_gossip_predict_fn(mesh: Mesh):
    from ..models import gossip as gossip_mod

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("data"), P()), out_specs=P("data"))
    def fwd(params, batch, query_embs):
        b = jax.tree_util.tree_map(lambda x: x[0], batch)
        return gossip_mod.gossip_predict(params, b, query_embs)[None]

    return jax.jit(fwd)


def dp_predict_gossip_counts(params, query_embs, batches,
                             mesh: Optional[Mesh] = None) -> np.ndarray:
    """Stage-3 serving sharded over the ``data`` axis (one gossip batch
    per device per dispatch); exactly equal to the single-device
    ``predict_gossip_counts``."""
    import dataclasses

    from ..batch.packed import stack_batches

    batches = list(batches)
    if not batches:
        return np.zeros((0, int(query_embs.shape[0])), np.float32)
    mesh = mesh or make_mesh()
    d = int(mesh.devices.size)
    padded = pad_batches_to_multiple(batches, d)
    stacked = dataclasses.replace(
        stack_batches(padded), y=None, node_y=None, edge_bwd_perm=None)
    groups = reshape_for_dp(stacked, d)
    fn = _dp_gossip_predict_fn(mesh)
    dev_out = []
    with mesh:  # dispatch all, ONE read-back (tunnel round trips)
        for gi in range(len(padded) // d):
            g = jax.tree_util.tree_map(lambda x, i=gi: x[i], groups)
            dev_out.append(fn(params, g, query_embs))  # [d, n_cap, Q]
    all_preds = np.asarray(jnp.stack(dev_out))
    out = []
    for bi in range(len(batches)):
        valid = np.asarray(batches[bi].node_mask) > 0
        out.append(all_preds[bi // d, bi % d][valid])
    return np.concatenate(out, axis=0)


def reshape_for_dp(stacked, d: int):
    """[B, ...] stacked batches -> [B // d, d, ...] (B must divide)."""
    def r(x):
        b = x.shape[0]
        assert b % d == 0, (b, d)
        return x.reshape(b // d, d, *x.shape[1:])

    return jax.tree_util.tree_map(r, stacked)
