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

from functools import partial
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


def reshape_for_dp(stacked, d: int):
    """[B, ...] stacked batches -> [B // d, d, ...] (B must divide)."""
    def r(x):
        b = x.shape[0]
        assert b % d == 0, (b, d)
        return x.reshape(b // d, d, *x.shape[1:])

    return jax.tree_util.tree_map(r, stacked)
