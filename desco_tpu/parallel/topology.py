"""Multi-host / multi-slice mesh topology: DP x halo composition.

The reference's only distribution story is single-host Lightning DDP
over NCCL (main.py:242-255). The TPU deployment shape this framework
targets is larger: a pod slice (or several) where

  * the ``graph`` axis carries halo-partitioned single-graph
    parallelism — one ``all_to_all`` boundary exchange per GNN layer
    per query (HIGH volume, latency-critical) — and therefore must map
    to ICI-adjacent devices;
  * the ``data`` axis carries data parallelism — ONE gradient allreduce
    per step (low volume, latency-tolerant) — and is the axis that can
    ride DCN across hosts/slices.

``make_mesh2d`` builds the ("data", "graph") mesh with that layout:
on real multi-host TPU it uses ``mesh_utils.create_hybrid_device_mesh``
(DCN axis = data, ICI axes = graph); single-host (or CPU-virtual) it
falls back to ``create_device_mesh`` / a plain reshape, keeping the
``graph`` axis innermost so neighbor ranks stay physically adjacent.

``dp_halo_gossip_step_fn`` composes the two axes in one jitted step:
each ``data`` row trains on its own halo-partitioned graph shard-set,
gradients flow through the per-layer halo all_to_all (graph axis) and
one cross-replica psum (data axis). Same VMA gradient argument as
parallel/dp.py: differentiate the globally-psum'd loss; the transpose
inserts the collectives, so grads come out replicated — no manual
allreduce.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from . import halo as halo_mod


def make_mesh2d(n_data: int, n_graph: int,
                devices: Optional[list] = None) -> Mesh:
    """("data", "graph") mesh over n_data * n_graph devices.

    graph = inner/ICI axis (per-layer halo all_to_all), data = outer/DCN
    axis (one grad allreduce per step)."""
    devs = devices if devices is not None else jax.devices()
    n = n_data * n_graph
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    devs = devs[:n]
    n_proc = len({d.process_index for d in devs})
    if n_proc > 1 and n_data % n_proc == 0:
        # real multi-host: DCN spans processes; keep the graph axis
        # entirely inside each process's ICI domain
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(n_data // n_proc, n_graph),
            dcn_mesh_shape=(n_proc, 1), devices=devs)
        return Mesh(arr, ("data", "graph"))
    if devs[0].platform == "tpu":
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh((n_data, n_graph),
                                            devices=devs)
        return Mesh(arr, ("data", "graph"))
    return Mesh(np.array(devs).reshape(n_data, n_graph),
                ("data", "graph"))


def harmonized_partitions(specs: list, n_devices: int, **kw) -> list:
    """Partition several graphs to IDENTICAL leaf shapes.

    ``specs``: list of kwargs dicts for ``partition_typed_graph`` (one
    per data replica). Two-pass: partition each graph, take the
    element-wise max of the padded capacities, re-partition any graph
    whose caps fall short. Required before ``stack_partitions``."""
    parts = [halo_mod.partition_typed_graph(
        n_devices=n_devices, **spec, **kw) for spec in specs]
    caps_each = [halo_mod.partition_caps(p) for p in parts]
    caps = {k: max(c[k] for c in caps_each) for k in caps_each[0]}
    return [
        p if caps_each[i] == caps else halo_mod.partition_typed_graph(
            n_devices=n_devices, min_caps=caps, **specs[i], **kw)
        for i, p in enumerate(parts)
    ]


def stack_partitions(parts: list):
    """Stack n_data HaloPartition pytrees (each already carrying a
    leading device axis of n_graph) into one tree with a leading
    n_data * n_graph axis, shardable with P(("data", "graph")).
    Shapes must already be harmonized (``harmonized_partitions``)."""
    return jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
        *parts)


def dp_halo_gossip_step_fn(tx, mesh: Mesh, dropout: float = 0.0):
    """Composed 2-axis gossip train step.

    part: HaloPartition pytree with leading axis n_data * n_graph,
    sharded P(("data", "graph")) — data row d, graph column g holds
    shard g of replica d's graph. Loss = sum over replicas of each
    replica's halo-psum'd sum loss (the 'sum' weight kind of
    parallel/dp.py, which is the reference's gossip loss semantics).
    ``dropout`` + the step's ``rng`` argument mirror the packed gossip
    trainer; halo_gossip_loss folds the rng over BOTH mesh axes (it
    folds in axis_index('graph'); the 'data' replica index is folded
    here) so every shard draws an independent stream."""

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(("data", "graph")), P(), P(), P()),
        out_specs=(P(), P(), P()),
    )
    def step(params, opt_state, part, query_embs, lr, rng):
        shard = jax.tree_util.tree_map(lambda a: a[0], part)

        def loss_fn(p):
            r = (jax.random.fold_in(rng, jax.lax.axis_index("data"))
                 if dropout > 0.0 else None)
            local = halo_mod.halo_gossip_loss(
                p, shard, query_embs, "graph", dropout=dropout,
                train=dropout > 0.0, rng=r)      # psum over graph axis
            return jax.lax.psum(local, "data")   # global sum over replicas

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def dp_halo_shmp_forward(cfg, mesh: Mesh):
    """Composed 2-axis SHMP core forward: independent halo-sharded
    graphs per data row, boundary exchange on the graph axis only.
    ``cfg`` (static SHMPConfig) is closed over, not traced."""

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(("data", "graph"))),
             out_specs=P(("data", "graph")))
    def fwd(params, part):
        shard = jax.tree_util.tree_map(lambda a: a[0], part)
        return halo_mod.halo_shmp_core(params, cfg, shard)[None]

    return fwd
