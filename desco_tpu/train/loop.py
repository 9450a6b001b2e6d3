"""Training loops: jitted scan-over-batches epochs, Adam + plateau LR,
val-monitored best-checkpoint selection.

Replaces PyTorch-Lightning's Trainer (reference main.py:205-273, 338-379):
all batches share one compiled shape, live on device, and the epoch is a
tight python loop over a donated-carry jitted step whose carry includes
the PRNG key and a device-side loss accumulator. Dispatch-hygiene rules
for this TPU stack:
  * NO eager tiny ops in the loop (an eager fold_in per step costs
    ~12ms dispatch) — the rng is split inside the jitted step;
  * NO host syncs of many tiny buffers (jnp.stack of 110 loss scalars
    took minutes over the tunnel) — losses accumulate in the carry, one
    float() per epoch; val sums likewise accumulate on device.
At the paper-config model size the epoch is DEVICE-bound (~78ms/step,
scatter-limited — see ops/pallas_segment.py for the round-2 kernel), so
loop structure doesn't move the wall time; at smaller step costs these
rules are worth 20-100x. (Careful: block_until_ready returns at enqueue
on this platform — only host read-backs time real completion.)

Optimizer semantics mirror the reference exactly: torch.optim.Adam
(lr applied after the adam direction, optional L2-style weight decay
added to the gradient) + ReduceLROnPlateau on the val loss
(lightning_model.py:160-173). The LR enters the jitted step as data, so
plateau decays never recompile.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..batch.packed import PackedGraphs, stack_batches
from ..models import gossip as gossip_mod
from ..models import neighborhood as neigh_mod
from ..models.shmp_gnn import SHMPConfig
from ..parallel.dp import dp_step_fn, pad_batches_to_multiple
from .checkpoint import save_checkpoint
from .schedule import ReduceLROnPlateau


def make_adam(weight_decay: float = 0.0):
    """torch.optim.Adam equivalent; LR is applied by the caller."""
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    txs.append(optax.scale(-1.0))
    return optax.chain(*txs)


@dataclasses.dataclass
class TrainResult:
    params: object
    best_params: object
    train_losses: List[float]
    val_losses: List[float]
    best_val: float
    epoch_times: List[float]


# ---------------------------------------------------------------- generic
def run_training(
    *, params, tx, train_batches: List[PackedGraphs],
    val_batches: List[PackedGraphs],
    step_fn, eval_fn, epochs: int, lr: float,
    min_lr: float = 1e-5, factor: float = 0.5, patience: int = 20,
    seed: int = 0, ckpt_path: Optional[str] = None,
    ckpt_config: Optional[dict] = None,
    log_every: int = 10, log_fn=print, mesh=None,
    resume: bool = False, snapshot_every: int = 10,
    val_every: int = 1,
) -> TrainResult:
    """Generic loop: step_fn(params, opt, batch, lr, rng) ->
    (params, opt, loss); eval_fn(params, batch) -> (loss_sum, weight).
    With a mesh, step_fn must be a DP step (dp_step_fn) and batches are
    grouped d-at-a-time along a sharded axis.

    Full training state (params + optimizer + plateau scheduler + epoch)
    snapshots to ``<ckpt_path>.last`` every ``snapshot_every`` epochs;
    ``resume=True`` continues from it — the device tunnel on this host
    occasionally wedges mid-run, so long trainings must be killable."""
    import os

    from .checkpoint import load_checkpoint

    opt_state = tx.init(params)
    # live (non-pad) edges per epoch, for the per-epoch edges/s counter
    # — counted BEFORE DP padding (pad replica batches carry zero weight
    # but real edge types)
    from ..batch.packed import PAD_EDGE_TYPE

    epoch_edges = int(sum(
        (np.asarray(b.edge_type) != PAD_EDGE_TYPE).sum()
        for b in train_batches))
    n_dp = mesh.devices.size if mesh is not None else 1
    if mesh is not None:
        train_batches = pad_batches_to_multiple(train_batches, n_dp)

    # move batches to device ONCE (sliced from one stacked transfer);
    # the epoch then loops over resident device trees
    def to_device_list(batches, group: int = 1, keep_axis: bool = False):
        """keep_axis: DP steps index the per-device axis inside the
        shard, so even a group of 1 must keep a leading axis."""
        n = len(batches) // group
        if mesh is not None and group > 1:
            # shard each step's group across the mesh's data axis UP
            # FRONT — a plain device_put would commit the stack to the
            # default device and the shard_map step would then re-
            # transfer the group from device 0 on EVERY step
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P("data"))
            out = [jax.device_put(
                stack_batches(batches[i * group:(i + 1) * group]), sh)
                for i in range(n)]
            jax.block_until_ready(out)
            return out
        stack = jax.device_put(stack_batches(batches))
        if group == 1 and not keep_axis:
            out = [jax.tree_util.tree_map(lambda x, i=i: x[i], stack)
                   for i in range(n)]
        else:
            out = [jax.tree_util.tree_map(
                lambda x, i=i: x[i * group:(i + 1) * group], stack)
                for i in range(n)]
        jax.block_until_ready(out)
        return out

    train_dev = to_device_list(train_batches, n_dp,
                               keep_axis=mesh is not None)
    val_dev = to_device_list(val_batches) if val_batches else None
    n_train = len(train_dev)

    # donated carry (params, opt, rng, loss_sum, n_bad): buffers reused
    # in place, rng split inside the jit, loss accumulated on device.
    # Non-finite step losses are the reference's detect_anomaly concern
    # (main.py:343): the update is REJECTED inside the jit (params/opt
    # keep their pre-step values via a flag-select), the step is counted
    # in n_bad, and the epoch aborts with a report — the last on-disk
    # snapshot stays clean and resumable.
    def carried_step(carry, batch, lr):
        params, opt_state, rng, loss_sum, n_bad = carry
        rng, sub = jax.random.split(rng)
        new_p, new_o, loss = step_fn(params, opt_state, batch, lr, sub)
        ok = jnp.isfinite(loss)
        sel = lambda n, o: jnp.where(ok, n, o)
        params = jax.tree_util.tree_map(sel, new_p, params)
        opt_state = jax.tree_util.tree_map(sel, new_o, opt_state)
        return (params, opt_state, rng,
                loss_sum + jnp.where(ok, loss, 0.0),
                n_bad + jnp.where(ok, 0, 1).astype(jnp.int32))

    step_jit = jax.jit(carried_step, donate_argnums=0)

    def eval_step(acc, params, batch):
        s_, w_ = eval_fn(params, batch)
        return (acc[0] + s_, acc[1] + w_)

    eval_jit = jax.jit(eval_step, donate_argnums=0)

    def val_loss(params):
        if val_dev is None:
            return float("nan")
        acc = (jnp.float32(0.0), jnp.float32(0.0))
        for b in val_dev:
            acc = eval_jit(acc, params, b)
        return float(acc[0]) / max(float(acc[1]), 1.0)

    sched = ReduceLROnPlateau(lr=lr, factor=factor, patience=patience,
                              min_lr=min_lr)
    rng = jax.random.PRNGKey(seed)
    # the step donates params/opt buffers, so any retained copy must be a
    # REAL device copy, not a reference
    best_val = float("inf")
    best_params = jax.tree_util.tree_map(jnp.copy, params)
    train_losses, val_losses, times = [], [], []
    start_epoch = 0

    if resume and ckpt_path and os.path.exists(
            ckpt_path + ".last.params.npz"):
        params, opt_state, meta = load_checkpoint(
            ckpt_path + ".last", params, opt_state)
        ex = meta.get("extra", {})
        start_epoch = int(ex.get("epoch", -1)) + 1
        for k in ("lr", "best", "num_bad"):
            if k in ex:
                setattr(sched, k, ex[k])
        best_val = float(ex.get("best_val", best_val))
        rng = jax.random.fold_in(rng, start_epoch)
        if os.path.exists(ckpt_path + ".best.params.npz"):
            best_params, _, _ = load_checkpoint(ckpt_path + ".best",
                                                best_params)
        log_fn(f"resumed from epoch {start_epoch} (lr {sched.lr:.2e}, "
               f"best_val {best_val:.5f})")

    rng_np = np.random.default_rng(seed + 1)
    # a resumed run must CONTINUE the shuffle stream, not restart it —
    # replay the draws the completed epochs consumed (the device rng is
    # advanced via fold_in above; this is its host-side analog)
    for _ in range(start_epoch):
        rng_np.permutation(n_train)
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        rng, epoch_key = jax.random.split(rng)
        order = rng_np.permutation(n_train)
        lr_dev = jnp.float32(sched.lr)
        carry = (params, opt_state, epoch_key, jnp.float32(0.0),
                 jnp.int32(0))
        for bi in order:
            carry = step_jit(carry, train_dev[int(bi)], lr_dev)
        params, opt_state, _, loss_sum, n_bad = carry
        n_bad = int(n_bad)
        if n_bad:
            # detect_anomaly analog: surface the failure loudly instead
            # of silently poisoning the epoch accumulator. params are
            # UNPOISONED (bad updates were rejected in the jit), and the
            # .last snapshot from the previous interval is untouched.
            msg = (f"epoch {epoch}: {n_bad}/{n_train} train steps "
                   f"produced a non-finite loss; their updates were "
                   f"rejected. Aborting (resume from "
                   f"{ckpt_path + '.last' if ckpt_path else 'scratch'}).")
            log_fn(msg)
            raise FloatingPointError(msg)
        tl = float(loss_sum) / n_train
        t_train = time.time() - t0  # the float(loss_sum) read-back above
        # is the real completion barrier on this platform, so t_train
        # covers exactly the train steps; the logged edges/s must not be
        # flattered or diluted by the host val pass below
        # val cadence: with val_every=k the full val pass (a measured
        # ~15% of epoch time at train=valid scale) runs every k epochs;
        # the plateau scheduler and best-ckpt monitor only see those
        # epochs (patience counts monitored values, not raw epochs)
        run_val = (val_dev is None or val_every <= 1
                   or epoch % val_every == 0 or epoch == epochs - 1)
        vl = val_loss(params) if run_val else float("nan")
        times.append(time.time() - t0)
        train_losses.append(tl)
        val_losses.append(vl)
        if run_val:
            if val_dev is not None and not np.isfinite(vl):
                # symmetric with the train-side abort above: a val pass
                # that RAN and produced a non-finite loss must not be
                # silently replaced by the train loss (that would record
                # a diverged state as .best and mix metric scales)
                msg = (f"epoch {epoch}: validation loss is {vl}; "
                       f"aborting (resume from "
                       f"{ckpt_path + '.last' if ckpt_path else 'scratch'}).")
                log_fn(msg)
                raise FloatingPointError(msg)
            # tl fallback is for runs with NO val set only
            monitored = vl if np.isfinite(vl) else tl
            sched.step(monitored)
            if monitored < best_val:
                best_val = monitored
                best_params = jax.tree_util.tree_map(jnp.copy, params)
                if ckpt_path:
                    save_checkpoint(
                        ckpt_path + ".best", best_params,
                        config=ckpt_config,
                        extra={"epoch": epoch, "val_loss": best_val})
        if log_every and (epoch % log_every == 0 or epoch == epochs - 1):
            log_fn(f"epoch {epoch:4d} train {tl:.5f} val {vl:.5f} "
                   f"lr {sched.lr:.2e} {times[-1]:.2f}s "
                   f"{epoch_edges / max(t_train, 1e-9) / 1e6:.1f}M edges/s")
        if ckpt_path and snapshot_every and (
                epoch % snapshot_every == 0 or epoch == epochs - 1):
            save_checkpoint(
                ckpt_path + ".last", params, config=ckpt_config,
                opt_state=opt_state,
                extra={"epoch": epoch, "lr": sched.lr,
                       "best": sched.best, "num_bad": sched.num_bad,
                       "best_val": best_val})
    return TrainResult(params, best_params, train_losses, val_losses,
                       best_val, times)


# ----------------------------------------------------------- neighborhood
def neighborhood_loss_fn(tgt_cfg, qry_cfg, query_batch):
    def f(params, batch, rng):
        return neigh_mod.train_loss(params, tgt_cfg, qry_cfg, batch,
                                    query_batch, rng=rng)

    return f


def neighborhood_loss_and_grads(tgt_cfg, qry_cfg, query_batch):
    f = neighborhood_loss_fn(tgt_cfg, qry_cfg, query_batch)

    def lg(params, batch, rng):
        return jax.value_and_grad(f)(params, batch, rng)

    return lg


def neighborhood_step_fn(tgt_cfg: SHMPConfig, qry_cfg: SHMPConfig,
                         query_batch: PackedGraphs, tx):
    lg = neighborhood_loss_and_grads(tgt_cfg, qry_cfg, query_batch)

    def step(params, opt_state, batch, lr, rng):
        loss, grads = lg(params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def neighborhood_eval_fn(tgt_cfg, qry_cfg, query_batch):
    def eval_one(params, batch):
        # weighted by valid-graph count so the epoch metric is the true mean
        loss = neigh_mod.train_loss(params, tgt_cfg, qry_cfg, batch,
                                    query_batch)
        w = batch.graph_mask.sum()
        return loss * w, w

    return eval_one


def train_neighborhood(
    params, tgt_cfg, qry_cfg, query_batch,
    train_batches, val_batches, *, epochs=300, lr=1e-4,
    weight_decay=0.0, ckpt_path=None, ckpt_config=None, mesh=None,
    eval_tgt_cfg=None, **kw,
) -> TrainResult:
    """``eval_tgt_cfg`` lets bf16 training keep its val passes (plateau
    scheduler + best-checkpoint selection) on the f32 tower: the step
    runs ``tgt_cfg`` (possibly bf16), validation runs ``eval_tgt_cfg``
    (defaults to ``tgt_cfg``) — so the recorded best_val matches the
    f32 forward used at serving time."""
    tx = make_adam(weight_decay)
    if mesh is not None:
        step = dp_step_fn(
            neighborhood_loss_fn(tgt_cfg, qry_cfg, query_batch),
            tx, mesh, weight_kind="graphs")
    else:
        step = neighborhood_step_fn(tgt_cfg, qry_cfg, query_batch, tx)
    return run_training(
        params=params, tx=tx, train_batches=train_batches,
        val_batches=val_batches,
        step_fn=step,
        eval_fn=neighborhood_eval_fn(eval_tgt_cfg or tgt_cfg, qry_cfg,
                                     query_batch),
        epochs=epochs, lr=lr, ckpt_path=ckpt_path,
        ckpt_config=ckpt_config, mesh=mesh, **kw)


@functools.lru_cache(maxsize=None)
def _jit_embed_queries(qry_cfg):
    return jax.jit(lambda p, qb: neigh_mod.embed_queries(p, qry_cfg, qb))


@functools.lru_cache(maxsize=None)
def _jit_predict_from_embs(tgt_cfg):
    return jax.jit(lambda p, b, eq: neigh_mod.predict_counts_from_embs(
        p, tgt_cfg, b, eq))


def stage_batches_for_predict(batches: List[PackedGraphs],
                              query_batch):
    """One host->device transfer of a request's packed batches (labels
    and the backward permutation are dead in the forward — stripping
    them cuts ~20% of the upload; the tunnel upload bounds big-set
    serving). Returns (stacked_device_tree, device_query_batch) to pass
    as ``staged`` to predict_neighborhood_counts — ensemble serving
    reuses ONE transfer across members instead of re-uploading
    identical bytes per member."""
    stacked = jax.device_put(dataclasses.replace(
        stack_batches(batches), y=None, node_y=None, edge_bwd_perm=None))
    return stacked, jax.device_put(query_batch)


def predict_neighborhood_counts(params, tgt_cfg, qry_cfg, query_batch,
                                batches: List[PackedGraphs],
                                staged=None) -> np.ndarray:
    # python loop over device batches (lax.map is a scan: pathologically
    # slow on this stack); the query tower runs ONCE — the query set is
    # static across batches (reference set_query_emb semantics). The
    # jitted callables are memoized per config: a fresh jit(lambda)
    # per call would RETRACE the 8-layer model every call (~5s of pure
    # tracing per serving request).
    if staged is None:
        staged = stage_batches_for_predict(batches, query_batch)
    stacked, query_batch = staged  # both already on device
    emb_q = _jit_embed_queries(qry_cfg)(params, query_batch)
    fn = _jit_predict_from_embs(tgt_cfg)
    # dispatch everything, read back ONE stacked array: every
    # np.asarray is a full tunnel round trip on this platform, so
    # per-batch syncs would serialize B latencies
    dev_out = [
        fn(params, jax.tree_util.tree_map(lambda x, i=bi: x[i], stacked),
           emb_q)
        for bi in range(len(batches))
    ]
    all_preds = np.asarray(jnp.stack(dev_out))  # [B, g_cap, Q]
    out = []
    for b, preds in zip(batches, all_preds):
        valid = np.asarray(b.graph_mask) > 0
        out.append(preds[valid])
    return np.concatenate(out, axis=0)


# ---------------------------------------------------------------- gossip
def gossip_loss_fn(dropout, query_embs):
    def f(params, batch, rng):
        return gossip_mod.gossip_loss(params, batch, query_embs, dropout,
                                      True, rng)

    return f


def gossip_loss_and_grads(dropout, query_embs):
    f = gossip_loss_fn(dropout, query_embs)

    def lg(params, batch, rng):
        return jax.value_and_grad(f)(params, batch, rng)

    return lg


def gossip_step_fn(dropout: float, query_embs, tx):
    lg = gossip_loss_and_grads(dropout, query_embs)

    def step(params, opt_state, batch, lr, rng):
        loss, grads = lg(params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def gossip_eval_fn(query_embs):
    def eval_one(params, batch):
        # gossip_loss is a SUM over valid (node, query) terms; weight by
        # the valid-node count so the epoch metric is a per-node mean —
        # stable under re-batching (the quantity LR-plateau and best-ckpt
        # monitor must not depend on gossip_batch_size)
        loss = gossip_mod.gossip_loss(params, batch, query_embs)
        return loss, batch.node_mask.sum()

    return eval_one


def train_gossip(
    params, query_embs, train_batches, val_batches, *,
    epochs=30, lr=1e-3, weight_decay=0.0, dropout=0.01,
    ckpt_path=None, ckpt_config=None, mesh=None, **kw,
) -> TrainResult:
    tx = make_adam(weight_decay)
    if mesh is not None:
        step = dp_step_fn(gossip_loss_fn(dropout, query_embs),
                          tx, mesh, weight_kind="sum")
    else:
        step = gossip_step_fn(dropout, query_embs, tx)
    return run_training(
        params=params, tx=tx, train_batches=train_batches,
        val_batches=val_batches,
        step_fn=step,
        eval_fn=gossip_eval_fn(query_embs),
        epochs=epochs, lr=lr, ckpt_path=ckpt_path,
        ckpt_config=ckpt_config, mesh=mesh, **kw)


@functools.lru_cache(maxsize=None)
def _jit_gossip_predict():
    return jax.jit(gossip_mod.gossip_predict)


def predict_gossip_counts(params, query_embs,
                          batches: List[PackedGraphs]) -> np.ndarray:
    """(#total_nodes, Q) refined per-node counts in node order."""
    stacked = jax.device_put(dataclasses.replace(
        stack_batches(batches), y=None, node_y=None, edge_bwd_perm=None))
    fn = _jit_gossip_predict()
    dev_out = [
        fn(params, jax.tree_util.tree_map(lambda x, i=bi: x[i], stacked),
           query_embs)
        for bi in range(len(batches))
    ]
    all_preds = np.asarray(jnp.stack(dev_out))  # [B, n_cap, Q]
    out = []
    for b, preds in zip(batches, all_preds):
        valid = np.asarray(b.node_mask) > 0
        out.append(preds[valid])
    return np.concatenate(out, axis=0)
