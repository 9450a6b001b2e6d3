"""Production serving API: graphs in -> graphlet counts out, one object.

The reference has no serving story — its inference path is the tail of
``main.py`` (stage-1 predict -> gossip refine -> CSV dump,
main.py:398-460) and requires re-running the whole driver per dataset.
``CountingService`` packages that tail as a long-lived service:

  * checkpoints are loaded ONCE; the pipeline config is rehydrated from
    the checkpoint's JSON blob (config-is-structure), so the caller
    never re-specifies hyperparameters;
  * the query tower runs ONCE at construction (the query set is static;
    embeddings are reused across every request);
  * packing capacities are BUCKETED (pow2 graph-slot counts) and each
    bucket's capacities pin monotonically, so steady-state requests hit
    the jit cache (a fresh trace costs minutes through a remote
    compiler; a cache hit is milliseconds) while small requests pack at
    small shapes — a single-graph request does not pay the full-batch
    forward;
  * every serving guard is on by default: combinatorial clamp, exact
    tail verification (VF2 recount of the top predicted tail), gossip
    refinement with verified-row override, node-level clamp.

Typical use::

    svc = CountingService("ckpt/neigh", "ckpt/gossip")
    res = svc.count(graphs)           # -> CountResult
    res.graphlet_counts               # [n_graphs, n_queries]

Thread-safety: ``count`` mutates only the pinned-capacity fields;
concurrent calls are safe after a first warm-up call.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from .graph import Graph
from .models import neighborhood as neigh_mod
from .models.gossip import init_gossip_model
from .pipeline import (
    PipelineConfig,
    apply_verified_override,
    build_query_batch,
    clamp_node_counts,
    model_configs,
    neighborhood_predictions,
    pipeline_queries,
    prepare_gossip_batches,
    prepare_stage_data,
)
from .train.checkpoint import load_checkpoint
from .train.loop import predict_gossip_counts


@dataclasses.dataclass(frozen=True)
class CountResult:
    """Counts for one ``CountingService.count`` request.

    graphlet_counts: [n_graphs, n_queries] rounded non-negative counts
        (gossip-refined when the service has a gossip model).
    node_counts: [total_nodes, n_queries] per-node canonical counts in
        input node order (graphs concatenated); zero rows for nodes
        whose canonical neighborhood is edgeless (they host nothing).
    neighborhood_counts: [n_neighborhoods, n_queries] raw stage-1
        output after clamp + verification.
    verified_rows: neighborhood row indices recounted EXACTLY by VF2.
    refined: whether gossip refinement ran.
    """

    graphlet_counts: np.ndarray
    node_counts: np.ndarray
    neighborhood_counts: np.ndarray
    verified_rows: np.ndarray
    refined: bool


def _rehydrate_config(meta: dict,
                      overrides: Optional[dict]) -> PipelineConfig:
    fields = {f.name for f in dataclasses.fields(PipelineConfig)}
    raw = {k: v for k, v in (meta.get("config") or {}).items()
           if k in fields}
    if "query_sizes" in raw:
        raw["query_sizes"] = tuple(raw["query_sizes"])
    raw.update(overrides or {})
    return PipelineConfig(**raw)


class CountingService:
    """Load-once, count-forever serving front end (see module docs)."""

    def __init__(
        self,
        neigh_checkpoint,  # str, or a sequence of str for an ensemble
        gossip_checkpoint: Optional[str] = None,
        config_overrides: Optional[dict] = None,
        cfg: Optional[PipelineConfig] = None,
        n_devices: int = 1,
        compile_cache: Optional[str] = None,
    ) -> None:
        """``n_devices > 1`` (or -1 for all visible devices) shards every
        device forward over a ``data`` mesh axis (parallel/dp.py DP
        serving) — bit-identical results, D batches per dispatch.

        ``compile_cache``: directory for the persistent XLA compilation
        cache; a service restart with the same checkpoints/buckets then
        reloads compiled executables instead of re-tracing through the
        compiler (cold start is compile-dominated, RESULTS.md)."""
        import jax

        if compile_cache:
            from .utils.compile_cache import enable_compilation_cache

            enable_compilation_cache(compile_cache)

        # a list/tuple of checkpoint paths serves their ensemble
        # (pipeline.py: stage-1 predictions averaged in log2(count+1)
        # space); config rehydrates from the first member
        neigh_ckpts = ([neigh_checkpoint]
                       if isinstance(neigh_checkpoint, str)
                       else list(neigh_checkpoint))
        if cfg is None:
            # peek at the checkpoint's saved config for rehydration
            import json

            with open(neigh_ckpts[0] + ".json") as f:
                meta = json.load(f)
            cfg = _rehydrate_config(meta, config_overrides)
        elif config_overrides:
            cfg = dataclasses.replace(cfg, **config_overrides)
        self.cfg = cfg
        self.tgt_cfg, self.qry_cfg = model_configs(cfg)
        self.query_batch = build_query_batch(cfg)

        template = neigh_mod.init_neighborhood_model(
            jax.random.PRNGKey(0), self.tgt_cfg, self.qry_cfg)
        members = [load_checkpoint(c, template)[0] for c in neigh_ckpts]
        self.neigh_params = members[0] if len(members) == 1 else members
        self.gossip_params = None
        self.query_embs = None
        if gossip_checkpoint is not None:
            g_template = init_gossip_model(
                jax.random.PRNGKey(1), input_dim=1,
                hidden_dim=cfg.gossip_hidden_dim,
                emb_channels=cfg.neigh_hidden_dim,
                layer_num=cfg.gossip_layer_num)
            self.gossip_params, _, _ = load_checkpoint(gossip_checkpoint,
                                                       g_template)
            # static query set -> embed once, reuse every request
            # (gossip conditions on ONE query tower: the first member)
            self.query_embs = neigh_mod.embed_queries(
                members[0], self.qry_cfg, self.query_batch)
        self.mesh = None
        if n_devices == -1:
            n_devices = len(jax.devices())
        if n_devices > 1:
            from .parallel.dp import make_mesh

            self.mesh = make_mesh(n_devices)
        # capacity buckets keyed by pow2 graph-slot count: small
        # requests pack (and compile) at small shapes — a single graph
        # does not pay the full-batch forward — while each bucket's
        # (n_cap, e_cap) pins monotonically so repeats are jit hits.
        # Bucket count is bounded by log2(batch_size) compiles, paid
        # once each.
        self._neigh_buckets: dict = {}
        self._gossip_buckets: dict = {}
        # bucket growth must be atomic: count_stream's producer thread
        # and concurrent count() calls both reach _pin_caps; unlocked,
        # two racing growers could each write last and shrink the
        # other's pinned caps, re-triggering compiles forever
        import threading

        self._caps_lock = threading.Lock()

    # ------------------------------------------------------ capacities
    @staticmethod
    def _fit(caps: Optional[tuple], samples) -> bool:
        if caps is None:
            return False
        n_cap, e_cap, _ = caps
        # pack_samples accepts n_nodes <= n_cap - 1 (one pad slot) —
        # match it exactly, or a boundary-sized sample forces a spurious
        # regrow + recompile of a bucket that could have served it
        return all(s.n_nodes + 1 <= n_cap and s.n_edges <= e_cap
                   for s in samples)

    @staticmethod
    def _grow(caps: Optional[tuple], fresh: tuple) -> tuple:
        if caps is None:
            return fresh
        return tuple(max(a, b) for a, b in zip(caps, fresh))

    def _pin_caps(self, buckets: dict, samples, g_cap_max: int) -> tuple:
        """Bucketed, monotone-growing pinned capacities (see __init__)."""
        from .batch.packed import auto_capacities

        if not samples:  # edgeless/empty request: caller short-circuits
            return (128, 512, 1)
        g_target = 1
        while g_target < min(len(samples), g_cap_max):
            g_target *= 2
        g_target = min(g_target, g_cap_max)
        with self._caps_lock:
            caps = buckets.get(g_target)
            if not self._fit(caps, samples):
                # slack>1: one compiled bucket shape absorbs slightly-
                # larger follow-up requests (recompiles cost seconds
                # via the tunnel)
                caps = self._grow(caps,
                                  auto_capacities(samples, g_cap=g_target,
                                                  slack=1.2))
                # keep the slot count at the bucket key (auto_capacities
                # shrinks g_cap to len(samples)) so repeats share shapes
                caps = (caps[0], caps[1], g_target)
                buckets[g_target] = caps
            return caps

    # ---------------------------------------------------------- counting
    def count(self, graphs: Sequence[Graph],
              refine: Optional[bool] = None) -> CountResult:
        """Count all configured queries in each input graph.

        refine: run gossip refinement; default = whenever the service
        has a gossip model. Exact-verified rows always override the
        learned residual (pipeline.apply_verified_override)."""
        graphs = list(graphs)
        if refine is None:
            refine = self.gossip_params is not None
        if refine and self.gossip_params is None:
            raise ValueError("refine=True but no gossip checkpoint loaded")

        stage = prepare_stage_data(
            self.cfg, graphs, "__serve__", need_truth=False,
            capacities=self._select_neigh_caps)
        return self._finish_request(stage, refine)

    def _select_neigh_caps(self, samples) -> tuple:
        return self._pin_caps(self._neigh_buckets, samples,
                              self.cfg.neigh_batch_size)

    def _empty_result(self, stage) -> CountResult:
        """All-zero counts: every canonical neighborhood is edgeless
        (or the request had no graphs) — nothing can host an occurrence."""
        n_q = len(pipeline_queries(self.cfg))
        return CountResult(
            graphlet_counts=np.zeros((len(stage.workload.graphs), n_q)),
            node_counts=np.zeros((stage.workload.total_nodes, n_q)),
            neighborhood_counts=np.zeros((0, n_q)),
            verified_rows=np.zeros(0, np.int64),
            refined=False,
        )

    def _finish_request(self, stage, refine: bool) -> CountResult:
        """Device stages + guards for one prepared request."""
        if not stage.samples:
            return self._empty_result(stage)
        counts, verified = neighborhood_predictions(
            self.neigh_params, self.tgt_cfg, self.qry_cfg,
            self.query_batch, stage, self.cfg, return_verified=True,
            mesh=self.mesh)

        if refine:
            gb = self._repack_gossip(stage, counts)
            if self.mesh is not None:
                from .parallel.dp import dp_predict_gossip_counts

                node_counts = dp_predict_gossip_counts(
                    self.gossip_params, self.query_embs, gb, self.mesh)
            else:
                node_counts = predict_gossip_counts(
                    self.gossip_params, self.query_embs, gb)
            return self._guard_and_package(stage, node_counts, counts,
                                           verified)
        return self._package_unrefined(stage, counts, verified)

    def _guard_and_package(self, stage, node_counts, counts,
                           verified) -> CountResult:
        """Post-refinement guard chain, shared by count and
        count_large_graph so serving guards cannot drift between the
        packed and halo-sharded paths: combinatorial clamp ->
        exact-verified row override -> exact-small-query column
        override -> graphlet aggregation."""
        if self.cfg.clamp_counts:
            node_counts = clamp_node_counts(
                node_counts, stage, self.cfg,
                canonical_type=self.tgt_cfg.canonical_type)
        node_counts = apply_verified_override(
            node_counts, counts, verified, stage.nindex)
        if self.cfg.exact_size > 0:
            from .pipeline import (
                apply_exact_column_override, exact_columns)

            node_counts = apply_exact_column_override(
                node_counts, counts, exact_columns(self.cfg),
                stage.nindex)
        graphlet = stage.workload.aggregate_node_counts(node_counts)
        return CountResult(
            graphlet_counts=np.round(np.maximum(graphlet, 0.0)),
            node_counts=node_counts,
            neighborhood_counts=counts,
            verified_rows=verified,
            refined=True,
        )

    @staticmethod
    def _package_unrefined(stage, counts, verified) -> CountResult:
        node_counts = np.zeros((stage.workload.total_nodes,
                                counts.shape[1]), counts.dtype)
        rows = np.nonzero(np.asarray(stage.nindex.indicator))[0]
        node_counts[rows] = counts
        graphlet = stage.workload.aggregate_neighborhood_counts(
            counts, stage.nindex)
        return CountResult(
            graphlet_counts=np.round(np.maximum(graphlet, 0.0)),
            node_counts=node_counts,
            neighborhood_counts=counts,
            verified_rows=verified,
            refined=False,
        )

    def count_graph(self, graph: Graph, **kw) -> np.ndarray:
        """[n_queries] counts for a single graph."""
        return self.count([graph], **kw).graphlet_counts[0]

    def count_large_graph(self, graph: Graph,
                          n_devices: int = 0,
                          refine: Optional[bool] = None) -> CountResult:
        """Single-LARGE-graph serving (P2P/Astro scale): stage 1 runs
        through the standard bounded decomposition (the working set is
        depth-d neighborhoods regardless of graph size), and the gossip
        stage — which must see the WHOLE graph — runs halo-sharded over
        a ``graph`` mesh axis so no device ever holds the full graph
        (parallel/halo.serve_gossip_counts). Guards (clamp, verified-row
        override) apply exactly as in ``count``. ``n_devices=0`` uses
        all visible devices."""
        if refine is None:
            refine = self.gossip_params is not None
        if refine and self.gossip_params is None:
            raise ValueError("refine=True but no gossip checkpoint loaded")
        stage = prepare_stage_data(
            self.cfg, [graph], "__serve__", need_truth=False,
            capacities=self._select_neigh_caps)
        if not stage.samples:
            return self._empty_result(stage)
        counts, verified = neighborhood_predictions(
            self.neigh_params, self.tgt_cfg, self.qry_cfg,
            self.query_batch, stage, self.cfg, return_verified=True,
            mesh=self.mesh)
        if not refine:
            return self._package_unrefined(stage, counts, verified)

        from .parallel.halo import serve_gossip_counts

        x_all = np.zeros((graph.n_nodes, counts.shape[1]), np.float32)
        x_all[np.asarray(stage.nindex.indicator)] = counts.astype(
            np.float32)
        node_counts = serve_gossip_counts(
            self.gossip_params, graph, x_all, self.query_embs,
            n_devices=n_devices)
        return self._guard_and_package(stage, node_counts, counts,
                                       verified)

    def count_stream(self, requests, refine: Optional[bool] = None,
                     prefetch: int = 1):
        """Pipelined serving over an iterable of graph batches.

        Host work (canonical decomposition, triangle typing, packing —
        the C++ prep releases the GIL) for request k+1 overlaps device
        compute for request k: a background thread runs
        ``prepare_stage_data`` up to ``prefetch`` requests ahead while
        the main thread drives the TPU. Yields ``CountResult`` in
        request order. Results are bit-identical to per-request
        ``count`` calls (tests/test_serving.py). Abandoning the
        iterator early (break / close) stops and joins the producer."""
        if refine is None:
            refine = self.gossip_params is not None
        if refine and self.gossip_params is None:
            raise ValueError("refine=True but no gossip checkpoint loaded")
        return self._stream(requests, refine, prefetch)

    def _stream(self, requests, refine: bool, prefetch: int):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
        SENTINEL = object()
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.25)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for graphs in requests:
                    if stop.is_set():
                        return
                    stage = prepare_stage_data(
                        self.cfg, list(graphs), "__serve__",
                        need_truth=False,
                        capacities=self._select_neigh_caps)
                    if not put(stage):
                        return
            except BaseException as e:  # surface in consumer
                put(e)
            finally:
                put(SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield self._finish_request(item, refine)
        finally:
            # consumer gone (break/close/exception): unblock + reap the
            # producer so no thread or prepared StageData lingers
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=10)

    # --------------------------------------------------------- internals
    def _repack_gossip(self, stage, counts):
        return prepare_gossip_batches(
            self.cfg, stage, counts,
            capacities=lambda samples: self._pin_caps(
                self._gossip_buckets, samples,
                self.cfg.gossip_batch_size),
            need_bwd_perm=False)  # forward-only: skip the host lexsort
