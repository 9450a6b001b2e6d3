"""Edge-partitioned graph parallelism with hybrid pull/push halo exchange.

The reference never shards a single large graph — P2P/Astro/CiteSeer are
processed whole on one device (data.py:753-886), and its only
parallelism is DDP over small-graph batches. This module adds the graph
analog of sequence/context parallelism (SURVEY.md §5.7): ONE large
(typed) graph is partitioned across a ``graph`` mesh axis.

  * nodes are owned in contiguous ranges with DEGREE-AWARE cut points
    (equal adjacency volume, not equal node count — hub-skewed graphs
    put all edges on one device otherwise);
  * per ordered (src-owner, dst-owner) pair the partitioner picks the
    cheaper of two communication modes, both host-precomputed static
    plans:
      - PULL: the dst owner keeps the edges and fetches the unique
        remote source features (one all_to_all of the boundary set);
        edge source ids are pre-rewritten into a [local | halo] table so
        aggregation is an ordinary sorted typed segment-sum.
      - PUSH: the SRC owner keeps the edges, computes partial typed
        aggregates per remote (dst, type) slot, and ships the partials
        (one all_to_all); the dst owner scatter-adds them into its
        aggregate. For hub destinations (#unique sources >> #unique
        (dst,type) slots — the BA regime) this shrinks both traffic and
        edge-load imbalance by orders of magnitude.
    The pull cost is #unique remote sources; the push cost is #unique
    (dst,type) slots — min is chosen per pair (DistGNN-style
    reduce-at-source, re-derived for static SPMD shapes).

Each device's resident edges are SPLIT into two independently sorted
streams so boundary exchange overlaps local aggregation (the
double-buffered pipelining SURVEY.md §7.3 names as the genuinely new
engineering; ring-attention-style latency hiding applied to SpMM):

  * INTERIOR stream — edges whose source is locally owned: all
    intra-device edges plus every push edge (push edges are resident at
    their src owner by construction). Segment keys span
    [local (dst,type) cells | outgoing push slots]. This stream has NO
    data dependence on the pull all_to_all, so XLA's latency-hiding
    scheduler runs it while the pull exchange is in flight; its output
    also feeds the push all_to_all, which then overlaps the boundary
    stream.
  * BOUNDARY stream — pull-mode cross edges, whose sources index the
    received halo table. Segment keys are local cells only; its (small)
    sorted segment-sum adds into the interior accumulator, and the push
    partials scatter-add last.

All shapes are static: pull halo and push partial slots are padded to
the max over (device, peer) pairs, each stream to its own max edge
count; padded slots carry zeros and padded keys/scatter targets are
out-of-range (dropped).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    from flax import struct
except ImportError:  # pragma: no cover
    struct = None

import jax
import jax.numpy as jnp

from ..ops.segment import segment_sum


@struct.dataclass
class HaloPartition:
    """Device-sharded typed graph (leading axis = device)."""

    # per-device node data
    x: np.ndarray            # [D, n_loc, F]
    node_type: np.ndarray    # [D, n_loc]
    node_mask: np.ndarray    # [D, n_loc]
    node_graph: np.ndarray   # [D, n_loc] graph slot (for pooling)
    # per-device resident edges, split into two sorted streams (see
    # module docstring): interior srcs index the LOCAL node table,
    # boundary srcs index the received HALO table
    edge_src_int: np.ndarray  # [D, e_int] index < n_loc
    edge_seg_int: np.ndarray  # [D, e_int] key < n_loc*T + D*p_max (pad: ==)
    edge_src_bnd: np.ndarray  # [D, e_bnd] index < D*h_max
    edge_seg_bnd: np.ndarray  # [D, e_bnd] key < n_loc*T (pad: ==)
    # pull plan: boundary features this device sends to each peer
    send_idx: np.ndarray     # [D, D, h_max] local ids this device sends
    send_mask: np.ndarray    # [D, D, h_max]
    # push plan: local (dst,type) cell ids of partials received from each
    # peer; dead slots point out of range (scatter drops them)
    push_tgt: np.ndarray     # [D, D, p_max] i32 cell ids < n_loc*T
    node_y: Optional[np.ndarray] = None  # [D, n_loc, Q] per-node labels
    # global-node-id range owned by each device (degree-aware contiguous
    # cuts; device d owns [node_range[d,0], node_range[d,1])). A dynamic
    # per-device LEAF (not static metadata) so partitions of *different*
    # graphs stack along the device axis for DP x halo composition
    # (parallel/topology.py); only host-side reassembly reads it.
    node_range: Optional[np.ndarray] = None  # [D, 2] i64
    n_graphs: int = struct.field(pytree_node=False, default=1)
    # number of edge types baked into the segment keys
    n_types: int = struct.field(pytree_node=False, default=1)

    @property
    def n_devices(self) -> int:
        return self.x.shape[0]

    @property
    def n_loc(self) -> int:
        return self.x.shape[1]

    @property
    def h_max(self) -> int:
        # shape[-1] so it works both outside ([D, D, h]) and inside
        # shard_map ([D, h] after the leading device axis is stripped)
        return self.send_idx.shape[-1]

    @property
    def p_max(self) -> int:
        return self.push_tgt.shape[-1]


def partition_caps(part: HaloPartition) -> dict:
    """The padded capacities of a partition — pass the element-wise max
    over several partitions back as ``min_caps`` to harmonize shapes."""
    return {"n_loc": part.n_loc,
            "e_int": part.edge_src_int.shape[-1],
            "e_bnd": part.edge_src_bnd.shape[-1],
            "h_max": part.h_max, "p_max": part.p_max}


def unpartition_nodes(part: HaloPartition, arr: np.ndarray) -> np.ndarray:
    """[D, n_loc, ...] per-shard node values -> [n_nodes, ...] in global
    node order (inverse of the partitioner's range layout)."""
    r = np.asarray(part.node_range)
    arr = np.asarray(arr)
    return np.concatenate([
        arr[dev, :int(r[dev, 1] - r[dev, 0])]
        for dev in range(part.n_devices)
    ], axis=0)


def partition_node_values(part: HaloPartition,
                          vals: np.ndarray) -> np.ndarray:
    """[n_nodes, ...] global node values -> [D, n_loc, ...] shards padded
    with zeros (the partitioner's range layout)."""
    r = np.asarray(part.node_range)
    d, n_loc = part.n_devices, part.n_loc
    out = np.zeros((d, n_loc) + vals.shape[1:], vals.dtype)
    for dev in range(d):
        lo, hi = int(r[dev, 0]), int(r[dev, 1])
        out[dev, :hi - lo] = vals[lo:hi]
    return out


def locality_order(n_nodes: int, edge_src: np.ndarray,
                   edge_dst: np.ndarray, method: str = "metis",
                   coarse_target: int = 128, seed: int = 0) -> np.ndarray:
    """Locality-aware node ordering for the contiguous-range partitioner
    (the cheap 'METIS-lite' step).

    Returns ``order`` (position -> original node id).

      * ``metis`` — multilevel heavy-edge-matching coarsening down to
        ~``coarse_target`` supernodes, then a greedy linear arrangement
        of the supernodes by edge DENSITY (weight normalized by size
        product) so strongly-coupled clusters land adjacent in id space.
        On an 8-community/1%-cross test graph with permuted ids this
        recovers a ~7% D=8 cut where plain BFS leaves ~70% (BFS leaks
        through the first cross edge it meets and interleaves
        communities).
      * ``bfs``   — BFS visit order, restarted per component; fine for
        geometric/banded graphs, destroys community structure.

    On expanders (ER/BA) any balanced cut is Ω(E) and no ordering helps
    — documented, not hidden.

    Usage (composable, keeps the partition layout pure):
        order = locality_order(n, src, dst)
        inv = np.empty_like(order); inv[order] = np.arange(n)
        part = partition_typed_graph(n, node_type[order], x[order],
                                     inv[src], inv[dst], edge_type, D, ...)
        # unpartition_nodes(part, out)[inv] restores original node order
    """
    if method != "metis":
        return _bfs_order(n_nodes, edge_src, edge_dst)

    rng = np.random.default_rng(seed)
    u = np.concatenate([edge_src, edge_dst]).astype(np.int64)
    v = np.concatenate([edge_dst, edge_src]).astype(np.int64)
    w = np.ones(len(u), np.int64)
    cmap_total = np.arange(n_nodes, dtype=np.int64)
    n_cur = n_nodes
    while n_cur > coarse_target:
        # heavy-edge matching in random visit order
        o = np.argsort(u, kind="stable")
        uu, vv, ww = u[o], v[o], w[o]
        deg = np.bincount(uu, minlength=n_cur)
        indptr = np.concatenate([[0], np.cumsum(deg)])
        match = np.full(n_cur, -1, np.int64)
        joined = []
        for a in rng.permutation(n_cur):
            if match[a] >= 0:
                continue
            s, e = indptr[a], indptr[a + 1]
            nb, nw = vv[s:e], ww[s:e]
            ok = (nb != a) & (match[nb] < 0)
            if ok.any():
                b = nb[ok][np.argmax(nw[ok])]
                match[a] = b
                match[b] = a
            else:
                match[a] = a
                ok2 = nb != a
                if ok2.any():
                    joined.append((a, nb[ok2][np.argmax(nw[ok2])]))
        rep = np.minimum(np.arange(n_cur), match)
        # hub/leaf regime: when pair matching stalls (merges <10% of the
        # nodes — a star merges ONE pair per round, making the loop
        # O(n^2) Python), blocked nodes join their heaviest matched
        # neighbor's pair instead. On healthy graphs matching makes
        # normal progress and this never fires, preserving the
        # weight-guided coarsening quality.
        n_pairs = int((match != np.arange(n_cur)).sum()) // 2
        if n_pairs * 10 < n_cur:
            for a, b in joined:
                rep[a] = rep[b]
        uniq, cmap = np.unique(rep, return_inverse=True)
        n_new = len(uniq)
        if n_new >= n_cur:  # no progress (isolated nodes only)
            break
        cmap_total = cmap[cmap_total]
        cu, cv = cmap[u], cmap[v]
        keep = cu != cv
        cu, cv, w = cu[keep], cv[keep], w[keep]
        key = cu * n_new + cv
        uk, inv2 = np.unique(key, return_inverse=True)
        w = np.bincount(inv2, weights=w).astype(np.int64)
        u, v = uk // n_new, uk % n_new
        n_cur = n_new

    # isolated-node-heavy graphs can exit the loop with n_cur still
    # large (isolated nodes never merge); the dense density matrix below
    # would then be O(n_cur^2) bytes — fall back to the BFS ordering,
    # which handles such graphs fine (isolated nodes have no comm)
    if n_cur > 8192:
        return _bfs_order(n_nodes, edge_src, edge_dst)

    # greedy linear arrangement of the coarse supernodes by density
    wmat = np.zeros((n_cur, n_cur))
    np.add.at(wmat, (u, v), w)
    sizes = np.bincount(cmap_total, minlength=n_cur).astype(np.float64)
    dens = wmat / np.maximum(np.outer(sizes, sizes), 1.0)
    first = int(np.argmax(sizes))
    chain = [first]
    unvisited = set(range(n_cur)) - {first}
    vis_aff = dens[first].copy()
    while unvisited:
        last = chain[-1]
        cand = max(unvisited, key=lambda j: dens[last, j])
        if dens[last, cand] == 0.0:
            cand = max(unvisited, key=lambda j: vis_aff[j])
        chain.append(cand)
        unvisited.discard(cand)
        vis_aff += dens[cand]
    rank = np.empty(n_cur, np.int64)
    rank[np.array(chain)] = np.arange(n_cur)
    return np.lexsort((np.arange(n_nodes), rank[cmap_total]))


# backwards-compatible alias (BFS flavor)
def bfs_locality_order(n_nodes: int, edge_src: np.ndarray,
                       edge_dst: np.ndarray) -> np.ndarray:
    return _bfs_order(n_nodes, edge_src, edge_dst)


def _bfs_order(n_nodes: int, edge_src: np.ndarray,
               edge_dst: np.ndarray) -> np.ndarray:
    # CSR over the undirected adjacency
    u = np.concatenate([edge_src, edge_dst])
    v = np.concatenate([edge_dst, edge_src])
    deg = np.bincount(u, minlength=n_nodes)
    indptr = np.concatenate([[0], np.cumsum(deg)])
    adj = v[np.argsort(u, kind="stable")].astype(np.int64)

    order = np.empty(n_nodes, np.int64)
    seen = np.zeros(n_nodes, bool)
    w = 0
    for seed in np.argsort(-deg, kind="stable"):
        if seen[seed]:
            continue
        seen[seed] = True
        order[w] = seed
        head = w
        w += 1
        while head < w:
            node = order[head]
            head += 1
            for nb in adj[indptr[node]:indptr[node + 1]]:
                if not seen[nb]:
                    seen[nb] = True
                    order[w] = nb
                    w += 1
    assert w == n_nodes
    return order


def partition_typed_graph(
    n_nodes: int,
    node_type: np.ndarray,
    x: np.ndarray,
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_type: np.ndarray,
    n_devices: int,
    node_graph: Optional[np.ndarray] = None,
    n_graphs: int = 1,
    pad_edge_type: int = 63,
    node_y: Optional[np.ndarray] = None,
    n_types: Optional[int] = None,
    drop_cross: bool = False,
    min_caps: Optional[dict] = None,
    force_pull: bool = False,
) -> HaloPartition:
    """Host-side partitioner: contiguous node ranges with DEGREE-AWARE
    cut points (each device owns ~equal adjacency volume), hybrid
    pull/push cross-device plans chosen per (src-owner, dst-owner) pair
    by min(#unique remote sources, #unique (dst,type) cells), and one
    sorted edge stream per device covering both local aggregation and
    outgoing push partials.

    ``drop_cross=True`` keeps only intra-device edges (no halo at all) —
    a shape-comparable zero-communication control for the scaling
    harness, NOT a correct partition of the graph.

    ``min_caps`` ({'n_loc','e_int','e_bnd','h_max','p_max'}) floors the
    padded capacities so partitions of DIFFERENT graphs come out with
    identical leaf shapes — required to stack them along a ``data`` axis
    for the DP x halo composition (parallel/topology.py). Segment keys
    embed n_loc/p_max, so harmonization must happen here, not by
    re-padding.

    ``force_pull=True`` disables push mode: every cross edge is resident
    at its DST owner and fetches remote sources through the pull
    exchange. Required for aggregations that do not commute with
    partial sums shipped per (dst,type) cell — the per-segment softmax
    of GAT (halo_gat_aggregator)."""
    del pad_edge_type  # pads are out-of-range segment keys now
    d = n_devices
    if n_types is None:
        n_types = int(edge_type.max()) + 1 if len(edge_type) else 1
    t = int(n_types)

    # equal-adjacency contiguous cuts over the (in+out)-degree prefix sum
    vol = np.bincount(edge_dst, minlength=n_nodes).astype(np.int64)
    vol += np.bincount(edge_src, minlength=n_nodes)
    csum = np.concatenate([[0], np.cumsum(vol + 1)])  # +1: node residency
    targets = np.arange(1, d) * (csum[-1] / d)
    cuts = np.searchsorted(csum, targets).astype(np.int64)
    starts = np.concatenate([[0], cuts, [n_nodes]])
    # enforce strictly increasing (>=1 node per device): forward repair,
    # re-pin the end (a heavy tail node can push cuts past n), backward
    # repair
    for i in range(1, d + 1):
        starts[i] = max(starts[i], starts[i - 1] + 1)
    starts[d] = n_nodes
    for i in range(d - 1, 0, -1):
        starts[i] = min(starts[i], starts[i + 1] - 1)
    assert starts[0] == 0 and starts[-1] == n_nodes and np.all(
        np.diff(starts) >= 1), starts
    n_loc = int(((np.diff(starts).max() + 7) // 8) * 8)
    caps = min_caps or {}
    n_loc = max(n_loc, int(caps.get("n_loc", 0)))

    def owner_of(ids):
        return np.searchsorted(starts, ids, side="right") - 1

    owner_src = owner_of(edge_src)
    owner_dst = owner_of(edge_dst)
    if drop_cross:
        keep = owner_src == owner_dst
        edge_src, edge_dst = edge_src[keep], edge_dst[keep]
        edge_type = edge_type[keep]
        owner_src, owner_dst = owner_src[keep], owner_dst[keep]
    gseg = edge_dst.astype(np.int64) * t + edge_type.astype(np.int64)

    # per-pair mode decision + plans
    #   pull_ids[dev][p]: global src ids device dev pulls from peer p
    #   push_cells[s][dev]: global (dst,type) cells s pushes to dev
    pull_ids = [[np.zeros(0, np.int64)] * d for _ in range(d)]
    push_cells = [[np.zeros(0, np.int64)] * d for _ in range(d)]
    cross = owner_src != owner_dst
    is_push_edge = np.zeros(len(edge_src), bool)
    for s in range(d):
        for dev in range(d):
            if s == dev:
                continue
            sel = cross & (owner_src == s) & (owner_dst == dev)
            if not sel.any():
                continue
            u_src = np.unique(edge_src[sel])
            u_cell = np.unique(gseg[sel])
            if not force_pull and len(u_cell) < len(u_src):
                push_cells[s][dev] = u_cell
                is_push_edge[sel] = True
            else:
                pull_ids[dev][s] = u_src
    h_max = max([1] + [len(pull_ids[dev][p])
                       for dev in range(d) for p in range(d)])
    h_max = ((h_max + 7) // 8) * 8
    h_max = max(h_max, int(caps.get("h_max", 0)))
    p_counts = [len(push_cells[s][dev]) for s in range(d) for dev in range(d)]
    p_max = max([0] + p_counts)
    p_max = ((p_max + 7) // 8) * 8  # 0 stays 0: no push pairs anywhere
    p_max = max(p_max, int(caps.get("p_max", 0)))

    send_idx = np.zeros((d, d, h_max), np.int32)
    send_mask = np.zeros((d, d, h_max), np.float32)
    for p in range(d):
        for dev in range(d):
            ids = pull_ids[dev][p]  # global ids owned by p, needed by dev
            loc = (ids - starts[p]).astype(np.int32)
            send_idx[p, dev, :len(loc)] = loc
            send_mask[p, dev, :len(loc)] = 1.0

    # receive side of the push plan: local cell targets per (dev, peer);
    # dead slots -> n_loc*t (out of range, scatter-dropped)
    push_tgt = np.full((d, d, p_max), n_loc * t, np.int32)
    for s in range(d):
        for dev in range(d):
            cells = push_cells[s][dev]
            if len(cells):
                push_tgt[dev, s, :len(cells)] = (
                    cells - starts[dev] * t).astype(np.int32)

    # node tables
    f_dim = x.shape[1]
    X = np.zeros((d, n_loc, f_dim), np.float32)
    NT = np.zeros((d, n_loc), np.int32)
    NM = np.zeros((d, n_loc), np.float32)
    NG = np.zeros((d, n_loc), np.int32)
    NY = (np.zeros((d, n_loc, node_y.shape[1]), np.float32)
          if node_y is not None else None)
    for dev in range(d):
        lo, hi = int(starts[dev]), int(starts[dev + 1])
        k = hi - lo
        X[dev, :k] = x[lo:hi]
        NT[dev, :k] = node_type[lo:hi]
        NM[dev, :k] = 1.0
        NG[dev, :k] = node_graph[lo:hi] if node_graph is not None else 0
        if NY is not None:
            NY[dev, :k] = node_y[lo:hi]
    NG[NM == 0] = n_graphs  # pad slot

    # edge residency: push edges live with the src owner, all others with
    # the dst owner. Two streams per device (module docstring): INTERIOR
    # = edges with a locally-owned source (intra edges + all push edges),
    # BOUNDARY = pull-mode cross edges (sources in the halo table).
    res_dev = np.where(is_push_edge, owner_src, owner_dst)
    interior = is_push_edge | (owner_src == owner_dst)
    int_counts = np.bincount(res_dev[interior], minlength=d)
    bnd_counts = np.bincount(res_dev[~interior], minlength=d)
    e_int = int(max(128, ((int_counts.max() + 127) // 128) * 128))
    e_int = max(e_int, int(caps.get("e_int", 0)))
    e_bnd = int(((max(bnd_counts.max(), 0) + 127) // 128) * 128)
    e_bnd = max(e_bnd, int(caps.get("e_bnd", 0)))

    seg_total = n_loc * t + d * p_max
    ESI = np.full((d, e_int), 0, np.int32)
    ESEGI = np.full((d, e_int), seg_total, np.int32)
    ESB = np.full((d, e_bnd), 0, np.int32)
    ESEGB = np.full((d, e_bnd), n_loc * t, np.int32)
    for dev in range(d):
        sel = res_dev == dev
        es, ed, et = edge_src[sel], edge_dst[sel], edge_type[sel]
        so, do = owner_src[sel], owner_dst[sel]
        push = is_push_edge[sel]
        m = len(es)
        seg = np.empty(m, np.int64)
        # local-destination edges: ordinary (dst,type) cells
        loc = ~push
        seg[loc] = (ed[loc] - starts[dev]).astype(np.int64) * t + et[loc]
        # push edges: outgoing slot key per destination peer
        g = ed.astype(np.int64) * t + et
        for peer in np.unique(do[push]):
            sel2 = push & (do == peer)
            pos = np.searchsorted(push_cells[dev][peer], g[sel2])
            seg[sel2] = n_loc * t + peer * p_max + pos
        local_src = so == dev
        # interior stream: local source ids (push edges always have
        # local sources — that's why they're resident here)
        ii = np.nonzero(local_src)[0]
        order = np.argsort(seg[ii], kind="stable")
        ESI[dev, :len(ii)] = (es[ii] - starts[dev])[order]
        ESEGI[dev, :len(ii)] = seg[ii][order]
        # boundary stream: halo-table source ids per source peer
        bb = np.nonzero(~local_src)[0]
        src_halo = np.empty(len(bb), np.int64)
        for p in range(d):
            sel2 = so[bb] == p
            if not sel2.any():
                continue
            pos = np.searchsorted(pull_ids[dev][p], es[bb][sel2])
            src_halo[sel2] = p * h_max + pos
        order = np.argsort(seg[bb], kind="stable")
        ESB[dev, :len(bb)] = src_halo[order]
        ESEGB[dev, :len(bb)] = seg[bb][order]
        # pad edges gather row 0 of their table (result dropped) and
        # carry an out-of-range key, so the segment sums drop them

    return HaloPartition(
        x=X, node_type=NT, node_mask=NM, node_graph=NG,
        edge_src_int=ESI, edge_seg_int=ESEGI,
        edge_src_bnd=ESB, edge_seg_bnd=ESEGB,
        send_idx=send_idx, send_mask=send_mask, push_tgt=push_tgt,
        node_y=NY, n_graphs=n_graphs, n_types=t,
        node_range=np.stack([starts[:-1], starts[1:]], 1).astype(np.int64))


# ------------------------------------------------------------- device side
def _halo_segment_sum(msgs: jnp.ndarray, seg: jnp.ndarray,
                      n_segments: int,
                      prefer_kernel: bool = True) -> jnp.ndarray:
    """Sorted segment-sum for the halo streams: the fused Pallas kernel
    on real TPU (streams are (dst,type)-sorted by construction, k <= 128;
    bf16 reduce / f32 accumulate like every TPU matmul), plain XLA on
    CPU. Differentiable on both paths (sorted_segment_sum_ad).

    ``prefer_kernel=False`` forces the XLA f32 path even on TPU — the
    GOSSIP callers use it so the sharded gossip matches the packed
    ``gossip_predict`` exactly (the packed gossip aggregates in plain
    XLA f32, models/gossip.py); the SHMP callers keep the kernel, whose
    bf16 reduce matches the packed stage-1 Pallas path."""
    from ..ops.pallas_segment import default_agg_mode, sorted_segment_sum_ad

    if (prefer_kernel and default_agg_mode() == "pallas"
            and msgs.shape[1] <= 128):
        return sorted_segment_sum_ad(
            msgs, seg, n_segments).astype(msgs.dtype)
    return segment_sum(msgs, seg, n_segments, indices_are_sorted=True)


def halo_exchange(x_local: jnp.ndarray, send_idx: jnp.ndarray,
                  send_mask: jnp.ndarray, axis: str = "graph") -> jnp.ndarray:
    """Inside shard_map: exchange boundary features.

    x_local: [n_loc, F]; send_idx/mask: [D, h_max] (this device's rows).
    Returns the halo table [D * h_max, F] where block p holds features
    received from device p.
    """
    send = jnp.take(x_local, send_idx, axis=0) * send_mask[..., None]
    # all_to_all: slice j of my input goes to device j; I receive block p
    # from device p at position p.
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    d, h, f = recv.shape
    return recv.reshape(d * h, f)


def halo_typed_aggregate(
    x_local: jnp.ndarray,       # [n_loc, H]
    shard: HaloPartition,       # one device's shard (leading axis stripped)
    axis: str = "graph",
    tag: str = "",
    prefer_kernel: bool = True,
) -> jnp.ndarray:
    """Hybrid typed aggregation over this shard's resident edges:
    [n_loc, T, H] — structured so both collectives overlap independent
    compute (module docstring):

      1. issue the PULL all_to_all (boundary features);
      2. while it flies: sorted segment-sum over the INTERIOR stream
         (local cells + outgoing push partials) — no data dependence on
         the exchange, so XLA's latency-hiding scheduler overlaps them;
      3. issue the PUSH all_to_all (partials from step 2);
      4. while it flies: sorted segment-sum over the BOUNDARY stream
         (gathers from the received halo table), added into the local
         cells;
      5. scatter-add the received push partials.

    All collectives are differentiable, so gradients flow for halo
    training; exactness vs the single-device aggregation is tested
    (tests/test_halo.py).

    The five steps carry ``jax.named_scope`` tags (halo_pull{tag},
    halo_interior{tag}, ...) so parallel/overlap_check.py can PROVE the
    overlap structure mechanically: the interior stream must carry no
    data dependence on the same-layer pull all_to_all, nor the boundary
    stream on the push (tested in tests/test_halo.py and asserted by
    dryrun_multichip)."""
    n_loc, h = x_local.shape
    t = shard.n_types
    d = shard.send_idx.shape[0]
    p_max = shard.p_max

    # (1) pull exchange first — nothing below depends on it until (4)
    with jax.named_scope(f"halo_pull{tag}"):
        halo = halo_exchange(x_local, shard.send_idx, shard.send_mask,
                             axis)

    # (2) interior stream: local sources only
    with jax.named_scope(f"halo_interior{tag}"):
        msgs_i = jnp.take(x_local, shard.edge_src_int, axis=0)
        comb = _halo_segment_sum(msgs_i, shard.edge_seg_int,
                                 n_loc * t + d * p_max,
                                 prefer_kernel=prefer_kernel)
        agg = comb[:n_loc * t]

    # (3) push exchange of the interior partials
    push_in = None
    if p_max:
        with jax.named_scope(f"halo_push{tag}"):
            push_out = comb[n_loc * t:].reshape(d, p_max, h)
            push_in = jax.lax.all_to_all(push_out, axis, split_axis=0,
                                         concat_axis=0, tiled=False)

    # (4) boundary stream: sources in the received halo table
    if shard.edge_src_bnd.shape[-1]:
        with jax.named_scope(f"halo_boundary{tag}"):
            msgs_b = jnp.take(halo, shard.edge_src_bnd, axis=0)
            agg = agg + _halo_segment_sum(msgs_b, shard.edge_seg_bnd,
                                          n_loc * t,
                                          prefer_kernel=prefer_kernel)

    # (5) received push partials: dead slots carry exact zeros and
    # out-of-range targets (dropped)
    if push_in is not None:
        agg = agg.at[shard.push_tgt.reshape(-1)].add(
            push_in.reshape(-1, h))
    return agg.reshape(n_loc, t, h)


def halo_aggregator(cfg, part_shard, axis: str = "graph"):
    """Aggregation provider for the sharded path: per layer, hybrid
    pull/push exchange then typed-aggregate over resident edges."""
    assert part_shard.n_types == cfg.n_edge_types, (
        part_shard.n_types, cfg.n_edge_types)

    def agg_fn(x, conv_w, layer):
        agg = halo_typed_aggregate(x, part_shard, axis,
                                   tag=f"_L{layer}")
        return jnp.einsum("nth,thk->nk", agg, conv_w)
    return agg_fn


def halo_gat_aggregator(cfg, shard, att, axis: str = "graph"):
    """Typed GAT attention over a halo shard — the two-pass-free sharded
    softmax (models/shmp_gnn.gat_aggregator semantics, exactly).

    Pull edges always have a LOCAL destination, so the per-(dst,type)
    softmax is entirely local once the remote source features arrive:
    the existing pull exchange ships raw x rows, the dst owner applies
    the per-type transforms to its halo table, and segment max / exp /
    sum run over the same split streams as the sum path. Push-mode
    partials do NOT commute with the softmax normalization, so the
    partition must be built with ``force_pull=True`` (asserted)."""
    assert shard.p_max == 0, (
        "halo GAT needs a force_pull=True partition (push partials do "
        "not commute with the per-(dst,type) softmax)")
    a_src_all, a_dst_all = att  # [L, T, H] each
    t_n = cfg.n_edge_types
    seg_i = shard.edge_seg_int.astype(jnp.int32)
    seg_b = shard.edge_seg_bnd.astype(jnp.int32)
    has_bnd = bool(seg_b.shape[-1])

    def agg_fn(x, conv_w, layer):
        n = x.shape[0]
        a_src, a_dst = a_src_all[layer], a_dst_all[layer]
        z = jnp.einsum("nh,thk->tnk", x, conv_w)          # [T, n_loc, K]
        s_src = jnp.einsum("tnk,tk->tn", z, a_src)
        s_dst = jnp.einsum("tnk,tk->tn", z, a_dst)

        halo = halo_exchange(x, shard.send_idx, shard.send_mask, axis)
        z_h = jnp.einsum("nh,thk->tnk", halo, conv_w)     # [T, D*h, K]
        s_src_h = jnp.einsum("tnk,tk->tn", z_h, a_src)

        def edge_terms(seg, src, s_src_tab):
            # pad edges carry out-of-range seg keys -> dropped by every
            # segment op below; their gathered garbage never lands
            et = jnp.clip(seg % t_n, 0, t_n - 1)
            dst = jnp.minimum(seg // t_n, n - 1)
            s_e = jax.nn.leaky_relu(
                s_src_tab[et, src] + s_dst[et, dst], 0.2)
            return et, s_e

        et_i, s_e_i = edge_terms(seg_i, shard.edge_src_int, s_src)
        m = jax.ops.segment_max(s_e_i, seg_i, num_segments=n * t_n,
                                indices_are_sorted=True)
        if has_bnd:
            et_b, s_e_b = edge_terms(seg_b, shard.edge_src_bnd,
                                     s_src_h)
            m_b = jax.ops.segment_max(s_e_b, seg_b, num_segments=n * t_n,
                                      indices_are_sorted=True)
            m = jnp.maximum(m, m_b)
        m = jnp.where(jnp.isfinite(m), m, 0.0)  # empty segments -> 0

        p_i = jnp.exp(s_e_i - jnp.take(m, seg_i, fill_value=0.0))
        z_src_i = z[et_i, shard.edge_src_int]
        num = segment_sum(p_i[:, None] * z_src_i, seg_i, n * t_n,
                          indices_are_sorted=True)
        den = segment_sum(p_i, seg_i, n * t_n, indices_are_sorted=True)
        if has_bnd:
            p_b = jnp.exp(s_e_b - jnp.take(m, seg_b, fill_value=0.0))
            z_src_b = z_h[et_b, shard.edge_src_bnd]
            num = num + segment_sum(p_b[:, None] * z_src_b, seg_b,
                                    n * t_n, indices_are_sorted=True)
            den = den + segment_sum(p_b, seg_b, n * t_n,
                                    indices_are_sorted=True)
        num = num.reshape(n, t_n, -1)
        den = den.reshape(n, t_n)
        m2 = m.reshape(n, t_n)
        # merge the self-loop candidate into each (node, type) softmax
        # (identical to the packed path, incl. the empty-segment anchor
        # at s_self — see models/shmp_gnn.gat_aggregator)
        s_self = jax.nn.leaky_relu(s_src + s_dst, 0.2).T  # [n_loc, T]
        empty = den == 0
        big = jnp.where(empty, s_self, jnp.maximum(m2, s_self))
        w_edges = jnp.where(empty, 0.0, jnp.exp(m2 - big))
        w_self = jnp.exp(s_self - big)
        z_self = jnp.swapaxes(z, 0, 1)                    # [n_loc, T, K]
        out_t = ((num * w_edges[..., None] + w_self[..., None] * z_self)
                 / (den * w_edges + w_self)[..., None])
        return out_t.sum(axis=1)
    return agg_fn


def halo_pna_aggregator(cfg, shard, mix_w_all, axis: str = "graph"):
    """Typed PNA aggregation over a halo shard
    (models/shmp_gnn.pna_aggregator semantics): like GAT, every
    per-(dst,type) statistic (count/mean/min/max/std) is local once the
    pulled sources arrive, so a ``force_pull=True`` partition suffices
    (count/sum/sum-of-squares add across the two streams; min/max
    combine elementwise). The degree-normalizer delta — a mean over the
    batch's valid nodes — becomes a psum'd global mean so every shard
    scales identically to the single-device path."""
    assert shard.p_max == 0, (
        "halo PNA needs a force_pull=True partition (per-(dst,type) "
        "statistics do not commute with push partials)")
    t_n = cfg.n_edge_types
    seg_i = shard.edge_seg_int.astype(jnp.int32)
    seg_b = shard.edge_seg_bnd.astype(jnp.int32)
    has_bnd = bool(seg_b.shape[-1])
    nmask_f = shard.node_mask.astype(jnp.float32)

    def agg_fn(x, conv_w, layer):
        n = x.shape[0]
        mix_w = mix_w_all[layer]                          # [T, 12H, H]
        z = jnp.einsum("nh,thk->tnk", x, conv_w)
        halo = halo_exchange(x, shard.send_idx, shard.send_mask, axis)
        z_h = jnp.einsum("nh,thk->tnk", halo, conv_w)

        def stats(seg, src, z_tab):
            et = jnp.clip(seg % t_n, 0, t_n - 1)
            z_src = z_tab[et, src]
            ones = jnp.ones(seg.shape, z_src.dtype)
            kw = dict(num_segments=n * t_n, indices_are_sorted=True)
            return (segment_sum(ones, seg, n * t_n,
                                indices_are_sorted=True),
                    segment_sum(z_src, seg, n * t_n,
                                indices_are_sorted=True),
                    segment_sum(z_src * z_src, seg, n * t_n,
                                indices_are_sorted=True),
                    jax.ops.segment_min(z_src, seg, **kw),
                    jax.ops.segment_max(z_src, seg, **kw))

        cnt, s1, s2, mn, mx = stats(seg_i, shard.edge_src_int, z)
        if has_bnd:
            cnt_b, s1_b, s2_b, mn_b, mx_b = stats(
                seg_b, shard.edge_src_bnd, z_h)
            cnt, s1, s2 = cnt + cnt_b, s1 + s1_b, s2 + s2_b
            mn, mx = jnp.minimum(mn, mn_b), jnp.maximum(mx, mx_b)

        d = jnp.maximum(cnt, 1.0)[:, None]
        mean = s1 / d
        var = jnp.maximum(s2 / d - mean * mean, 0.0)
        std = jnp.where(var > 0, jnp.sqrt(jnp.where(var > 0, var, 1.0)),
                        0.0)
        has = (cnt > 0)[:, None]
        mn = jnp.where(has & jnp.isfinite(mn), mn, 0.0)
        mx = jnp.where(has & jnp.isfinite(mx), mx, 0.0)
        feats = jnp.concatenate([mean, mn, mx, std], axis=-1)
        feats = feats.reshape(n, t_n, -1)
        logd = jnp.log(jnp.maximum(cnt, 1.0) + 1.0).reshape(n, t_n)
        d_tot = cnt.reshape(n, t_n).sum(axis=1)
        # GLOBAL batch-mean normalizer (the packed path averages over
        # the whole batch; shards must agree on one delta)
        num = jax.lax.psum(
            jnp.sum(jnp.log(jnp.maximum(d_tot, 1.0) + 1.0) * nmask_f),
            axis)
        den = jax.lax.psum(nmask_f.sum(), axis)
        delta = num / jnp.maximum(den, 1.0)
        delta = jax.lax.stop_gradient(
            jnp.maximum(delta, 1e-6)).astype(feats.dtype)
        amp = (logd / delta)[..., None].astype(feats.dtype)
        att = (delta / logd)[..., None].astype(feats.dtype)
        w_id, w_amp, w_att = jnp.split(mix_w, 3, axis=1)
        return (jnp.einsum("ntf,tfh->nh", feats, w_id)
                + jnp.einsum("ntf,tfh->nh", feats * amp, w_amp)
                + jnp.einsum("ntf,tfh->nh", feats * att, w_att))
    return agg_fn


def halo_shmp_core(params, cfg, part_shard, axis: str = "graph",
                   train: bool = False, rng=None):
    """SHMP core over ONE sharded graph — runs INSIDE shard_map, one
    device's shard of a HaloPartition (leading device axis stripped).

    Shares the exact layer body with apply_shmp_core
    (models/shmp_gnn.run_shmp_layers — SAGE/GIN/GCN, dropout, concat
    skip); only the aggregation provider differs: remote contributions
    arrive through fresh pull/push exchanges per layer. Returns the
    local slice of the concat-skip embeddings [n_loc, post_input_dim].
    """
    from ..models.shmp_gnn import (
        _per_type_linear, cast_params, run_shmp_layers,
    )

    # same cast apply_shmp_core does (shmp_gnn.py): with
    # cfg.dtype=bfloat16 the halo tower must run bf16 params too, or
    # halo-vs-packed parity silently breaks and the bf16 comm savings
    # (pull/push all_to_all payloads) are lost
    params = cast_params(params, cfg.dtype)
    nmask = part_shard.node_mask[:, None].astype(cfg.dtype)
    ntype = part_shard.node_type

    x = _per_type_linear(
        part_shard.x.astype(cfg.dtype), params["pre"][0], params["pre"][1],
        ntype, cfg.n_node_types)
    x = x * nmask
    if rng is not None:
        # per-shard dropout streams
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
    if cfg.conv_type == "GAT":
        # per-(dst,type) softmax: local once sources arrive — needs a
        # pull-only partition (see halo_gat_aggregator)
        agg = halo_gat_aggregator(cfg, part_shard, params["att"], axis)
    elif cfg.conv_type == "PNA":
        agg = halo_pna_aggregator(cfg, part_shard, params["pna_mix"],
                                  axis)
    else:
        agg = halo_aggregator(cfg, part_shard, axis)
    return run_shmp_layers(
        params, cfg, x, ntype, nmask, agg, train=train, rng=rng)


def halo_graph_pool(emb_local, node_graph_local, n_graphs: int,
                    axis: str = "graph"):
    """Cross-device global-add pool: local segment-sum then psum."""
    pooled = segment_sum(emb_local, node_graph_local, n_graphs + 1)
    return jax.lax.psum(pooled[:n_graphs], axis)


def halo_gossip_single(params, part_shard, x_col_local, query_emb,
                       axis: str = "graph",
                       dropout: float = 0.0, train: bool = False,
                       rng=None):
    """Gossip forward for ONE query over ONE sharded large graph — runs
    inside shard_map on a HaloPartition shard whose edge types are the
    direction bits (0 fwd / 1 bwd). Mirrors
    models/gossip.apply_gossip_single (including its dropout points)
    with hybrid pull/push exchange feeding the per-direction
    aggregations; enables single-graph gossip inference at P2P/Astro
    scale across chips (the reference runs such graphs whole on one
    device, data.py:753-886). Aggregations run prefer_kernel=False so
    the math matches the packed path's plain-XLA f32 reduction exactly
    even on TPU."""
    from ..models.gossip import _gate
    from ..models.shmp_gnn import _dropout

    nmask = part_shard.node_mask[:, None]
    w_pre, b_pre = params["pre"]
    x = x_col_local[:, None] @ w_pre + b_pre
    qe = jnp.broadcast_to(query_emb[None, :],
                          (x.shape[0], query_emb.shape[0]))
    x = jax.lax.stop_gradient(jnp.concatenate([qe, x], axis=-1)) * nmask
    emb = x

    deg = halo_typed_aggregate(
        part_shard.node_mask[:, None], part_shard, axis,
        tag="_L100", prefer_kernel=False)[..., 0]  # [n_loc, 2]

    for li, conv in enumerate(params["convs"]):
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        g = _gate(conv, query_emb)
        agg = halo_typed_aggregate(x, part_shard, axis, tag=f"_L{li}",
                                   prefer_kernel=False)
        mixed = g * agg[:, 0] + (1.0 - g) * agg[:, 1]
        wc, bc = conv["com"]
        wdeg = (g * deg[:, 0] + (1.0 - g) * deg[:, 1])[:, None]
        aggr = mixed @ wc + bc * wdeg
        wu, bu = conv["upd"]
        x = jax.nn.relu(jnp.concatenate([aggr, x], axis=-1) @ wu + bu)
        x = _dropout(x, dropout, sub, train) * nmask
        emb = jnp.concatenate([emb, x], axis=-1)

    (w1, b1), (w2, b2), (w3, b3), (w4, b4) = params["post"]
    h = emb @ w1 + b1
    if rng is not None:
        rng, sub = jax.random.split(rng)
        h = _dropout(h, dropout, sub, train)
    h = jax.nn.leaky_relu(h, negative_slope=0.1)
    h = jax.nn.relu(h @ w2 + b2)
    h = jax.nn.relu(h @ w3 + b3)
    out = (h @ w4 + b4)[:, 0]
    return out * part_shard.node_mask


# ------------------------------------------------------- training (halo)
def halo_gossip_loss(params, part_shard, query_embs,
                     axis: str = "graph",
                     dropout: float = 0.0, train: bool = False,
                     rng=None):
    """Gossip objective over ONE sharded large graph — runs inside
    shard_map. Same semantics as models/gossip.gossip_loss (SUM over
    nodes and queries of log2(|gossip + neigh - truth| + 1),
    lightning_model.py:630-635) with the psum making the scalar global,
    so gradients through the per-layer all_to_all exchanges are exact.

    part_shard.x: [n_loc, Q] stage-1 counts; node_y: [n_loc, Q] truth.
    ``dropout``/``rng`` mirror models/gossip.gossip_loss (the reference
    trains gossip with dropout 0.01); the rng folds in the mesh
    position so each shard draws an independent stream.
    """
    n_q = query_embs.shape[0]
    if rng is not None:
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rngs = jax.random.split(rng, n_q)
    else:
        rngs = jnp.zeros((n_q, 2), dtype=jnp.uint32)

    def one_query(_, inp):
        q_emb, x_col, y_col, r = inp
        r = r if rng is not None else None
        gossip = halo_gossip_single(params, part_shard, x_col, q_emb,
                                    axis, dropout, train, r)
        pred = gossip + x_col
        loss = jnp.log2(jnp.abs(pred - y_col) + 1.0)
        return None, (loss * part_shard.node_mask).sum()

    _, losses = jax.lax.scan(
        jax.checkpoint(one_query), None,
        (query_embs, part_shard.x.T, part_shard.node_y.T, rngs))
    return jax.lax.psum(losses.sum(), axis)


def halo_gossip_step_fn(tx, mesh, axis: str = "graph",
                        dropout: float = 0.0):
    """Jitted gossip train step over a halo-partitioned graph: params
    replicated, graph sharded on the ``graph`` mesh axis, gradients flow
    through the halo all_to_all; the psum'd global loss differentiates
    to replicated gradients (same VMA argument as parallel/dp.py).
    ``dropout`` + the step's ``rng`` argument mirror the packed gossip
    trainer (train/loop.py: dropout 0.01 by default there)."""
    import optax
    from functools import partial
    from jax.sharding import PartitionSpec as P

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P(), P()),
        out_specs=(P(), P(), P()),
    )
    def step(params, opt_state, part, query_embs, lr, rng):
        shard = jax.tree_util.tree_map(lambda a: a[0], part)
        loss, grads = jax.value_and_grad(
            lambda p: halo_gossip_loss(
                p, shard, query_embs, axis, dropout=dropout,
                train=dropout > 0.0,
                rng=rng if dropout > 0.0 else None))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


# ------------------------------------------------------ serving (halo)
def serve_gossip_counts(gparams, graph, x_all: np.ndarray, query_embs,
                        n_devices: int = 0,
                        locality: str = "metis",
                        return_stats: bool = False):
    """Gossip-refined per-node counts for ONE large graph, halo-sharded
    so no device ever holds the whole graph (the production entry for
    P2P/Astro-scale inputs; the reference runs such graphs whole on one
    device, data.py:753-886).

    x_all: [n_nodes, Q] stage-1 counts scattered to node rows (zeros for
    skipped nodes — GossipDataset.apply_neighborhood_count semantics,
    workload.py:110-112). Returns [n_nodes, Q] refined counts
    (residual + input), numerically matching the single-device
    ``gossip_predict`` (tests/test_halo.py parity family). With
    ``return_stats`` also returns {"n_loc", "n_devices"} — the max
    per-device node occupancy actually served.

    Direction bits are computed on ORIGINAL node ids (src < dst) before
    locality relabeling, exactly like the packed path."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P

    from ..batch.build import gossip_sample

    n = graph.n_nodes
    n_q = x_all.shape[1]
    d = n_devices or len(jax.devices())
    s = gossip_sample(graph, x_all.astype(np.float32))

    order = locality_order(n, s.edge_src, s.edge_dst, method=locality)
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    part = partition_typed_graph(
        n, s.node_type[order], s.x[order],
        inv[s.edge_src].astype(np.int32), inv[s.edge_dst].astype(np.int32),
        s.edge_type, d, n_types=2)

    mesh = Mesh(np.asarray(jax.devices()[:d]), ("graph",))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("graph"), P("graph"), P()),
             out_specs=P("graph"))
    def run_one(gp, shard, xc, q_emb):
        shard = jax.tree_util.tree_map(lambda a: a[0], shard)
        return halo_gossip_single(gp, shard, xc[0], q_emb)[None]

    x_loc = x_all[order]
    xcols = partition_node_values(part, x_loc)        # [D, n_loc, Q]
    refined = np.empty((n, n_q), np.float32)
    with mesh:
        fn = jax.jit(run_one)
        # transfer the partition (edge streams + exchange plans, the
        # largest arrays here) and params ONCE — the per-query loop
        # previously re-uploaded them every dispatch
        gparams = jax.device_put(gparams)
        part = jax.device_put(
            part, jax.sharding.NamedSharding(mesh, P("graph")))
        xcols = jax.device_put(
            jnp.asarray(xcols), jax.sharding.NamedSharding(mesh, P("graph")))
        for qi in range(n_q):
            resid = np.asarray(fn(gparams, part, xcols[:, :, qi],
                                  query_embs[qi]))     # [D, n_loc]
            refined[:, qi] = (unpartition_nodes(part, resid)
                              + x_loc[:, qi])
    out = np.empty_like(refined)
    out[order] = refined
    if return_stats:
        return out, {"n_loc": int(part.n_loc), "n_devices": d}
    return out
