// desco_host: native host-side kernels for the desco_tpu framework.
//
// Replaces the reference's hot host paths with C++:
//   * vf2_count            — induced subgraph-isomorphism enumeration with
//                            canonical (max-node) attribution; the reference
//                            uses networkx VF2 in a process pool
//                            (/root/reference/subgraph_counting/workload.py:
//                            327-348, 655-671) and it dominates
//                            preprocessing time.
//   * neighborhood_sizes / extract_neighborhoods — canonical partition
//                            (depth-d ball, <=v filter, component of v;
//                            data.py:329-396 semantics).
//   * triangle_mask        — edge-in-triangle typing (transforms.py:168-255
//                            semantics) via sorted adjacency intersection.
//
// Exposed as a plain C ABI consumed through ctypes; calls release the GIL,
// so Python-side thread pools achieve real parallelism.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// CSR adjacency with sorted neighbor lists, built from an undirected
// edge list (each edge stored once).
struct Csr {
  std::vector<int> indptr;
  std::vector<int> indices;

  Csr(int n, int m, const int* edges) {
    std::vector<int> deg(n, 0);
    for (int e = 0; e < m; ++e) {
      ++deg[edges[2 * e]];
      ++deg[edges[2 * e + 1]];
    }
    indptr.assign(n + 1, 0);
    for (int v = 0; v < n; ++v) indptr[v + 1] = indptr[v] + deg[v];
    indices.assign(indptr[n], 0);
    std::vector<int> fill(indptr.begin(), indptr.end() - 1);
    for (int e = 0; e < m; ++e) {
      int u = edges[2 * e], v = edges[2 * e + 1];
      indices[fill[u]++] = v;
      indices[fill[v]++] = u;
    }
    for (int v = 0; v < n; ++v)
      std::sort(indices.begin() + indptr[v], indices.begin() + indptr[v + 1]);
  }

  int degree(int v) const { return indptr[v + 1] - indptr[v]; }
  const int* begin(int v) const { return indices.data() + indptr[v]; }
  const int* end(int v) const { return indices.data() + indptr[v + 1]; }
  bool has_edge(int u, int v) const {
    return std::binary_search(begin(u), end(u), v);
  }
};

// Dense bitset adjacency for fast prefix checks in VF2.
struct BitAdj {
  int n;
  int words;
  std::vector<uint64_t> bits;

  BitAdj(int n_, int m, const int* edges) : n(n_), words((n_ + 63) / 64) {
    bits.assign(static_cast<size_t>(n) * words, 0);
    for (int e = 0; e < m; ++e) {
      int u = edges[2 * e], v = edges[2 * e + 1];
      set(u, v);
      set(v, u);
    }
  }
  void set(int u, int v) {
    bits[static_cast<size_t>(u) * words + (v >> 6)] |= 1ull << (v & 63);
  }
  bool get(int u, int v) const {
    return (bits[static_cast<size_t>(u) * words + (v >> 6)] >>
            (v & 63)) & 1ull;
  }
};

}  // namespace

extern "C" {

// Induced subgraph-isomorphism count of query in target.
//   tlabels/qlabels: optional node labels (nullptr = unlabeled); a mapping
//   is valid only if labels match (the use_node_feature mode,
//   workload.py:336-341).
//   per_node: optional int64 buffer of length nt; per embedding, the slot
//   of its max target node is incremented (canonical attribution).
// Returns the total number of embeddings (NOT divided by |Aut(query)|).
long long vf2_count(int nt, int mt, const int* tedges,
                    int nq, int mq, const int* qedges,
                    const int* tlabels, const int* qlabels,
                    long long* per_node) {
  if (nq > nt || nq == 0) return 0;
  Csr tcsr(nt, mt, tedges);
  Csr qcsr(nq, mq, qedges);
  BitAdj tadj(nt, mt, tedges);
  BitAdj qadj(nq, mq, qedges);

  // matching order: max-degree first, then most-connected-to-prefix
  std::vector<int> order;
  std::vector<char> in_order(nq, 0);
  {
    int best = 0;
    for (int v = 1; v < nq; ++v)
      if (qcsr.degree(v) > qcsr.degree(best)) best = v;
    order.push_back(best);
    in_order[best] = 1;
    while ((int)order.size() < nq) {
      int pick = -1, pick_conn = -1, pick_deg = -1;
      for (int v = 0; v < nq; ++v) {
        if (in_order[v]) continue;
        int conn = 0;
        for (int u : order) conn += qadj.get(v, u);
        if (conn > 0 &&
            (conn > pick_conn ||
             (conn == pick_conn && qcsr.degree(v) > pick_deg))) {
          pick = v;
          pick_conn = conn;
          pick_deg = qcsr.degree(v);
        }
      }
      if (pick < 0) return 0;  // disconnected query unsupported
      order.push_back(pick);
      in_order[pick] = 1;
    }
  }
  // parent position (earlier neighbor) for candidate generation
  std::vector<int> parent(nq, -1);
  for (int i = 1; i < nq; ++i)
    for (int j = 0; j < i; ++j)
      if (qadj.get(order[i], order[j])) { parent[i] = j; break; }

  std::vector<int> mapped(nq, -1);
  std::vector<char> used(nt, 0);
  long long total = 0;

  // iterative DFS with explicit candidate cursors
  struct Frame { const int* cur; const int* end; };
  std::vector<Frame> stack(nq);
  int depth = 0;
  // depth-0 candidates: all target nodes (iterate directly)
  int root_cand = 0;

  auto feasible = [&](int i, int t) -> bool {
    if (used[t]) return false;
    int qn = order[i];
    if (tcsr.degree(t) < qcsr.degree(qn)) return false;
    if (qlabels && tlabels && qlabels[qn] != tlabels[t]) return false;
    for (int j = 0; j < i; ++j) {
      bool aq = qadj.get(qn, order[j]);
      bool at = tadj.get(t, mapped[j]);
      if (aq != at) return false;
    }
    return true;
  };

  while (true) {
    if (depth == 0) {
      // advance root
      bool placed = false;
      while (root_cand < nt) {
        int t = root_cand++;
        if (feasible(0, t)) {
          mapped[0] = t;
          used[t] = 1;
          placed = true;
          break;
        }
      }
      if (!placed) break;  // exhausted roots: done
      if (nq == 1) {
        ++total;
        if (per_node) ++per_node[mapped[0]];
        used[mapped[0]] = 0;
        continue;
      }
      depth = 1;
      stack[1] = {tcsr.begin(mapped[parent[1]]), tcsr.end(mapped[parent[1]])};
      continue;
    }
    // advance candidates at this depth
    bool placed = false;
    while (stack[depth].cur != stack[depth].end) {
      int t = *stack[depth].cur++;
      if (feasible(depth, t)) {
        mapped[depth] = t;
        used[t] = 1;
        placed = true;
        break;
      }
    }
    if (!placed) {
      // backtrack
      --depth;
      used[mapped[depth]] = 0;
      mapped[depth] = -1;
      continue;
    }
    if (depth == nq - 1) {
      ++total;
      if (per_node) {
        int mx = 0;
        for (int j = 0; j < nq; ++j) mx = std::max(mx, mapped[j]);
        ++per_node[mx];
      }
      used[mapped[depth]] = 0;
      mapped[depth] = -1;
      continue;
    }
    ++depth;
    stack[depth] = {tcsr.begin(mapped[parent[depth]]),
                    tcsr.end(mapped[parent[depth]])};
  }
  return total;
}

// Canonical partition, pass 1: per-node neighborhood sizes.
// sizes[v] = number of nodes in v's canonical neighborhood, or 0 if the
// neighborhood has no edges (dropped).
// Pass 2 (extract_neighborhoods): fills out_nodes with the concatenated
// sorted node lists (ascending original ids; v is always last) and
// returns the total length. Call with out_nodes=nullptr to get the size.
static void canonical_ball(const Csr& csr, int n, int v, int depth,
                           std::vector<int>& seen_stamp, int stamp,
                           std::vector<int>& frontier,
                           std::vector<int>& next_frontier,
                           std::vector<int>& ball) {
  ball.clear();
  frontier.clear();
  seen_stamp[v] = stamp;
  frontier.push_back(v);
  ball.push_back(v);
  for (int d = 0; d < depth && !frontier.empty(); ++d) {
    next_frontier.clear();
    for (int u : frontier) {
      for (const int* p = csr.begin(u); p != csr.end(u); ++p) {
        if (seen_stamp[*p] != stamp) {
          seen_stamp[*p] = stamp;
          next_frontier.push_back(*p);
          ball.push_back(*p);
        }
      }
    }
    frontier.swap(next_frontier);
  }
}

long long extract_neighborhoods(int n, int m, const int* edges, int depth,
                                int* sizes, int* out_nodes) {
  Csr csr(n, m, edges);
  std::vector<int> seen(n, -1), fr, nf, ball;
  std::vector<int> keep_stamp(n, -1), comp_stamp(n, -1);
  std::vector<int> comp_stack;
  long long off = 0;
  for (int v = 0; v < n; ++v) {
    canonical_ball(csr, n, v, depth, seen, v, fr, nf, ball);
    // filter <= v
    int kept = 0;
    for (int u : ball)
      if (u <= v) { keep_stamp[u] = v; ++kept; }
    // component of v within kept nodes
    comp_stack.clear();
    comp_stack.push_back(v);
    comp_stamp[v] = v;
    int comp_size = 1;
    long long comp_edges = 0;
    while (!comp_stack.empty()) {
      int u = comp_stack.back();
      comp_stack.pop_back();
      for (const int* p = csr.begin(u); p != csr.end(u); ++p) {
        int w = *p;
        if (keep_stamp[w] == v) {
          ++comp_edges;  // counts each direction once per endpoint in comp
          if (comp_stamp[w] != v) {
            comp_stamp[w] = v;
            ++comp_size;
            comp_stack.push_back(w);
          }
        }
      }
    }
    // comp_edges counted u->w for u in comp, w in keep; since comp is a
    // connected component of the kept-induced subgraph, w in keep adjacent
    // to u in comp implies w in comp; every undirected edge counted twice.
    long long n_edges = comp_edges / 2;
    if (n_edges == 0) {
      sizes[v] = 0;
      continue;
    }
    sizes[v] = comp_size;
    if (out_nodes) {
      // ascending ids: iterate 0..v
      for (int u = 0; u <= v; ++u)
        if (comp_stamp[u] == v) out_nodes[off++] = u;
    } else {
      off += comp_size;
    }
  }
  return off;
}

// Fused canonical-partition + SHMP sample preparation: one call per
// graph replaces, per neighborhood, the Python chain
// induced_subgraph -> triangle_edge_mask -> _directed -> edge typing
// (batch/build.py:63-110, graph/triangles.py) that dominates serving
// host prep. For every surviving neighborhood of v it emits
//   * its node list (ascending original ids; v, the canonical node,
//     is always last — it is the max id of the <=v-filtered ball),
//   * the DIRECTED typed edge stream in local indices: all forward
//     (u->w, u<w) slots first, then all reversed — the _directed
//     layout — with the 6-type tconv table of build.py:
//     src-canonical ? (tri?4:5) : dst-canonical ? (tri?2:3) : (tri?0:1),
//     triangles meaning a common neighbor INSIDE the neighborhood.
// Pass 1 (out_nodes == nullptr): fills sizes[v] (#nodes, 0 = dropped)
// and esizes[v] (#directed edges), returns total node count.
// Pass 2: also fills out_nodes / out_src / out_dst / out_etype
// (lengths sum(sizes) and sum(esizes)).
long long prepare_samples(int n, int m, const int* edges, int depth,
                          int* sizes, long long* esizes,
                          int* out_nodes, int* out_src, int* out_dst,
                          int* out_etype) {
  Csr csr(n, m, edges);
  std::vector<int> seen(n, -1), fr, nf, ball;
  std::vector<int> keep_stamp(n, -1), comp_stamp(n, -1);
  std::vector<int> relabel(n, 0);
  std::vector<int> comp_stack, local_nodes;
  long long noff = 0, eoff = 0;
  for (int v = 0; v < n; ++v) {
    canonical_ball(csr, n, v, depth, seen, v, fr, nf, ball);
    for (int u : ball)
      if (u <= v) keep_stamp[u] = v;
    comp_stack.clear();
    comp_stack.push_back(v);
    comp_stamp[v] = v;
    int comp_size = 1;
    long long comp_edges = 0;
    while (!comp_stack.empty()) {
      int u = comp_stack.back();
      comp_stack.pop_back();
      for (const int* p = csr.begin(u); p != csr.end(u); ++p) {
        int w = *p;
        if (keep_stamp[w] == v) {
          ++comp_edges;  // directed: each undirected edge seen twice
          if (comp_stamp[w] != v) {
            comp_stamp[w] = v;
            ++comp_size;
            comp_stack.push_back(w);
          }
        }
      }
    }
    if (comp_edges == 0) {
      sizes[v] = 0;
      esizes[v] = 0;
      continue;
    }
    sizes[v] = comp_size;
    esizes[v] = comp_edges;
    if (!out_nodes) {
      noff += comp_size;
      continue;
    }
    local_nodes.clear();
    for (int u = 0; u <= v; ++u)
      if (comp_stamp[u] == v) {
        relabel[u] = static_cast<int>(local_nodes.size());
        out_nodes[noff + local_nodes.size()] = u;
        local_nodes.push_back(u);
      }
    noff += comp_size;
    const int canon = comp_size - 1;
    const long long mu = comp_edges / 2;  // undirected count
    long long k = 0;
    for (int u : local_nodes) {
      for (const int* p = csr.begin(u); p != csr.end(u); ++p) {
        int w = *p;
        if (w <= u || comp_stamp[w] != v) continue;
        // triangle iff a common neighbor lies inside the component
        unsigned char tri = 0;
        const int* a = csr.begin(u);
        const int* ae = csr.end(u);
        const int* b = csr.begin(w);
        const int* be = csr.end(w);
        while (a != ae && b != be) {
          if (*a < *b) {
            ++a;
          } else if (*b < *a) {
            ++b;
          } else {
            if (comp_stamp[*a] == v) { tri = 1; break; }
            ++a;
            ++b;
          }
        }
        const int lu = relabel[u], lw = relabel[w];
        const int t_fwd = (lu == canon) ? (tri ? 4 : 5)
                          : (lw == canon) ? (tri ? 2 : 3)
                                          : (tri ? 0 : 1);
        const int t_rev = (lw == canon) ? (tri ? 4 : 5)
                          : (lu == canon) ? (tri ? 2 : 3)
                                          : (tri ? 0 : 1);
        out_src[eoff + k] = lu;
        out_dst[eoff + k] = lw;
        out_etype[eoff + k] = t_fwd;
        out_src[eoff + mu + k] = lw;
        out_dst[eoff + mu + k] = lu;
        out_etype[eoff + mu + k] = t_rev;
        ++k;
      }
    }
    eoff += comp_edges;
  }
  return noff;
}

// Per-undirected-edge triangle flag: out[e] = 1 iff the edge closes >= 1
// triangle.
void triangle_mask(int n, int m, const int* edges, unsigned char* out) {
  Csr csr(n, m, edges);
  for (int e = 0; e < m; ++e) {
    int u = edges[2 * e], v = edges[2 * e + 1];
    if (csr.degree(u) > csr.degree(v)) std::swap(u, v);
    const int* a = csr.begin(u);
    const int* ae = csr.end(u);
    const int* b = csr.begin(v);
    const int* be = csr.end(v);
    unsigned char flag = 0;
    while (a != ae && b != be) {
      if (*a < *b) ++a;
      else if (*b < *a) ++b;
      else { flag = 1; break; }
    }
    out[e] = flag;
  }
}

int desco_host_abi_version() { return 1; }

}  // extern "C"
