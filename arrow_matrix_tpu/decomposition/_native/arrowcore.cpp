// arrowcore — C++ core for the arrow decomposition's sequential graph
// algorithms: Kruskal random spanning forest (union-find with rank + path
// compression) and subtree-size DFS linearization.
//
// This is the TPU framework's native-language replacement for the
// reference's Julia performance rewrite (reference:
// julia/arrow/GraphAlgorithms.jl — DisjointSet :7-41, minimum_spanning_forest
// :45-80, bfs :83-157; julia/arrow/ArrowDecomposition.jl linearization),
// which exists because the pure-Python pipeline is too slow for
// 100M+-row graphs (reference: README.md:50,67-68).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
//
// Build: make -C arrow_matrix_tpu/decomposition/_native

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

using std::int64_t;

namespace {

struct DisjointSet {
  std::vector<int64_t> parent;
  std::vector<int32_t> rank_;

  explicit DisjointSet(int64_t n) : parent(n), rank_(n, 0) {
    std::iota(parent.begin(), parent.end(), int64_t{0});
  }

  int64_t find(int64_t v) {
    int64_t root = v;
    while (parent[root] != root) root = parent[root];
    while (parent[v] != root) {  // path compression
      int64_t next = parent[v];
      parent[v] = root;
      v = next;
    }
    return root;
  }

  bool unite(int64_t a, int64_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return false;
    if (rank_[a] < rank_[b]) std::swap(a, b);
    parent[b] = a;
    if (rank_[a] == rank_[b]) ++rank_[a];
    return true;
  }
};

}  // namespace

extern "C" {

// Kruskal minimum spanning forest of an undirected graph given as a
// symmetric CSR pattern with per-entry weights. Emits the forest directly as
// a rooted predecessor array (BFS-rooted at each component's smallest
// vertex, components ordered by smallest vertex) — the representation the
// linearizer consumes.
int arrow_random_forest(int64_t n, const int64_t* indptr,
                        const int64_t* indices, const double* weights,
                        int64_t* pred, int64_t* ncomp_out) {
  const int64_t nnz = indptr[n];

  // Candidate edges: upper-triangle entries only (the caller passes a
  // symmetric pattern; each undirected edge is considered once).
  std::vector<int64_t> eu, ev;
  std::vector<double> ew;
  eu.reserve(nnz / 2);
  ev.reserve(nnz / 2);
  ew.reserve(nnz / 2);
  for (int64_t u = 0; u < n; ++u) {
    for (int64_t p = indptr[u]; p < indptr[u + 1]; ++p) {
      const int64_t v = indices[p];
      if (v > u) {
        eu.push_back(u);
        ev.push_back(v);
        ew.push_back(weights[p]);
      }
    }
  }

  std::vector<int64_t> order(eu.size());
  std::iota(order.begin(), order.end(), int64_t{0});
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return ew[a] < ew[b]; });

  DisjointSet ds(n);
  std::vector<int64_t> fu, fv;
  fu.reserve(n);
  fv.reserve(n);
  for (int64_t idx : order) {
    if (ds.unite(eu[idx], ev[idx])) {
      fu.push_back(eu[idx]);
      fv.push_back(ev[idx]);
      if (static_cast<int64_t>(fu.size()) == n - 1) break;
    }
  }

  // Forest adjacency (counting sort).
  std::vector<int64_t> deg(n, 0);
  for (size_t i = 0; i < fu.size(); ++i) {
    ++deg[fu[i]];
    ++deg[fv[i]];
  }
  std::vector<int64_t> adj_ptr(n + 1, 0);
  for (int64_t v = 0; v < n; ++v) adj_ptr[v + 1] = adj_ptr[v] + deg[v];
  std::vector<int64_t> adj(fu.size() * 2);
  std::vector<int64_t> fill(adj_ptr.begin(), adj_ptr.end() - 1);
  for (size_t i = 0; i < fu.size(); ++i) {
    adj[fill[fu[i]]++] = fv[i];
    adj[fill[fv[i]]++] = fu[i];
  }

  // Root every component at its smallest vertex; BFS to build pred.
  std::fill(pred, pred + n, int64_t{-2});  // -2 == unvisited
  std::vector<int64_t> queue;
  queue.reserve(n);
  int64_t ncomp = 0;
  for (int64_t r = 0; r < n; ++r) {
    if (pred[r] != -2) continue;
    ++ncomp;
    pred[r] = -1;
    queue.clear();
    queue.push_back(r);
    for (size_t qi = 0; qi < queue.size(); ++qi) {
      const int64_t u = queue[qi];
      for (int64_t p = adj_ptr[u]; p < adj_ptr[u + 1]; ++p) {
        const int64_t v = adj[p];
        if (pred[v] == -2) {
          pred[v] = u;
          queue.push_back(v);
        }
      }
    }
  }
  *ncomp_out = ncomp;
  return 0;
}

// Subtree-size DFS preorder of a rooted forest: visit children in
// increasing subtree-size order (ties by id), one tree after another in the
// given root order. Mirrors the closed-form numpy implementation
// (arrow_matrix_tpu/decomposition/linearize.py) and the reference's
// stack traversal semantics.
int arrow_linearize_forest(int64_t n, const int64_t* pred,
                           const int64_t* roots, int64_t n_roots,
                           int64_t* out_order) {
  // Children lists via counting sort.
  std::vector<int64_t> child_cnt(n, 0);
  for (int64_t v = 0; v < n; ++v)
    if (pred[v] >= 0) ++child_cnt[pred[v]];
  std::vector<int64_t> child_ptr(n + 1, 0);
  for (int64_t v = 0; v < n; ++v) child_ptr[v + 1] = child_ptr[v] + child_cnt[v];
  std::vector<int64_t> children(child_ptr[n]);
  std::vector<int64_t> fill(child_ptr.begin(), child_ptr.end() - 1);
  for (int64_t v = 0; v < n; ++v)
    if (pred[v] >= 0) children[fill[pred[v]]++] = v;

  // Subtree sizes: process vertices in reverse BFS order.
  std::vector<int64_t> bfs;
  bfs.reserve(n);
  for (int64_t r = 0; r < n_roots; ++r) bfs.push_back(roots[r]);
  for (size_t qi = 0; qi < bfs.size(); ++qi) {
    const int64_t u = bfs[qi];
    for (int64_t p = child_ptr[u]; p < child_ptr[u + 1]; ++p)
      bfs.push_back(children[p]);
  }
  if (static_cast<int64_t>(bfs.size()) != n) return 1;  // pred/roots mismatch

  std::vector<int64_t> size(n, 1);
  for (int64_t i = n - 1; i >= 0; --i) {
    const int64_t v = bfs[i];
    if (pred[v] >= 0) size[pred[v]] += size[v];
  }

  // Order children of every vertex by (size asc, id asc).
  for (int64_t v = 0; v < n; ++v) {
    std::sort(children.begin() + child_ptr[v], children.begin() + child_ptr[v + 1],
              [&](int64_t a, int64_t b) {
                return size[a] != size[b] ? size[a] < size[b] : a < b;
              });
  }

  // Explicit-stack DFS preorder; push children reversed so the smallest
  // subtree is visited first.
  std::vector<int64_t> stack;
  stack.reserve(64);
  int64_t pos = 0;
  for (int64_t r = 0; r < n_roots; ++r) {
    stack.push_back(roots[r]);
    while (!stack.empty()) {
      const int64_t v = stack.back();
      stack.pop_back();
      out_order[pos++] = v;
      for (int64_t p = child_ptr[v + 1] - 1; p >= child_ptr[v]; --p)
        stack.push_back(children[p]);
    }
  }
  return pos == n ? 0 : 2;
}

}  // extern "C"

namespace {

// One fused pass of the per-level edge split (the hot numpy phase at
// 100M+-edge scale — reference equivalents: the Julia edge selection
// julia/arrow/ArrowDecomposition.jl:137-185 and permuted rebuild): permute
// every entry of the level CSR by `inv`, test the arrow criterion, and
// emit TWO canonical CSR matrices in one sweep —
//   B: the in-arrow entries under NEW ids (rows/cols permuted, col-sorted);
//   L: the leftover entries under ORIGINAL ids (order preserved => sorted).
// The input must be canonical (unique, sorted entries); B and L then are
// too. keep_all=1 takes every entry into B (the final level's full
// permutation). Templated over the index type so int32 scipy indices avoid
// a 2x-nnz widening copy on the Python side.
//
// Caller preallocates B_indices/B_data and L_indices/L_data at nnz entries;
// counts_out = {B_nnz, L_nnz}.
template <typename I>
int partition_edges_impl(int64_t n, const int64_t* indptr, const I* indices,
                         const float* data, const int64_t* inv, int64_t width,
                         int block_diagonal, int prune, int keep_all,
                         int64_t* B_indptr, I* B_indices, float* B_data,
                         int64_t* L_indptr, I* L_indices, float* L_data,
                         int64_t* counts_out) {
  const int64_t nnz = indptr[n];

  auto in_arrow = [&](int64_t pu, int64_t pv) -> bool {
    if (keep_all) return true;
    bool in;
    if (block_diagonal)
      in = (pu / width) == (pv / width);
    else
      in = (pu >= pv ? pu - pv : pv - pu) <= width;
    if (prune) in = in || pu < width || pv < width;
    return in;
  };

  // Pass 1: count B rows (new ids) and L rows (original ids).
  std::vector<int64_t> b_cnt(n, 0), l_cnt(n, 0);
#pragma omp parallel for schedule(static)
  for (int64_t u = 0; u < n; ++u) {
    const int64_t pu = inv[u];
    int64_t bc = 0, lc = 0;
    for (int64_t p = indptr[u]; p < indptr[u + 1]; ++p) {
      if (in_arrow(pu, inv[indices[p]]))
        ++bc;
      else
        ++lc;
    }
    b_cnt[pu] = bc;  // all of source row u's kept entries land in new row pu
    l_cnt[u] = lc;
  }
  B_indptr[0] = 0;
  L_indptr[0] = 0;
  for (int64_t r = 0; r < n; ++r) {
    B_indptr[r + 1] = B_indptr[r] + b_cnt[r];
    L_indptr[r + 1] = L_indptr[r] + l_cnt[r];
  }
  counts_out[0] = B_indptr[n];
  counts_out[1] = L_indptr[n];
  if (counts_out[0] + counts_out[1] != nnz) return 1;

  // Pass 2: fill. Each source row u maps to exactly one B row (pu) and one
  // L row (u), so rows can be filled independently in parallel.
#pragma omp parallel for schedule(static)
  for (int64_t u = 0; u < n; ++u) {
    const int64_t pu = inv[u];
    int64_t bfill = B_indptr[pu];
    int64_t lfill = L_indptr[u];
    for (int64_t p = indptr[u]; p < indptr[u + 1]; ++p) {
      const I v = indices[p];
      const int64_t pv = inv[v];
      if (in_arrow(pu, pv)) {
        B_indices[bfill] = static_cast<I>(pv);
        B_data[bfill] = data[p];
        ++bfill;
      } else {
        L_indices[lfill] = v;
        L_data[lfill] = data[p];
        ++lfill;
      }
    }
  }

  // Pass 3: sort B's rows by column (L inherits the input's order).
#pragma omp parallel for schedule(dynamic, 1024)
  for (int64_t r = 0; r < n; ++r) {
    const int64_t lo = B_indptr[r], hi = B_indptr[r + 1];
    const int64_t len = hi - lo;
    if (len <= 1) continue;
    // Sort (index, value) pairs by index.
    std::vector<std::pair<I, float>> row(len);
    for (int64_t i = 0; i < len; ++i)
      row[i] = {B_indices[lo + i], B_data[lo + i]};
    std::sort(row.begin(), row.end(),
              [](const auto& a, const auto& b) { return a.first < b.first; });
    for (int64_t i = 0; i < len; ++i) {
      B_indices[lo + i] = row[i].first;
      B_data[lo + i] = row[i].second;
    }
  }
  return 0;
}

}  // namespace

extern "C" {

int arrow_partition_edges(int64_t n, const int64_t* indptr,
                          const int64_t* indices, const float* data,
                          const int64_t* inv, int64_t width,
                          int block_diagonal, int prune, int keep_all,
                          int64_t* B_indptr, int64_t* B_indices, float* B_data,
                          int64_t* L_indptr, int64_t* L_indices, float* L_data,
                          int64_t* counts_out) {
  return partition_edges_impl<int64_t>(
      n, indptr, indices, data, inv, width, block_diagonal, prune, keep_all,
      B_indptr, B_indices, B_data, L_indptr, L_indices, L_data, counts_out);
}

int arrow_partition_edges_i32(int64_t n, const int64_t* indptr,
                              const int32_t* indices, const float* data,
                              const int64_t* inv, int64_t width,
                              int block_diagonal, int prune, int keep_all,
                              int64_t* B_indptr, int32_t* B_indices,
                              float* B_data, int64_t* L_indptr,
                              int32_t* L_indices, float* L_data,
                              int64_t* counts_out) {
  return partition_edges_impl<int32_t>(
      n, indptr, indices, data, inv, width, block_diagonal, prune, keep_all,
      B_indptr, B_indices, B_data, L_indptr, L_indices, L_data, counts_out);
}

}  // extern "C"

namespace {

// Parallel histogram of column indices (np.bincount replacement for the
// in-degree half of total_degrees, the hottest remaining numpy phase of the
// directed decomposition pipeline at 100M+-edge scale). Per-thread local
// histograms, then a parallel reduction over bins.
template <typename I>
void bincount_impl(int64_t nnz, const I* indices, int64_t n_bins,
                   int64_t* out) {
#ifdef _OPENMP
  const int max_t = omp_get_max_threads();
#else
  const int max_t = 1;
#endif
  if (max_t <= 1 || nnz < (int64_t{1} << 20)) {
    std::memset(out, 0, sizeof(int64_t) * n_bins);
    for (int64_t i = 0; i < nnz; ++i) ++out[indices[i]];
    return;
  }
  // Per-thread histograms cost max_t * n_bins * 8 bytes — tens of GB at
  // reference vertex counts (e.g. kmer_V2a ~55M bins on a 96-thread host).
  // Above a 256 MB budget switch to bin-range partitioning: every thread
  // streams the whole index array but owns a contiguous bin range, so the
  // extra memory is zero and writes never contend.
  if (static_cast<int64_t>(max_t) * n_bins * 8 > (int64_t{1} << 28)) {
#pragma omp parallel
    {
#ifdef _OPENMP
      const int t = omp_get_thread_num();
      const int n_t = omp_get_num_threads();
#else
      const int t = 0;
      const int n_t = 1;
#endif
      const int64_t lo = n_bins * t / n_t;
      const int64_t hi = n_bins * (t + 1) / n_t;
      std::memset(out + lo, 0, sizeof(int64_t) * (hi - lo));
      for (int64_t i = 0; i < nnz; ++i) {
        const int64_t c = static_cast<int64_t>(indices[i]);
        if (c >= lo && c < hi) ++out[c];
      }
    }
    return;
  }
  std::vector<int64_t> local(static_cast<size_t>(max_t) * n_bins, 0);
#pragma omp parallel
  {
#ifdef _OPENMP
    int64_t* mine = local.data() + int64_t{omp_get_thread_num()} * n_bins;
#else
    int64_t* mine = local.data();
#endif
#pragma omp for schedule(static)
    for (int64_t i = 0; i < nnz; ++i) ++mine[indices[i]];
#pragma omp barrier
#pragma omp for schedule(static)
    for (int64_t b = 0; b < n_bins; ++b) {
      int64_t s = 0;
      for (int t = 0; t < max_t; ++t) s += local[int64_t{t} * n_bins + b];
      out[b] = s;
    }
  }
}

}  // namespace

extern "C" {

int arrow_bincount(int64_t nnz, const int64_t* indices, int64_t n_bins,
                   int64_t* out) {
  bincount_impl<int64_t>(nnz, indices, n_bins, out);
  return 0;
}

int arrow_bincount_i32(int64_t nnz, const int32_t* indices, int64_t n_bins,
                       int64_t* out) {
  bincount_impl<int32_t>(nnz, indices, n_bins, out);
  return 0;
}

}  // extern "C"
