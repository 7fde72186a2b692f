// gcnrec — native host-side graph ETL for the TPU LightGCN framework.
//
// The reference delegates all native work to prebuilt torch kernels
// (SURVEY.md §2: torch.sparse.mm / topk / Embedding); its host-side ETL
// (K-core filtering, adjacency construction) is pure pandas/scipy
// (dataset/*/prepare_data.py:39-48, main.py:282-331).  Here those ETL hot
// loops are native C++:
//
//   * kcore_filter      — O(E) queue-based peeling (the reference's
//                         repeated value_counts loop is O(iters * E))
//   * build_norm_edges  — dedup-sum + symmetric D^-1/2 A D^-1/2
//                         normalization + dst-major sort in one pass
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// The Python callers fall back to numpy when the library is not built.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// Iterative K-core filter over (user, item) interactions.
// users/items: dense ids (int64), n interactions; k threshold.
// keep[e] = 1 if interaction e survives.  Matches the reference fixpoint:
// repeatedly drop all interactions of users/items with < k remaining
// interactions (dataset/amazon_books/prepare_data.py:39-48).
void gcnrec_kcore_filter(const int64_t* users, const int64_t* items,
                         int64_t n, int64_t k, uint8_t* keep) {
  if (n == 0) return;
  int64_t num_users = 0, num_items = 0;
  for (int64_t e = 0; e < n; ++e) {
    num_users = std::max(num_users, users[e] + 1);
    num_items = std::max(num_items, items[e] + 1);
  }
  std::vector<int64_t> udeg(num_users, 0), ideg(num_items, 0);
  for (int64_t e = 0; e < n; ++e) {
    ++udeg[users[e]];
    ++ideg[items[e]];
  }
  // CSR adjacency: per-user and per-item edge lists
  std::vector<int64_t> uptr(num_users + 1, 0), iptr(num_items + 1, 0);
  for (int64_t u = 0; u < num_users; ++u) uptr[u + 1] = uptr[u] + udeg[u];
  for (int64_t i = 0; i < num_items; ++i) iptr[i + 1] = iptr[i] + ideg[i];
  std::vector<int64_t> uedges(n), iedges(n);
  {
    std::vector<int64_t> ucur(uptr.begin(), uptr.end() - 1),
        icur(iptr.begin(), iptr.end() - 1);
    for (int64_t e = 0; e < n; ++e) {
      uedges[ucur[users[e]]++] = e;
      iedges[icur[items[e]]++] = e;
    }
  }
  std::memset(keep, 1, static_cast<size_t>(n));
  if (k <= 1) return;

  // peeling worklist: (is_item, id) of nodes that just became weak
  std::vector<std::pair<uint8_t, int64_t>> queue;
  std::vector<uint8_t> uweak(num_users, 0), iweak(num_items, 0);
  for (int64_t u = 0; u < num_users; ++u)
    if (udeg[u] > 0 && udeg[u] < k) { uweak[u] = 1; queue.push_back({0, u}); }
  for (int64_t i = 0; i < num_items; ++i)
    if (ideg[i] > 0 && ideg[i] < k) { iweak[i] = 1; queue.push_back({1, i}); }

  for (size_t qi = 0; qi < queue.size(); ++qi) {
    auto [is_item, id] = queue[qi];
    const int64_t* ptr = is_item ? iptr.data() : uptr.data();
    const int64_t* edges = is_item ? iedges.data() : uedges.data();
    for (int64_t p = ptr[id]; p < ptr[id + 1]; ++p) {
      int64_t e = edges[p];
      if (!keep[e]) continue;
      keep[e] = 0;
      int64_t u = users[e], i = items[e];
      if (--udeg[u] < k && udeg[u] >= 0 && !uweak[u] && udeg[u] > 0) {
        uweak[u] = 1;
        queue.push_back({0, u});
      }
      if (--ideg[i] < k && ideg[i] >= 0 && !iweak[i] && ideg[i] > 0) {
        iweak[i] = 1;
        queue.push_back({1, i});
      }
    }
  }
}

// Phase 1 of normalized-adjacency construction: sort by (dst, src),
// dedup-sum multiplicities, compute degrees.  rows/cols are node ids in
// [0, num_nodes); the matrix is assumed symmetric (both directions
// present in the input, as main.py:304-311 builds it).
//
// Returns nnz (number of unique entries).  Caller allocates out arrays of
// size >= n; out_dst/out_src are int32, out_w holds the normalized
// weights D^-1/2 A D^-1/2 (main.py:326-331).
int64_t gcnrec_build_norm_edges(const int64_t* rows, const int64_t* cols,
                                int64_t n, int64_t num_nodes,
                                int32_t* out_dst, int32_t* out_src,
                                float* out_w) {
  std::vector<uint64_t> key(n);
  const uint64_t nn = static_cast<uint64_t>(num_nodes);
  for (int64_t e = 0; e < n; ++e)
    key[e] = static_cast<uint64_t>(rows[e]) * nn + static_cast<uint64_t>(cols[e]);
  std::sort(key.begin(), key.end());

  // dedup with multiplicity, accumulate degree = sum of row entries
  std::vector<double> deg(num_nodes, 0.0);
  int64_t nnz = 0;
  for (int64_t e = 0; e < n;) {
    int64_t e2 = e;
    while (e2 < n && key[e2] == key[e]) ++e2;
    uint64_t kv = key[e];
    int64_t r = static_cast<int64_t>(kv / nn);
    int64_t c = static_cast<int64_t>(kv % nn);
    float v = static_cast<float>(e2 - e);
    out_dst[nnz] = static_cast<int32_t>(r);
    out_src[nnz] = static_cast<int32_t>(c);
    out_w[nnz] = v;
    deg[r] += v;
    ++nnz;
    e = e2;
  }
  std::vector<float> dinv(num_nodes);
  for (int64_t v = 0; v < num_nodes; ++v)
    dinv[v] = deg[v] > 0.0 ? static_cast<float>(1.0 / std::sqrt(deg[v])) : 0.0f;
  for (int64_t e = 0; e < nnz; ++e)
    out_w[e] *= dinv[out_dst[e]] * dinv[out_src[e]];
  return nnz;
}

}  // extern "C"
