// gnnome_native — C++ support library for gnnome_tpu.
//
// Provides the CPU-bound preprocessing/decoding primitives that the reference
// delegates to third-party native code:
//   * exact global edit distance (replaces the edlib dependency,
//     reference graph_parser.py:110 — banded DP with Ukkonen band doubling,
//     exact for any inputs, fast for the high-identity overlaps seen in
//     assembly graphs);
//   * batch overlap-similarity computation straight from the packed read
//     store (real strand stored, reverse complements materialised on the fly
//     — node i^1 is the RC of node i, reference graph_parser.py:174-184);
//   * greedy decode walk inner loop (reference inference.py:70-157) over CSR
//     arrays.
//
// Exposed with a plain C ABI for ctypes.  Build: native/build.sh -> libgnnome.so
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline char complement(char c) {
  switch (c) {
    case 'A': return 'T';
    case 'C': return 'G';
    case 'G': return 'C';
    case 'T': return 'A';
    case 'a': return 't';
    case 'c': return 'g';
    case 'g': return 'c';
    case 't': return 'a';
    default:  return 'N';
  }
}

// Banded Levenshtein with band half-width k.  Returns the exact global edit
// distance if it is <= k, otherwise some value > k (caller must widen).
int64_t banded_levenshtein(const char* a, int64_t n, const char* b, int64_t m,
                           int64_t k) {
  if (n > m) { std::swap(a, b); std::swap(n, m); }
  if (m - n > k) return k + 1;
  const int64_t INF = k + 1;
  // dp row over diagonal window [i - k, i + k] intersect [0, m]
  std::vector<int64_t> prev(2 * k + 1, INF), cur(2 * k + 1, INF);
  // row 0: D[0][j] = j for j in [0, k]
  for (int64_t d = 0; d <= k && d + k < (int64_t)prev.size(); ++d) prev[k + d] = d;
  for (int64_t i = 1; i <= n; ++i) {
    int64_t lo = std::max<int64_t>(1, i - k);
    int64_t hi = std::min<int64_t>(m, i + k);
    std::fill(cur.begin(), cur.end(), INF);
    if (i - k <= 0) cur[k - i] = i;  // D[i][0] = i sits at offset j - i + k with j=0
    for (int64_t j = lo; j <= hi; ++j) {
      int64_t off = j - i + k;
      int64_t best = INF;
      // substitution / match from D[i-1][j-1] (same offset in prev)
      int64_t sub = prev[off] + (a[i - 1] == b[j - 1] ? 0 : 1);
      best = std::min(best, sub);
      // deletion from D[i-1][j] (offset + 1 in prev)
      if (off + 1 <= 2 * k) best = std::min(best, prev[off + 1] + 1);
      // insertion from D[i][j-1] (offset - 1 in cur)
      if (off - 1 >= 0) best = std::min(best, cur[off - 1] + 1);
      cur[off] = best;
    }
    std::swap(prev, cur);
  }
  int64_t off = m - n + k;
  return prev[off];
}

// Materialise the sequence of a node into buf.  Real (even) nodes are stored
// verbatim; virtual (odd) nodes are the reverse complement of their pair.
void node_slice(const char* blob, const int64_t* offsets, int64_t node,
                int64_t slice_start, int64_t slice_len, char* buf) {
  int64_t t = node >> 1;
  const char* base = blob + offsets[t];
  int64_t len = offsets[t + 1] - offsets[t];
  if ((node & 1) == 0) {
    std::memcpy(buf, base + slice_start, slice_len);
  } else {
    // virtual node char at position p == complement(base[len - 1 - p])
    for (int64_t p = 0; p < slice_len; ++p)
      buf[p] = complement(base[len - 1 - (slice_start + p)]);
  }
}

}  // namespace

extern "C" {

// Exact global edit distance (Ukkonen band doubling).  High-identity overlap
// pairs (the common case in assembly graphs) exit in the first narrow band;
// identical strings short-circuit entirely.
int64_t gn_edit_distance(const char* a, int64_t n, const char* b, int64_t m) {
  if (n == m && std::memcmp(a, b, n) == 0) return 0;
  int64_t k = std::max<int64_t>(std::llabs(n - m) + 8, 16);
  int64_t cap = std::max<int64_t>(std::max(n, m), 1);
  while (true) {
    int64_t d = banded_levenshtein(a, n, b, m, k);
    if (d <= k || k >= cap) return d;
    k = std::min(cap, k * 4);
  }
}

// Batch overlap edit distances for assembly-graph edges.
//   blob/offsets: packed real-strand read store (num_reads+1 offsets)
//   src/dst:      node ids per edge (virtual = odd = RC of node-1)
//   ol:           overlap length per edge; comparison is
//                 seq(src)[-ol:] vs seq(dst)[:ol]  (reference graph_parser.py:110)
//   out:          edit distance per edge (-1 where ol <= 0)
void gn_overlap_edit_distance_batch(const char* blob, const int64_t* offsets,
                                    const int32_t* src, const int32_t* dst,
                                    const int64_t* ol, int64_t n_edges,
                                    int32_t n_threads, int64_t* out) {
  if (n_threads < 1) n_threads = 1;
  auto worker = [&](int64_t tid) {
    std::vector<char> abuf, bbuf;
    for (int64_t e = tid; e < n_edges; e += n_threads) {
      int64_t L = ol[e];
      if (L <= 0) { out[e] = -1; continue; }
      int64_t s = src[e], d = dst[e];
      int64_t slen = offsets[(s >> 1) + 1] - offsets[s >> 1];
      int64_t dlen = offsets[(d >> 1) + 1] - offsets[d >> 1];
      // Python-slice semantics: seq[-L:] / seq[:L] clamp at the string ends
      // (reference graph_parser.py:110 relies on this when ol > read length).
      int64_t La = std::min(L, slen), Lb = std::min(L, dlen);
      abuf.resize(La); bbuf.resize(Lb);
      node_slice(blob, offsets, s, slen - La, La, abuf.data());
      node_slice(blob, offsets, d, 0, Lb, bbuf.data());
      out[e] = gn_edit_distance(abuf.data(), La, bbuf.data(), Lb);
    }
  };
  std::vector<std::thread> threads;
  for (int64_t t = 1; t < n_threads; ++t) threads.emplace_back(worker, t);
  worker(0);
  for (auto& th : threads) th.join();
}

// Greedy walk (reference inference.py:70-111 greedy_forwards /
// :114-157 greedy_backwards_rc run on the reversed CSR).
//
//   row_ptr/col/eid:   CSR adjacency (successors) with edge ids
//   log_probs:         per-edge log sigmoid scores
//   visited:           byte mask over nodes (1 = already used); NOT mutated
//   start:             starting node
//   out_walk:          buffer of capacity max_walk
//   returns            walk length; *sum_log_prob accumulates chosen edges
//
// Marks nodes of the walk (and their RC pairs) in local_visited (caller
// allocates + zeroes, reused across calls via epoch stamping).
// early_stop_threshold: if >= 0 is log(p_threshold) and the walk stops when
// every candidate's log-prob is below it (reference inference.py:98-100);
// pass NaN (or any value with use_early_stop=0) to disable.
int64_t gn_greedy_walk(const int64_t* row_ptr, const int32_t* col,
                       const int64_t* eid, const float* log_probs,
                       const uint8_t* visited, int32_t* stamp,
                       int32_t epoch, int64_t start, int64_t max_walk,
                       int32_t use_early_stop, float log_p_threshold,
                       int32_t* out_walk, double* sum_log_prob) {
  double slp = 0.0;
  int64_t len = 0;
  int64_t current = start;
  while (len < max_walk) {
    out_walk[len++] = (int32_t)current;
    stamp[current] = epoch;
    stamp[current ^ 1] = epoch;
    int64_t lo = row_ptr[current], hi = row_ptr[current + 1];
    if (hi == lo) break;
    if (hi - lo == 1) {
      int64_t nb = col[lo];
      if (visited[nb] || stamp[nb] == epoch) break;
      slp += log_probs[eid[lo]];
      current = nb;
      continue;
    }
    // argmax over unvisited successors (ties -> first, matching torch.topk)
    float best_p = 0.f;
    int64_t best_nb = -1, best_eid = -1;
    for (int64_t k = lo; k < hi; ++k) {
      int64_t nb = col[k];
      if (visited[nb] || stamp[nb] == epoch) continue;
      float p = log_probs[eid[k]];
      if (best_nb < 0 || p > best_p) { best_p = p; best_nb = nb; best_eid = eid[k]; }
    }
    if (best_nb < 0) break;
    if (use_early_stop && best_p < log_p_threshold) break;
    slp += log_probs[best_eid];
    current = best_nb;
  }
  *sum_log_prob = slp;
  return len;
}

// Batch of candidate walks in parallel (the reference runs its 100
// candidates strictly sequentially through a 1-worker pool,
// inference.py:231-243).  Each candidate c seeds from edge
// (seed_src[c], seed_dst[c]): forward walk from dst, backward walk from
// src^1, both over the successor CSR (reference run_greedy_both_ways,
// inference.py:160-164).  Threads use private stamp arrays; the shared
// ``visited`` mask is read-only.
//
//   out_walks:  [n_cand, max_walk] buffer; walk c = fwd walk then bwd walk
//   out_lens:   [n_cand, 2] = (fwd_len, bwd_len)
//   out_slp:    [n_cand, 2] = (sum_log_prob_fwd, sum_log_prob_bwd)
void gn_greedy_walk_batch(const int64_t* row_ptr, const int32_t* col,
                          const int64_t* eid, const float* log_probs,
                          const uint8_t* visited, int64_t n_nodes,
                          const int32_t* seed_src, const int32_t* seed_dst,
                          int64_t n_cand, int64_t max_walk,
                          int32_t use_early_stop, float log_p_threshold,
                          int32_t n_threads,
                          int32_t* out_walks, int64_t* out_lens,
                          double* out_slp) {
  if (n_threads < 1) n_threads = 1;
  auto worker = [&](int64_t tid) {
    std::vector<int32_t> stamp(n_nodes, 0);
    int32_t epoch = 0;
    for (int64_t c = tid; c < n_cand; c += n_threads) {
      ++epoch;
      int64_t s = seed_src[c], d = seed_dst[c];
      stamp[s] = epoch; stamp[s ^ 1] = epoch;
      stamp[d] = epoch; stamp[d ^ 1] = epoch;
      int32_t* buf = out_walks + c * max_walk;
      double slp_f = 0.0, slp_b = 0.0;
      int64_t len_f = gn_greedy_walk(row_ptr, col, eid, log_probs, visited,
                                     stamp.data(), epoch, d, max_walk,
                                     use_early_stop, log_p_threshold,
                                     buf, &slp_f);
      int64_t len_b = gn_greedy_walk(row_ptr, col, eid, log_probs, visited,
                                     stamp.data(), epoch, s ^ 1,
                                     max_walk - len_f, use_early_stop,
                                     log_p_threshold, buf + len_f, &slp_b);
      out_lens[2 * c] = len_f;
      out_lens[2 * c + 1] = len_b;
      out_slp[2 * c] = slp_f;
      out_slp[2 * c + 1] = slp_b;
    }
  };
  std::vector<std::thread> threads;
  for (int64_t t = 1; t < n_threads; ++t) threads.emplace_back(worker, t);
  worker(0);
  for (auto& th : threads) th.join();
}

// One full decode iteration (reference inference.py:231-306 candidate loop):
// walk every candidate seed edge in parallel, splice each backward walk onto
// its forward walk, score the spliced walk's contig length (sum of clamped
// prefix lengths along the walk + the last node's read length,
// inference.py:30-37), and return the FIRST candidate achieving the maximum
// contig length (the reference keeps the first strict improvement while
// scanning candidates in seed order).
//
// Compared to calling gn_greedy_walk_batch + gn_walk_edge_ids from Python,
// this removes the [n_cand, n_nodes] walk staging buffer (400 MB per
// iteration at 1M nodes) and ~n_cand ctypes round trips per iteration —
// per-candidate walks live in thread-local scratch and only the winner is
// copied out.
//
//   prefix_len: per-edge contig contribution, pre-clamped >= 0 by the caller
//   out_walk:   capacity >= n_nodes; receives the winning spliced walk
// Returns the winner's walk length (0 when every candidate is a self-loop
// seed), or -1-c when candidate c's spliced walk contains an edge missing
// from the CSR (the Python path raises KeyError; impossible for graphs with
// the RC-twin invariant).
int64_t gn_decode_round(const int64_t* row_ptr, const int32_t* col,
                        const int64_t* eid, const float* log_probs,
                        const int64_t* prefix_len, const int64_t* read_len,
                        const uint8_t* visited, int64_t n_nodes,
                        const int32_t* seed_src, const int32_t* seed_dst,
                        int64_t n_cand, int32_t use_early_stop,
                        float log_p_threshold, int32_t n_threads,
                        int32_t* out_walk, int64_t* out_contig_len,
                        double* out_slp) {
  if (n_threads < 1) n_threads = 1;
  if ((int64_t)n_threads > n_cand) n_threads = (int32_t)std::max<int64_t>(n_cand, 1);
  struct Best {
    int64_t clen = -1, cand = -1, len = 0;
    double slp = 0.0;
    std::vector<int32_t> walk;
  };
  std::vector<Best> bests(n_threads);
  std::vector<int64_t> errs(n_cand, 0);
  auto worker = [&](int64_t tid) {
    std::vector<int32_t> stamp(n_nodes, 0);
    std::vector<int32_t> fwd(n_nodes), spliced(n_nodes);
    int32_t epoch = 0;
    Best& best = bests[tid];
    for (int64_t c = tid; c < n_cand; c += n_threads) {
      int64_t s = seed_src[c], d = seed_dst[c];
      int64_t wlen = 0, clen = 0;
      double slp = 0.0;
      if (s != d) {  // self-loop seeds score 0 with an empty walk
        ++epoch;
        stamp[s] = epoch; stamp[s ^ 1] = epoch;
        stamp[d] = epoch; stamp[d ^ 1] = epoch;
        double slp_f = 0.0, slp_b = 0.0;
        int64_t len_f = gn_greedy_walk(row_ptr, col, eid, log_probs, visited,
                                       stamp.data(), epoch, d, n_nodes,
                                       use_early_stop, log_p_threshold,
                                       fwd.data(), &slp_f);
        int64_t len_b = gn_greedy_walk(row_ptr, col, eid, log_probs, visited,
                                       stamp.data(), epoch, s ^ 1,
                                       n_nodes - len_f, use_early_stop,
                                       log_p_threshold, fwd.data() + len_f,
                                       &slp_b);
        // splice: reversed-RC backward walk, then the forward walk
        for (int64_t i = 0; i < len_b; ++i)
          spliced[i] = fwd[len_f + len_b - 1 - i] ^ 1;
        std::memcpy(spliced.data() + len_b, fwd.data(),
                    (size_t)len_f * sizeof(int32_t));
        wlen = len_f + len_b;
        slp = slp_f + slp_b;
        bool bad = false;
        for (int64_t i = 0; i + 1 < wlen; ++i) {
          int64_t u = spliced[i], v = spliced[i + 1], found = -1;
          for (int64_t k = row_ptr[u]; k < row_ptr[u + 1]; ++k)
            if (col[k] == v) { found = eid[k]; break; }
          if (found < 0) { errs[c] = -1 - c; bad = true; break; }
          clen += prefix_len[found];
        }
        if (bad) continue;
        if (wlen > 0) clen += read_len[spliced[wlen - 1]];
      }
      if (clen > best.clen) {  // strict >: first max wins (ascending c)
        best.clen = clen; best.cand = c; best.len = wlen; best.slp = slp;
        best.walk.assign(spliced.begin(), spliced.begin() + wlen);
      }
    }
  };
  std::vector<std::thread> threads;
  for (int64_t t = 1; t < n_threads; ++t) threads.emplace_back(worker, t);
  worker(0);
  for (auto& th : threads) th.join();
  for (int64_t c = 0; c < n_cand; ++c)
    if (errs[c] < 0) return errs[c];       // earliest candidate's error
  const Best* win = nullptr;
  for (const auto& b : bests) {
    if (b.cand < 0) continue;
    if (!win || b.clen > win->clen ||
        (b.clen == win->clen && b.cand < win->cand))
      win = &b;
  }
  if (!win) { *out_contig_len = 0; *out_slp = 0.0; return 0; }
  std::memcpy(out_walk, win->walk.data(), (size_t)win->len * sizeof(int32_t));
  *out_contig_len = win->clen;
  *out_slp = win->slp;
  return win->len;
}

// Weighted categorical seed-edge sampling over the not-yet-visited subgraph
// in ONE pass over the edge list (reference inference.py:54-67; the numpy
// path materialises the eligible-id array and several O(E) float64
// temporaries per decode iteration).  Weight of an alive edge (both endpoints
// unvisited) is max(probs[e], 1e-9); sample i selects the first edge whose
// running cumulative weight exceeds uniforms[i] * total.  Block sums
// accumulate in fixed block order, so results are deterministic for fixed
// inputs regardless of n_threads.  Returns k, or 0 when no edge is alive.
int64_t gn_sample_seed_edges(const int32_t* src, const int32_t* dst,
                             const float* probs, const uint8_t* visited,
                             int64_t n_edges, const double* uniforms,
                             int64_t k, int32_t n_threads, int64_t* out) {
  if (n_threads < 1) n_threads = 1;
  const int64_t B = 1 << 10;   // small blocks: per-sample scan <= B edges
  const int64_t n_blocks = (n_edges + B - 1) / B;
  std::vector<double> bsum(n_blocks, 0.0);
  std::vector<int64_t> blast(n_blocks, -1);    // last alive edge per block
  auto weight = [&](int64_t e) -> double {
    if (visited[src[e]] || visited[dst[e]]) return 0.0;
    double w = (double)probs[e];
    return w > 1e-9 ? w : 1e-9;
  };
  auto bworker = [&](int64_t tid) {
    for (int64_t b = tid; b < n_blocks; b += n_threads) {
      double acc = 0.0;
      int64_t last = -1;
      const int64_t hi = std::min(n_edges, (b + 1) * B);
      for (int64_t e = b * B; e < hi; ++e) {
        double w = weight(e);
        acc += w;
        if (w > 0.0) last = e;
      }
      bsum[b] = acc;
      blast[b] = last;
    }
  };
  {
    std::vector<std::thread> threads;
    for (int64_t t = 1; t < n_threads; ++t) threads.emplace_back(bworker, t);
    bworker(0);
    for (auto& th : threads) th.join();
  }
  std::vector<double> bpre(n_blocks + 1, 0.0);  // exclusive block prefix
  int64_t last_alive = -1;
  for (int64_t b = 0; b < n_blocks; ++b) {
    bpre[b + 1] = bpre[b] + bsum[b];
    if (blast[b] >= 0) last_alive = blast[b];
  }
  const double total = bpre[n_blocks];
  if (last_alive < 0 || total <= 0.0) return 0;
  for (int64_t i = 0; i < k; ++i) {
    const double target = uniforms[i] * total;
    int64_t lo = 0, hi = n_blocks;               // largest b: bpre[b] <= target
    while (lo + 1 < hi) {
      int64_t mid = (lo + hi) / 2;
      if (bpre[mid] <= target) lo = mid; else hi = mid;
    }
    double cum = bpre[lo];
    int64_t pick = -1;
    for (int64_t e = lo * B; e < n_edges; ++e) {
      double w = weight(e);
      cum += w;
      if (w > 0.0 && cum > target) { pick = e; break; }
    }
    out[i] = pick >= 0 ? pick : last_alive;      // rounding fallback
  }
  return k;
}

// Mark a decoded walk (and RC pairs) visited and absorb transitively
// jumped-over nodes: for each consecutive (u, v) of the walk, every node in
// succ(u) ∩ pred(v) and its RC pair is marked (reference inference.py:
// 316-322; the numpy path runs one intersect1d per walk edge).
void gn_absorb_walk(const int64_t* csr_ptr, const int32_t* csr_col,
                    const int64_t* csc_ptr, const int32_t* csc_row,
                    const int32_t* walk, int64_t walk_len, uint8_t* visited) {
  for (int64_t i = 0; i < walk_len; ++i) {
    visited[walk[i]] = 1;
    visited[walk[i] ^ 1] = 1;
  }
  for (int64_t i = 0; i + 1 < walk_len; ++i) {
    const int64_t u = walk[i], v = walk[i + 1];
    for (int64_t a = csr_ptr[u]; a < csr_ptr[u + 1]; ++a) {
      const int32_t su = csr_col[a];
      for (int64_t b = csc_ptr[v]; b < csc_ptr[v + 1]; ++b) {
        if (csc_row[b] == su) {
          visited[su] = 1;
          visited[su ^ 1] = 1;
          break;
        }
      }
    }
  }
}

// Edge ids along a walk: out_eids[i] = id of edge walk[i] -> walk[i+1]
// (first match in the CSR row).  Returns number of ids written, or the
// negated position (-1-i) of the first missing edge.
int64_t gn_walk_edge_ids(const int64_t* row_ptr, const int32_t* col,
                         const int64_t* eid, const int32_t* walk,
                         int64_t walk_len, int64_t* out_eids) {
  for (int64_t i = 0; i + 1 < walk_len; ++i) {
    int64_t u = walk[i], v = walk[i + 1];
    int64_t found = -1;
    for (int64_t k = row_ptr[u]; k < row_ptr[u + 1]; ++k) {
      if (col[k] == v) { found = eid[k]; break; }
    }
    if (found < 0) return -1 - i;
    out_eids[i] = found;
  }
  return walk_len - 1;
}

}  // extern "C"
