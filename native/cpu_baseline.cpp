// Measured single-CPU-thread baseline for bench.py's vs_baseline denominator.
//
// A faithful re-implementation of the reference's query path SEMANTICS
// (/root/reference/IndexIVF_HNSW.cpp:234-296 — graph coarse quantizer ->
// per-query inner-product LUT -> 3-term ADC scan with a size-k max-heap and
// the probe-granular max_codes early exit), written from scratch for this
// repo (own data layout, own graph construction). It exists because the
// reference binary itself cannot be built here (its faiss submodule is
// empty), and the bench must divide by a MEASURED number, not an estimate.
//
// Coarse quantizer: the reference uses a level0-only HNSW graph
// (hnswalg.cpp:48-109, greedy best-first with ef candidates over an M=16
// graph). We build an exact kNN graph over the centroids (one-time,
// brute force) and run the same greedy best-first search with a visited
// epoch array — the same per-query cost profile (ef beam, ~M neighbor
// distance evaluations per expansion) without porting hnswlib.
//
// Input: a single blob written by bench.py (see read_blob below).
// Output: one line "us_per_query=<float>" on stdout + labels file for
// recall cross-checking.

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct Blob {
  int32_t d, nc, M, ksub, nq, nprobe, max_codes, k, ef;
  int64_t ntotal;
  std::vector<float> centroids;   // [nc, d]
  std::vector<float> codebooks;   // [M, ksub, dsub]
  std::vector<float> norm_table;  // [ksub]
  std::vector<uint8_t> codes;     // [ntotal, M]
  std::vector<uint8_t> norm_codes;  // [ntotal]
  std::vector<int32_t> ids;       // [ntotal]
  std::vector<int64_t> offsets;   // [nc+1]
  std::vector<float> queries;     // [nq, d]
};

template <typename T>
void read_vec(FILE* f, std::vector<T>* v, size_t n) {
  v->resize(n);
  if (fread(v->data(), sizeof(T), n, f) != n) {
    fprintf(stderr, "short read\n");
    exit(1);
  }
}

Blob read_blob(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
  Blob b;
  int32_t magic;
  if (fread(&magic, 4, 1, f) != 1 || magic != 0x49564241) {
    fprintf(stderr, "bad magic\n"); exit(1);
  }
  int32_t hdr[9];
  if (fread(hdr, 4, 9, f) != 9) { fprintf(stderr, "bad hdr\n"); exit(1); }
  b.d = hdr[0]; b.nc = hdr[1]; b.M = hdr[2]; b.ksub = hdr[3];
  b.nq = hdr[4]; b.nprobe = hdr[5]; b.max_codes = hdr[6]; b.k = hdr[7];
  b.ef = hdr[8];
  if (fread(&b.ntotal, 8, 1, f) != 1) { exit(1); }
  read_vec(f, &b.centroids, (size_t)b.nc * b.d);
  read_vec(f, &b.codebooks, (size_t)b.M * b.ksub * (b.d / b.M));
  read_vec(f, &b.norm_table, (size_t)b.ksub);
  read_vec(f, &b.codes, (size_t)b.ntotal * b.M);
  read_vec(f, &b.norm_codes, (size_t)b.ntotal);
  read_vec(f, &b.ids, (size_t)b.ntotal);
  read_vec(f, &b.offsets, (size_t)b.nc + 1);
  read_vec(f, &b.queries, (size_t)b.nq * b.d);
  fclose(f);
  return b;
}

inline float l2sqr(const float* a, const float* b, int d) {
  float s = 0.f;
  for (int i = 0; i < d; ++i) {
    float t = a[i] - b[i];
    s += t * t;
  }
  return s;
}

// Navigable graph over the centroids: exact candidate pools diversified
// with the standard relative-neighborhood heuristic (keep a candidate only
// if it is closer to the node than to every already-kept neighbor — the
// rule hnswlib's getNeighborsByHeuristic implements), plus capped reverse
// edges. A plain kNN graph is NOT greedily navigable (clusters disconnect);
// diversified edges restore the reference quantizer's search quality.
// One-time build cost, excluded from the timed query loop (the reference
// likewise builds/loads its graph outside the search timing).
std::vector<int32_t> build_nav_graph(const Blob& b, int deg, int* out_deg) {
  const int maxdeg = 2 * deg;  // reference level0 maxM = 2*M
  const int pool = 4 * maxdeg;
  std::vector<std::vector<int32_t>> adj(b.nc);
  std::vector<std::pair<float, int32_t>> cand(b.nc);
  for (int i = 0; i < b.nc; ++i) {
    const float* ci = &b.centroids[(size_t)i * b.d];
    for (int j = 0; j < b.nc; ++j) {
      cand[j] = {j == i ? 1e30f : l2sqr(ci, &b.centroids[(size_t)j * b.d], b.d),
                 j};
    }
    int npool = std::min(pool, b.nc - 1);
    std::partial_sort(cand.begin(), cand.begin() + npool, cand.end());
    auto& kept = adj[i];
    for (int j = 0; j < npool && (int)kept.size() < deg; ++j) {
      const float* cj = &b.centroids[(size_t)cand[j].second * b.d];
      bool ok = true;
      for (int32_t kn : kept) {
        if (l2sqr(cj, &b.centroids[(size_t)kn * b.d], b.d) <
            cand[j].first) {
          ok = false;
          break;
        }
      }
      if (ok) kept.push_back(cand[j].second);
    }
  }
  // Reverse edges, capped at maxdeg (weakest-edge style: just cap).
  for (int i = 0; i < b.nc; ++i) {
    for (int32_t j : std::vector<int32_t>(adj[i])) {
      auto& aj = adj[j];
      if ((int)aj.size() < maxdeg &&
          std::find(aj.begin(), aj.end(), i) == aj.end()) {
        aj.push_back(i);
      }
    }
  }
  std::vector<int32_t> graph((size_t)b.nc * maxdeg, -1);
  for (int i = 0; i < b.nc; ++i)
    std::copy(adj[i].begin(), adj[i].end(), &graph[(size_t)i * maxdeg]);
  *out_deg = maxdeg;
  return graph;
}

// Greedy best-first beam search over the kNN graph (the level0 HNSW search
// pattern): min-heap of candidates, bounded max-heap of ef results,
// visited epochs. Returns the nprobe nearest (dist, centroid) ascending.
struct Coarse {
  const Blob& b;
  const std::vector<int32_t>& graph;
  int deg;
  std::vector<uint32_t> visited;
  uint32_t epoch = 0;

  Coarse(const Blob& bb, const std::vector<int32_t>& g, int dg)
      : b(bb), graph(g), deg(dg), visited(bb.nc, 0) {}

  void search(const float* q, int nprobe, int ef,
              std::vector<std::pair<float, int32_t>>* out) {
    ++epoch;
    using P = std::pair<float, int32_t>;
    std::priority_queue<P, std::vector<P>, std::greater<P>> candidates;
    std::priority_queue<P> results;  // max-heap: worst of the ef best on top
    float d0 = l2sqr(q, &b.centroids[0], b.d);
    candidates.push({d0, 0});
    results.push({d0, 0});
    visited[0] = epoch;
    while (!candidates.empty()) {
      auto [dist, node] = candidates.top();
      if (dist > results.top().first && (int)results.size() >= ef) break;
      candidates.pop();
      const int32_t* nbrs = &graph[(size_t)node * deg];
      for (int j = 0; j < deg; ++j) {
        int32_t n = nbrs[j];
        if (n < 0) break;
        if (visited[n] == epoch) continue;
        visited[n] = epoch;
        float dn = l2sqr(q, &b.centroids[(size_t)n * b.d], b.d);
        if ((int)results.size() < ef || dn < results.top().first) {
          candidates.push({dn, n});
          results.push({dn, n});
          if ((int)results.size() > ef) results.pop();
        }
      }
    }
    out->clear();
    while (!results.empty()) {
      out->push_back(results.top());
      results.pop();
    }
    std::sort(out->begin(), out->end());
    if ((int)out->size() > nprobe) out->resize(nprobe);
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: cpu_baseline <blob> <labels_out> [deg]\n");
    return 1;
  }
  Blob b = read_blob(argv[1]);
  const int m_graph = argc > 3 ? atoi(argv[3]) : 16;
  const int dsub = b.d / b.M;

  fprintf(stderr, "building centroid nav graph (nc=%d, M=%d)...\n", b.nc,
          m_graph);
  int deg = 0;
  auto graph = build_nav_graph(b, m_graph, &deg);
  std::vector<float> cnorms(b.nc);
  for (int c = 0; c < b.nc; ++c) {
    const float* p = &b.centroids[(size_t)c * b.d];
    float s = 0.f;
    for (int i = 0; i < b.d; ++i) s += p[i] * p[i];
    cnorms[c] = s;
  }

  Coarse coarse(b, graph, deg);
  std::vector<std::pair<float, int32_t>> probes;
  std::vector<float> lut((size_t)b.M * b.ksub);
  std::vector<int64_t> labels((size_t)b.nq * b.k);
  std::vector<std::pair<float, int64_t>> heap;  // max-heap by dist

  fprintf(stderr, "timed query loop (nq=%d, nprobe=%d, max_codes=%d, "
          "ef=%d)...\n", b.nq, b.nprobe, b.max_codes, b.ef);
  auto t0 = std::chrono::steady_clock::now();
  for (int qi = 0; qi < b.nq; ++qi) {
    const float* q = &b.queries[(size_t)qi * b.d];
    // 1. coarse (graph beam, reference hnswalg.cpp:48-109 cost profile)
    coarse.search(q, b.nprobe, b.ef, &probes);
    // 2. per-query LUT (compute_inner_prod_table, IndexIVF_HNSW.cpp:262)
    for (int m = 0; m < b.M; ++m) {
      const float* qs = q + m * dsub;
      const float* cb = &b.codebooks[(size_t)m * b.ksub * dsub];
      float* t = &lut[(size_t)m * b.ksub];
      for (int kk = 0; kk < b.ksub; ++kk) {
        float s = 0.f;
        const float* cbe = cb + (size_t)kk * dsub;
        for (int i = 0; i < dsub; ++i) s += qs[i] * cbe[i];
        t[kk] = s;
      }
    }
    // 3. ADC scan with size-k max-heap + max_codes budget
    //    (IndexIVF_HNSW.cpp:268-293)
    heap.clear();
    int64_t ncode = 0;
    for (auto& [qc_dist, c] : probes) {
      float term1 = qc_dist - cnorms[c];
      int64_t lo = b.offsets[c], hi = b.offsets[c + 1];
      for (int64_t j = lo; j < hi; ++j) {
        const uint8_t* code = &b.codes[(size_t)j * b.M];
        // 4-way unrolled LUT accumulation (pq_L2sqr,
        // IndexIVF_HNSW.cpp:802-814)
        float t3 = 0.f;
        for (int m = 0; m < b.M; m += 4) {
          t3 += lut[(size_t)m * b.ksub + code[m]] +
                lut[(size_t)(m + 1) * b.ksub + code[m + 1]] +
                lut[(size_t)(m + 2) * b.ksub + code[m + 2]] +
                lut[(size_t)(m + 3) * b.ksub + code[m + 3]];
        }
        float dist = term1 + b.norm_table[b.norm_codes[j]] - 2.f * t3;
        if ((int)heap.size() < b.k) {
          heap.push_back({dist, b.ids[j]});
          std::push_heap(heap.begin(), heap.end());
        } else if (dist < heap.front().first) {
          std::pop_heap(heap.begin(), heap.end());
          heap.back() = {dist, b.ids[j]};
          std::push_heap(heap.begin(), heap.end());
        }
      }
      ncode += hi - lo;
      if (b.max_codes > 0 && ncode >= b.max_codes) break;
    }
    std::sort_heap(heap.begin(), heap.end());
    for (int kk = 0; kk < b.k; ++kk)
      labels[(size_t)qi * b.k + kk] =
          kk < (int)heap.size() ? heap[kk].second : -1;
  }
  auto t1 = std::chrono::steady_clock::now();
  double us =
      std::chrono::duration_cast<std::chrono::microseconds>(t1 - t0).count();

  FILE* out = fopen(argv[2], "wb");
  fwrite(labels.data(), 8, labels.size(), out);
  fclose(out);
  printf("us_per_query=%.3f\n", us / b.nq);
  return 0;
}
