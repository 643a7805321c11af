// Native host-side hot loops for spmv_acc_tpu.
//
// The reference implements its ingest and analyze passes in C++ with OpenMP
// (cli/csr_mtx_reader.hpp:116-162 OMP number parsing; cli/sort_omp.hpp:12-62
// task-parallel quicksort; csr_adaptive_plus_analyze.cpp:12-98 block analyze).
// This library is the TPU build's equivalent: exported as a C ABI consumed via
// ctypes (io/native.py), with pure-numpy fallbacks when the .so is absent.
//
// Build: make -C native   (g++ -O3 -march=native -fopenmp -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Parallel text-number parsing (csr_mtx_reader.hpp fast_parse_vector analog).
// Parses whitespace-separated doubles from buf[0..len) into out (capacity cap).
// Returns the number parsed, or -1 on overflow.
// ---------------------------------------------------------------------------
int64_t parse_doubles(const char* buf, int64_t len, double* out, int64_t cap,
                      int32_t num_threads) {
  if (num_threads <= 1) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t n = 0;
    while (p < end) {
      while (p < end && isspace((unsigned char)*p)) ++p;
      if (p >= end) break;
      char* q;
      double v = strtod(p, &q);
      if (q == p) { ++p; continue; }
      if (n >= cap) return -1;
      out[n++] = v;
      p = q;
    }
    return n;
  }
  // parallel: split at whitespace boundaries
  int T = num_threads;
  std::vector<std::pair<const char*, const char*>> ranges(T);
  int64_t chunk = len / T;
  const char* start = buf;
  for (int t = 0; t < T; ++t) {
    const char* e = (t == T - 1) ? buf + len : buf + (t + 1) * chunk;
    // advance e to the next whitespace so tokens are not split
    while (e < buf + len && !isspace((unsigned char)*e)) ++e;
    ranges[t] = {start, e};
    start = e;
  }
  std::vector<std::vector<double>> partial(T);
  std::vector<std::thread> threads;
  for (int t = 0; t < T; ++t) {
    threads.emplace_back([&, t]() {
      const char* p = ranges[t].first;
      const char* end = ranges[t].second;
      auto& o = partial[t];
      o.reserve((end - p) / 4);
      while (p < end) {
        while (p < end && isspace((unsigned char)*p)) ++p;
        if (p >= end) break;
        char* q;
        double v = strtod(p, &q);
        if (q == p) { ++p; continue; }
        o.push_back(v);
        p = q;
      }
    });
  }
  for (auto& th : threads) th.join();
  int64_t n = 0;
  for (int t = 0; t < T; ++t) {
    if (n + (int64_t)partial[t].size() > cap) return -1;
    memcpy(out + n, partial[t].data(), partial[t].size() * sizeof(double));
    n += partial[t].size();
  }
  return n;
}

// ---------------------------------------------------------------------------
// COO -> CSR: counting sort by row then stable order by column within rows
// (cli/sparse_format.h:100-128 + sort_omp.hpp analog; O(nnz + m) instead of
// a comparison sort when input columns are appended in file order).
// ---------------------------------------------------------------------------
int32_t coo_to_csr(const int32_t* rows, const int32_t* cols, const double* vals,
                   int64_t nnz, int32_t m,
                   int32_t* row_ptr /* m+1 */, int32_t* out_cols,
                   double* out_vals) {
  std::vector<int64_t> count(m + 1, 0);
  for (int64_t i = 0; i < nnz; ++i) {
    int32_t r = rows[i];
    if (r < 0 || r >= m) return -1;
    count[r + 1]++;
  }
  for (int32_t r = 0; r < m; ++r) count[r + 1] += count[r];
  // place by row (stable)
  std::vector<int64_t> cursor(count.begin(), count.end() - 1);
  std::vector<int64_t> perm(nnz);
  for (int64_t i = 0; i < nnz; ++i) perm[cursor[rows[i]]++] = i;
  // sort within each row by column (rows are usually short: insertion-friendly)
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 1024)
#endif
  for (int32_t r = 0; r < m; ++r) {
    int64_t a = count[r], b = count[r + 1];
    std::sort(perm.begin() + a, perm.begin() + b,
              [&](int64_t i, int64_t j) { return cols[i] < cols[j]; });
  }
  for (int32_t r = 0; r <= m; ++r) row_ptr[r] = (int32_t)count[r];
  for (int64_t k = 0; k < nnz; ++k) {
    out_cols[k] = cols[perm[k]];
    out_vals[k] = vals[perm[k]];
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Tile-plan analyze (csr_adaptive_plus_analyze.cpp:12-98 analog): for the
// (128-row x 128-col)-window decomposition, compute for every element its
// block id and slot, and per-block max depth.  Single O(nnz) scan per row.
// Outputs:
//   elem_block: (nnz) int64 block key rb*nct + ct
//   elem_slot:  (nnz) int32 position within its (row, window) run
//   n_blocks:   number of distinct blocks (return value)
//   block_keys: (<= nnz) int64 sorted distinct block keys
//   block_depth:(<= nnz) int32 max run length per block
// ---------------------------------------------------------------------------
int64_t tile_analyze(const int32_t* row_ptr, const int32_t* col_idx, int32_t m,
                     int32_t nct, int64_t* elem_block, int32_t* elem_slot,
                     int64_t* block_keys, int32_t* block_depth) {
  // pass 1: per-element block + slot (rows are col-sorted so runs are contiguous)
  for (int32_t r = 0; r < m; ++r) {
    int64_t rb = r >> 7;
    int32_t prev_ct = -1, slot = 0;
    for (int32_t p = row_ptr[r]; p < row_ptr[r + 1]; ++p) {
      int32_t ct = col_idx[p] >> 7;
      slot = (ct == prev_ct) ? slot + 1 : 0;
      prev_ct = ct;
      elem_block[p] = rb * nct + ct;
      elem_slot[p] = slot;
    }
  }
  int64_t nnz = row_ptr[m];
  if (nnz == 0) return 0;
  // pass 2: distinct blocks + max depth.  Blocks are NOT globally sorted in
  // element order (rows interleave windows), so sort a copy of the keys with the
  // depth (slot+1) attached.
  std::vector<std::pair<int64_t, int32_t>> kv(nnz);
  for (int64_t i = 0; i < nnz; ++i) kv[i] = {elem_block[i], elem_slot[i] + 1};
  std::sort(kv.begin(), kv.end());
  int64_t nb = 0;
  for (int64_t i = 0; i < nnz; ++i) {
    if (nb == 0 || kv[i].first != block_keys[nb - 1]) {
      block_keys[nb] = kv[i].first;
      block_depth[nb] = kv[i].second;
      ++nb;
    } else if (kv[i].second > block_depth[nb - 1]) {
      block_depth[nb - 1] = kv[i].second;
    }
  }
  return nb;
}

// Version marker for the ctypes loader.
int32_t spmv_native_abi_version() { return 1; }

}  // extern "C"
