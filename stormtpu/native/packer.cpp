// Native host-side ingest kernels.
//
// The reference's native tier is C with x86 SIMD (SURVEY.md §3: the whole
// library is C99 compiled with AVX2/AVX-512 intrinsics). On TPU the device
// compute tier is Pallas/Mosaic, but the *host* ingest path — packing
// set-bit positions / dense 0/1 bytes into uint32 words, row popcounts,
// CSR extraction (the reference's STORM_add / container-build loops,
// SURVEY.md §4.1) — stays on the CPU and is hot for large matrices
// (NumPy's np.bitwise_or.at is an unbuffered ufunc and orders of magnitude
// slower). This file is that ingest path, exposed via ctypes
// (stormtpu/native/__init__.py) with a NumPy fallback when unbuilt.
//
// Build: make -C stormtpu/native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// Scatter-OR COO set-bit coordinates into packed words.
// rows/pos: int64[nnz]; out: uint32[n*w] zero-initialised by caller.
// Returns 0 on success, 1 on out-of-range input (out left partially
// written; caller discards).
int stpu_pack_positions(const int64_t* rows, const int64_t* pos,
                        int64_t nnz, uint32_t* out, int64_t n,
                        int64_t m_bits, int64_t w) {
  for (int64_t k = 0; k < nnz; ++k) {
    const int64_t r = rows[k];
    const int64_t p = pos[k];
    if (r < 0 || r >= n || p < 0 || p >= m_bits) return 1;
    out[r * w + (p >> 5)] |= (uint32_t{1} << (p & 31));
  }
  return 0;
}

// Pack a dense 0/1 byte matrix [n, m] into uint32 words [n, w], LSB-first.
// Any nonzero byte counts as a set bit.
void stpu_pack_bits(const uint8_t* dense, int64_t n, int64_t m,
                    uint32_t* out, int64_t w) {
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* row = dense + i * m;
    uint32_t* orow = out + i * w;
    int64_t j = 0;
    for (; j + 32 <= m; j += 32) {
      uint32_t word = 0;
      for (int b = 0; b < 32; ++b) word |= (uint32_t)(row[j + b] != 0) << b;
      orow[j >> 5] = word;
    }
    if (j < m) {
      uint32_t word = 0;
      for (int64_t b = 0; j + b < m; ++b)
        word |= (uint32_t)(row[j + b] != 0) << b;
      orow[j >> 5] = word;
    }
  }
}

// Unpack packed words back to a dense 0/1 byte matrix.
void stpu_unpack_bits(const uint32_t* packed, int64_t n, int64_t w,
                      uint8_t* dense, int64_t m) {
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t* prow = packed + i * w;
    uint8_t* drow = dense + i * m;
    for (int64_t p = 0; p < m; ++p)
      drow[p] = (uint8_t)((prow[p >> 5] >> (p & 31)) & 1u);
  }
}

// Per-row set-bit counts.
void stpu_row_popcounts(const uint32_t* packed, int64_t n, int64_t w,
                        int64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t* row = packed + i * w;
    int64_t acc = 0;
    for (int64_t j = 0; j < w; ++j) acc += __builtin_popcount(row[j]);
    out[i] = acc;
  }
}

// CSR extraction: sorted set-bit positions per row.
// Pass 1 (indices == nullptr): fill indptr[n+1] with row nnz prefix sums.
// Pass 2: fill indices[nnz] (int32 positions), indptr already computed.
void stpu_positions_csr(const uint32_t* packed, int64_t n, int64_t w,
                        int64_t m_bits, int64_t* indptr, int32_t* indices) {
  if (indices == nullptr) {
    indptr[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
      const uint32_t* row = packed + i * w;
      int64_t acc = 0;
      for (int64_t j = 0; j < w; ++j) acc += __builtin_popcount(row[j]);
      indptr[i + 1] = indptr[i] + acc;
    }
    return;
  }
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t* row = packed + i * w;
    int32_t* out = indices + indptr[i];
    for (int64_t j = 0; j < w; ++j) {
      uint32_t word = row[j];
      const int32_t base = (int32_t)(j << 5);
      while (word) {
        const int b = __builtin_ctz(word);
        *out++ = base + b;
        word &= word - 1;
      }
    }
  }
}

// Reference-semantics scalar pairwise count (host oracle / cross-check):
// exact popcount(a AND b) over two packed rows.
int64_t stpu_pair_count(const uint32_t* a, const uint32_t* b, int64_t w) {
  int64_t acc = 0;
  for (int64_t j = 0; j < w; ++j) acc += __builtin_popcount(a[j] & b[j]);
  return acc;
}

// K4 from the packed matrix directly (no CSR detour): pass 1 counts
// column occupancy, pass 2 buckets row ids per column, then emission as
// in stpu_sparse_outer_counts. Two streaming scans of the packed words
// instead of materializing position lists. Output layout identical
// (upper triangle + diagonal; caller mirrors).
int stpu_sparse_outer_from_packed(const uint32_t* packed, int64_t n,
                                  int64_t w, int64_t m_bits, int32_t* c) {
  const int64_t m_words = w;
  int64_t* col_ptr = new int64_t[m_bits + 1]();
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t* row = packed + i * m_words;
    for (int64_t j = 0; j < m_words; ++j) {
      uint32_t word = row[j];
      const int64_t base = j << 5;
      while (word) {
        const int b = __builtin_ctz(word);
        const int64_t p = base + b;
        if (p >= m_bits) {
          delete[] col_ptr;
          return 1;
        }
        col_ptr[p + 1]++;
        word &= word - 1;
      }
    }
  }
  int64_t nnz = 0;
  for (int64_t p = 0; p < m_bits; ++p) {
    nnz += col_ptr[p + 1];
    col_ptr[p + 1] += col_ptr[p];
  }
  int32_t* col_rows = new int32_t[nnz > 0 ? nnz : 1];
  int64_t* cursor = new int64_t[m_bits];
  std::memcpy(cursor, col_ptr, m_bits * sizeof(int64_t));
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t* row = packed + i * m_words;
    for (int64_t j = 0; j < m_words; ++j) {
      uint32_t word = row[j];
      const int64_t base = j << 5;
      while (word) {
        const int b = __builtin_ctz(word);
        col_rows[cursor[base + b]++] = (int32_t)i;
        word &= word - 1;
      }
    }
  }
  for (int64_t p = 0; p < m_bits; ++p) {
    const int64_t s = col_ptr[p], e = col_ptr[p + 1];
    for (int64_t x = s; x < e; ++x) {
      int32_t* crow = c + (int64_t)col_rows[x] * n;
      crow[col_rows[x]]++;
      for (int64_t y = x + 1; y < e; ++y) crow[col_rows[y]]++;
    }
  }
  delete[] cursor;
  delete[] col_rows;
  delete[] col_ptr;
  return 0;
}

// K4 from column-sorted deduplicated COO: walk runs of equal column id,
// emit all ordered row pairs per run (rows ascend within a run, so
// emitted pairs have a < b). O(nnz + E) with NO M-sized arrays — the
// caller produces the order with one np.unique over col-major keys.
void stpu_sparse_outer_runs(const int64_t* col_ids, const int32_t* rows,
                            int64_t nnz, int64_t n, int32_t* c) {
  int64_t s = 0;
  while (s < nnz) {
    int64_t e = s + 1;
    const int64_t col = col_ids[s];
    while (e < nnz && col_ids[e] == col) ++e;
    for (int64_t x = s; x < e; ++x) {
      int32_t* crow = c + (int64_t)rows[x] * n;
      crow[rows[x]]++;
      for (int64_t y = x + 1; y < e; ++y) crow[rows[y]]++;
    }
    s = e;
  }
}

// K4 cross-stripe (per-superblock streaming form): two column-sorted
// (col, LOCAL-row) lists — superblock I's sub-COO and superblock J's —
// merge-walk the common columns and emit every (a, b) pair into the
// na×nb stripe buffer c[a*nb + b]. Buffers are superblock², never N²:
// this is what lifts K4's N<=32768 single-shot ceiling (VERDICT r2
// missing #3) — the emission itself is unchanged scatter-shaped host
// work, just stripe-local.
void stpu_sparse_outer_runs_cross(const int64_t* cols_a,
                                  const int32_t* rows_a, int64_t nnz_a,
                                  const int64_t* cols_b,
                                  const int32_t* rows_b, int64_t nnz_b,
                                  int64_t nb, int32_t* c) {
  int64_t x = 0, y = 0;
  while (x < nnz_a && y < nnz_b) {
    const int64_t ca = cols_a[x], cb = cols_b[y];
    if (ca < cb) { ++x; continue; }
    if (cb < ca) { ++y; continue; }
    int64_t xe = x + 1;
    while (xe < nnz_a && cols_a[xe] == ca) ++xe;
    int64_t ye = y + 1;
    while (ye < nnz_b && cols_b[ye] == ca) ++ye;
    for (int64_t i = x; i < xe; ++i) {
      int32_t* crow = c + (int64_t)rows_a[i] * nb;
      for (int64_t j = y; j < ye; ++j) crow[rows_b[j]]++;
    }
    x = xe;
    y = ye;
  }
}

// Mirror the strict upper triangle into the lower (c[j,i] = c[i,j]),
// cache-blocked (the naive transposed write pattern is ~10× slower at
// n² ≳ 10⁸). Diagonal untouched.
void stpu_mirror_upper(int32_t* c, int64_t n) {
  constexpr int64_t B = 64;
  for (int64_t ib = 0; ib < n; ib += B) {
    const int64_t imax = ib + B < n ? ib + B : n;
    for (int64_t jb = ib; jb < n; jb += B) {
      const int64_t jmax = jb + B < n ? jb + B : n;
      for (int64_t i = ib; i < imax; ++i) {
        const int64_t j0 = (jb > i + 1) ? jb : i + 1;
        for (int64_t j = j0; j < jmax; ++j) c[j * n + i] = c[i * n + j];
      }
    }
  }
}

}  // extern "C"
