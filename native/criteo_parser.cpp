// Native Criteo TSV parser: multithreaded parse + hash + encode in one pass.
//
// The Python loader (recman_tpu/data/criteo.py load_criteo_tsv) goes
// file -> pandas object arrays -> pandas siphash -> numpy; at full-Criteo
// scale (~45 GB, 4.4B rows) the object-array materialization dominates
// (NOTES.md round-2 lead 6). This parser streams bytes straight to the
// final encoded arrays the trainer consumes:
//
//   label \t I1..I13 \t C1..C26\n   per line (fields may be empty)
//   -> y float32; I* float32 log1p(max(v,0)); C* int32 hashed ids
//
// Categorical hashing REPRODUCES the Python path bit-for-bit
// (features/encoders.py hash_bucket -> pd.util.hash_array): SipHash-2-4 of
// the UTF-8 bytes with pandas' fixed key "0123456789123456", a splitmix64
// finalizer, then % num_buckets + 1 (0 reserved for missing).
//
// Threading: the file is split at newline boundaries into one span per
// thread; each thread writes disjoint row ranges of the caller-allocated
// output buffers, so there is no synchronization in the hot loop.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image):
//   criteo_count_rows(path, max_rows) -> int64 (rows; -1 on open error)
//   criteo_parse(path, n_rows, num_buckets, n_threads,
//                y, dense, cats) -> rows parsed (-1 on open error)
//     y:     float32[n_rows]
//     dense: float32[n_rows * 13]   row-major
//     cats:  int32  [n_rows * 26]   row-major
//
// Build: g++ -O3 -shared -fPIC -pthread -o libcriteo_parser.so criteo_parser.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int kNumDense = 13;
constexpr int kNumCat = 26;

// ---------------- SipHash-2-4 (pandas' fixed key) + splitmix64 ------------

inline uint64_t rotl64(uint64_t x, int b) { return (x << b) | (x >> (64 - b)); }

inline void sipround(uint64_t& v0, uint64_t& v1, uint64_t& v2, uint64_t& v3) {
  v0 += v1; v1 = rotl64(v1, 13); v1 ^= v0; v0 = rotl64(v0, 32);
  v2 += v3; v3 = rotl64(v3, 16); v3 ^= v2;
  v0 += v3; v3 = rotl64(v3, 21); v3 ^= v0;
  v2 += v1; v1 = rotl64(v1, 17); v1 ^= v2; v2 = rotl64(v2, 32);
}

inline uint64_t load_le64(const unsigned char* p, size_t n) {
  uint64_t m = 0;
  for (size_t i = 0; i < n; ++i) m |= static_cast<uint64_t>(p[i]) << (8 * i);
  return m;
}

uint64_t siphash24(const unsigned char* data, size_t len) {
  // key = "0123456789123456" little-endian halves (pandas _default_hash_key)
  const uint64_t k0 = load_le64(
      reinterpret_cast<const unsigned char*>("01234567"), 8);
  const uint64_t k1 = load_le64(
      reinterpret_cast<const unsigned char*>("89123456"), 8);
  uint64_t v0 = 0x736f6d6570736575ULL ^ k0;
  uint64_t v1 = 0x646f72616e646f6dULL ^ k1;
  uint64_t v2 = 0x6c7967656e657261ULL ^ k0;
  uint64_t v3 = 0x7465646279746573ULL ^ k1;
  size_t i = 0;
  for (; i + 8 <= len; i += 8) {
    uint64_t m;
    std::memcpy(&m, data + i, 8);  // little-endian host assumed (x86/ARM)
    v3 ^= m; sipround(v0, v1, v2, v3); sipround(v0, v1, v2, v3); v0 ^= m;
  }
  uint64_t b = static_cast<uint64_t>(len) << 56;
  b |= load_le64(data + i, len - i);
  v3 ^= b; sipround(v0, v1, v2, v3); sipround(v0, v1, v2, v3); v0 ^= b;
  v2 ^= 0xff;
  sipround(v0, v1, v2, v3); sipround(v0, v1, v2, v3);
  sipround(v0, v1, v2, v3); sipround(v0, v1, v2, v3);
  return v0 ^ v1 ^ v2 ^ v3;
}

inline uint64_t splitmix64_fin(uint64_t v) {
  // pandas _hash_ndarray final scramble
  v ^= v >> 30; v *= 0xbf58476d1ce4e5b9ULL;
  v ^= v >> 27; v *= 0x94d049bb133111ebULL;
  v ^= v >> 31;
  return v;
}

inline int32_t hash_bucket_id(const char* s, size_t len, uint64_t buckets) {
  if (len == 0) return 0;  // missing -> null row
  uint64_t h = splitmix64_fin(
      siphash24(reinterpret_cast<const unsigned char*>(s), len));
  return static_cast<int32_t>(h % buckets) + 1;
}

// ---------------- line parsing -------------------------------------------

inline float parse_dense(const char* s, const char* end) {
  // integer counts, possibly negative or empty; missing -> 0, then
  // log1p(max(v, 0)) (criteo.py _Log1pScaler)
  if (s == end) return 0.0f;
  bool neg = false;
  if (*s == '-') { neg = true; ++s; }
  int64_t v = 0;
  for (; s != end; ++s) {
    if (*s < '0' || *s > '9') break;
    v = v * 10 + (*s - '0');
  }
  if (neg) v = -v;
  double x = v > 0 ? static_cast<double>(v) : 0.0;
  return static_cast<float>(std::log1p(x));
}

struct Span { const char* begin; const char* end; int64_t row0; };

void parse_span(const Span& span, int64_t max_row, uint64_t buckets,
                float* y, float* dense, int32_t* cats) {
  const char* p = span.begin;
  int64_t row = span.row0;
  while (p < span.end && row < max_row) {
    const char* nl = static_cast<const char*>(
        std::memchr(p, '\n', span.end - p));
    const char* line_end = nl ? nl : span.end;

    // 40 fields: label, 13 ints, 26 cats
    const char* f = p;
    for (int field = 0; field < 1 + kNumDense + kNumCat; ++field) {
      const char* tab = static_cast<const char*>(
          std::memchr(f, '\t', line_end - f));
      const char* fe = tab ? tab : line_end;
      if (field == 0) {
        y[row] = (f != fe && *f == '1') ? 1.0f : 0.0f;
      } else if (field <= kNumDense) {
        dense[row * kNumDense + (field - 1)] = parse_dense(f, fe);
      } else {
        cats[row * kNumCat + (field - 1 - kNumDense)] =
            hash_bucket_id(f, fe - f, buckets);
      }
      if (!tab) {  // short line: remaining fields are missing
        for (int rest = field + 1; rest < 1 + kNumDense + kNumCat; ++rest) {
          if (rest <= kNumDense) dense[row * kNumDense + (rest - 1)] = 0.0f;
          else cats[row * kNumCat + (rest - 1 - kNumDense)] = 0;
        }
        break;
      }
      f = fe + 1;
    }
    ++row;
    if (!nl) break;
    p = nl + 1;
  }
}

// mmap the file read-only: no user-space copy, no whole-file RSS (pages
// stream through the page cache and count+parse share them), and a clean
// failure path — unlike a malloc+fread of a 45 GB day file.
struct MappedFile {
  const char* data = nullptr;
  size_t len = 0;
  bool ok = false;
};

MappedFile map_file(const char* path) {
  MappedFile mf;
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return mf;
  struct stat st;
  if (::fstat(fd, &st) != 0 || st.st_size < 0) {
    ::close(fd);
    return mf;
  }
  mf.len = static_cast<size_t>(st.st_size);
  mf.ok = true;
  if (mf.len > 0) {
    void* p = ::mmap(nullptr, mf.len, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) {
      mf.ok = false;
    } else {
      ::madvise(p, mf.len, MADV_SEQUENTIAL);
      mf.data = static_cast<const char*>(p);
    }
  }
  ::close(fd);
  return mf;
}

void unmap_file(const MappedFile& mf) {
  if (mf.data) ::munmap(const_cast<char*>(mf.data), mf.len);
}

int64_t count_rows_buf(const char* buf, size_t len) {
  int64_t rows = 0;
  const char* p = buf;
  const char* end = buf + len;
  while (p < end) {
    const char* nl = static_cast<const char*>(std::memchr(p, '\n', end - p));
    ++rows;
    if (!nl) break;
    p = nl + 1;
    if (p == end) break;  // trailing newline: no extra row
  }
  return rows;
}

// skip ``rows`` newline-terminated lines from p (for chunked range reads)
const char* skip_rows_buf(const char* p, const char* end, int64_t rows) {
  while (rows > 0 && p < end) {
    const char* nl = static_cast<const char*>(std::memchr(p, '\n', end - p));
    if (!nl) return end;
    p = nl + 1;
    --rows;
  }
  return p;
}

int64_t parse_buf(const char* buf, const char* end, int64_t n_rows,
                  int64_t num_buckets, int32_t n_threads, float* y,
                  float* dense, int32_t* cats) {
  const size_t len = static_cast<size_t>(end - buf);

  // split at newline boundaries into ~equal byte spans, tracking the
  // starting row index of each span with a serial newline count
  int nt = n_threads > 0 ? n_threads
                         : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  std::vector<Span> spans;
  const char* p = buf;
  int64_t row0 = 0;
  for (int t = 0; t < nt && p < end && row0 < n_rows; ++t) {
    const char* cut = (t == nt - 1) ? end : buf + len * (t + 1) / nt;
    if (cut > end) cut = end;
    if (cut < end) {
      const char* nl = static_cast<const char*>(
          std::memchr(cut, '\n', end - cut));
      cut = nl ? nl + 1 : end;
    }
    spans.push_back({p, cut, row0});
    row0 += count_rows_buf(p, cut - p);
    p = cut;
  }

  std::vector<std::thread> workers;
  for (const Span& s : spans) {
    workers.emplace_back(parse_span, s, n_rows,
                         static_cast<uint64_t>(num_buckets), y, dense, cats);
  }
  for (auto& w : workers) w.join();
  return row0 < n_rows ? row0 : n_rows;
}

}  // namespace

extern "C" {

int64_t criteo_count_rows(const char* path, int64_t max_rows) {
  MappedFile mf = map_file(path);
  if (!mf.ok) return -1;
  int64_t rows = mf.len ? count_rows_buf(mf.data, mf.len) : 0;
  unmap_file(mf);
  if (max_rows >= 0 && rows > max_rows) rows = max_rows;
  return rows;
}

int64_t criteo_parse(const char* path, int64_t n_rows, int64_t num_buckets,
                     int32_t n_threads, float* y, float* dense,
                     int32_t* cats) {
  MappedFile mf = map_file(path);
  if (!mf.ok) return -1;
  int64_t parsed = parse_buf(mf.data, mf.data + mf.len, n_rows, num_buckets,
                             n_threads, y, dense, cats);
  unmap_file(mf);
  return parsed;
}

// chunked range read for the streaming input pipeline: parse ``n_rows``
// rows starting at row ``start_row``. The newline skip streams through
// the page cache (mmap MADV_SEQUENTIAL), so iterating a 45 GB day file
// chunk by chunk never needs whole-file residency.
int64_t criteo_parse_range(const char* path, int64_t start_row,
                           int64_t n_rows, int64_t num_buckets,
                           int32_t n_threads, float* y, float* dense,
                           int32_t* cats) {
  MappedFile mf = map_file(path);
  if (!mf.ok) return -1;
  const char* p = skip_rows_buf(mf.data, mf.data + mf.len, start_row);
  int64_t parsed = parse_buf(p, mf.data + mf.len, n_rows, num_buckets,
                             n_threads, y, dense, cats);
  unmap_file(mf);
  return parsed;
}

// Threaded column interleave: n_cols contiguous (n_rows,) 4-byte columns
// -> one row-major (n_rows, n_cols) matrix. This is the hot host-side
// "pack" of the streaming fit path (training/train_step.py pack_dataset):
// numpy's np.stack is a single-threaded strided write measured at
// 0.28 s per 262k x 26 chunk; this blocked multithreaded version is
// memory-bandwidth-bound (~10-30 ms). Works for int32 and float32 alike
// (pure 4-byte moves).
int64_t pack_columns_32(const int32_t* const* cols, int32_t n_cols,
                        int64_t n_rows, int32_t n_threads, int32_t* out) {
  if (n_cols <= 0 || n_rows < 0) return -1;
  int nt = n_threads > 0 ? n_threads
                         : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > 32) nt = 32;
  int64_t block = (n_rows + nt - 1) / nt;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * block;
    int64_t hi = lo + block < n_rows ? lo + block : n_rows;
    if (lo >= hi) break;
    threads.emplace_back([=] {
      // row-blocked so each (RB x n_cols) output tile stays in cache
      // while every source column streams through it once
      constexpr int64_t RB = 4096;
      for (int64_t r0 = lo; r0 < hi; r0 += RB) {
        int64_t r1 = r0 + RB < hi ? r0 + RB : hi;
        for (int32_t c = 0; c < n_cols; ++c) {
          const int32_t* src = cols[c];
          int32_t* dst = out + c;
          for (int64_t r = r0; r < r1; ++r) dst[r * n_cols] = src[r];
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  return n_rows;
}

}  // extern "C"
