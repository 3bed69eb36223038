// Native TSV table ingest: the hot-path loader behind
// graph_learn_tpu/core/ingest.py.
//
// TPU-native equivalent of the reference's C++ IO layer
// (reference: graphlearn/src/core/io/{edge_loader.cc,node_loader.cc,
// parser.cc:39-99}, data_slicer.h — schema-checked TSV parse, files sliced
// across threads).  Re-designed standalone: mmap + two-pass (line index,
// then parallel columnar parse straight into numpy-owned buffers), no
// request/RPC machinery.  Exposed via a plain C ABI consumed with ctypes
// (no pybind11 in this image).
//
// String hashing is FNV-1a 64 to match graph_learn_tpu.core.ingest.hash64.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kFnvOffset = 14695981039346656037ULL;
constexpr uint64_t kFnvPrime = 1099511628211ULL;

inline uint64_t fnv1a(const char* s, size_t len) {
  uint64_t h = kFnvOffset;
  for (size_t i = 0; i < len; ++i) {
    h = (h ^ static_cast<unsigned char>(s[i])) * kFnvPrime;
  }
  return h;
}

inline int64_t parse_i64(const char* p, const char* end) {
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
  return neg ? -v : v;
}

inline double parse_f64(const char* p, const char* end) {
  char buf[64];
  size_t n = static_cast<size_t>(end - p);
  if (n >= sizeof(buf)) n = sizeof(buf) - 1;
  memcpy(buf, p, n);
  buf[n] = 0;
  return strtod(buf, nullptr);
}

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

Mapped map_file(const char* path) {
  Mapped m;
  m.fd = open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0 || st.st_size == 0) { close(m.fd); return m; }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) { close(m.fd); return m; }
  m.data = static_cast<const char*>(p);
  m.size = static_cast<size_t>(st.st_size);
  return m;
}

void unmap(Mapped& m) {
  if (m.data) munmap(const_cast<char*>(m.data), m.size);
  if (m.fd >= 0) close(m.fd);
}

// Attr kinds (must match graph_learn_tpu/csrc/__init__.py):
enum AttrKind {
  kFloatNumeric = 0,  // -> float column
  kIntNumeric = 1,    // -> float column (reference casts to continuous)
  kIntId = 2,         // -> int column, optional bucket mod
  kStringHash = 3,    // -> int column, fnv1a % bucket
  kMultival = 4,      // -> [n, max_len] int column + len
};

struct TableSpec {
  int n_id_cols;       // 1 node / 2 edge
  int weighted, labeled, timestamped;
  int n_attrs;
  const int32_t* attr_kinds;    // [n_attrs]
  const int64_t* attr_buckets;  // [n_attrs] (0 = dynamic)
  int mv_max_len;
  char field_delim;
  char attr_delim;
};

struct Out {
  int64_t* ids0;       // [n]
  int64_t* ids1;       // [n] or null
  float* weights;      // [n] or null
  int32_t* labels;     // [n] or null
  int64_t* timestamps; // [n] or null
  float* float_attrs;  // [n, nf] or null
  int32_t* int_attrs;  // [n, ni] or null
  int32_t* mv_attrs;   // [n, nm, L] or null
  int32_t* mv_lens;    // [n, nm] or null
  int nf, ni, nm;
};

int parse_range(const Mapped& m, const TableSpec& spec, const Out& out,
                const size_t* line_starts, const size_t* line_ends,
                int64_t begin, int64_t end_row) {
  const int64_t kDynamicBucket = (1LL << 31) - 1;
  for (int64_t row = begin; row < end_row; ++row) {
    const char* p = m.data + line_starts[row];
    const char* line_end = m.data + line_ends[row];  // one past last char

    auto next_field = [&](const char** fs, const char** fe) -> bool {
      if (p > line_end) return false;
      *fs = p;
      const char* q = static_cast<const char*>(
          memchr(p, spec.field_delim, line_end - p));
      *fe = q ? q : line_end;
      p = q ? q + 1 : line_end + 1;
      return true;
    };

    const char *fs, *fe;
    if (!next_field(&fs, &fe)) return -2;
    out.ids0[row] = parse_i64(fs, fe);
    if (spec.n_id_cols == 2) {
      if (!next_field(&fs, &fe)) return -2;
      out.ids1[row] = parse_i64(fs, fe);
    }
    if (spec.weighted) {
      if (!next_field(&fs, &fe)) return -2;
      out.weights[row] = static_cast<float>(parse_f64(fs, fe));
    }
    if (spec.labeled) {
      if (!next_field(&fs, &fe)) return -2;
      out.labels[row] = static_cast<int32_t>(parse_i64(fs, fe));
    }
    if (spec.timestamped) {
      if (!next_field(&fs, &fe)) return -2;
      out.timestamps[row] = parse_i64(fs, fe);
    }
    if (spec.n_attrs > 0) {
      if (!next_field(&fs, &fe)) return -2;
      // schema check: the blob must hold exactly n_attrs values
      // (parity with parser.cc:49-54 "Unexpected attribute count")
      {
        int delims = 0;
        for (const char* q = fs;
             (q = static_cast<const char*>(
                  memchr(q, spec.attr_delim, fe - q))) != nullptr;
             ++q) {
          ++delims;
        }
        if (delims != spec.n_attrs - 1) return -6;
      }
      // split the attr blob by attr_delim
      const char* ap = fs;
      int fi = 0, ii = 0, mi = 0;
      for (int a = 0; a < spec.n_attrs; ++a) {
        const char* as = ap;
        const char* ae = static_cast<const char*>(
            memchr(ap, spec.attr_delim, fe - ap));
        if (!ae) ae = fe;
        ap = (ae < fe) ? ae + 1 : fe;
        int64_t bucket = spec.attr_buckets[a];
        switch (spec.attr_kinds[a]) {
          case kFloatNumeric:
            out.float_attrs[row * out.nf + fi++] =
                static_cast<float>(parse_f64(as, ae));
            break;
          case kIntNumeric:
            out.float_attrs[row * out.nf + fi++] =
                static_cast<float>(parse_i64(as, ae));
            break;
          case kIntId: {
            int64_t v = parse_i64(as, ae);
            if (bucket > 0) v = ((v % bucket) + bucket) % bucket;
            out.int_attrs[row * out.ni + ii++] = static_cast<int32_t>(v);
            break;
          }
          case kStringHash: {
            uint64_t b = bucket > 0 ? static_cast<uint64_t>(bucket)
                                    : static_cast<uint64_t>(kDynamicBucket);
            out.int_attrs[row * out.ni + ii++] =
                static_cast<int32_t>(fnv1a(as, ae - as) % b);
            break;
          }
          case kMultival: {
            uint64_t b = bucket > 0 ? static_cast<uint64_t>(bucket)
                                    : static_cast<uint64_t>(kDynamicBucket);
            int L = spec.mv_max_len;
            int32_t* dst = out.mv_attrs + (row * out.nm + mi) * L;
            int cnt = 0;
            const char* vp = as;
            while (vp < ae && cnt < L) {
              const char* ve = static_cast<const char*>(
                  memchr(vp, ',', ae - vp));
              if (!ve) ve = ae;
              if (ve > vp) dst[cnt++] = static_cast<int32_t>(
                  fnv1a(vp, ve - vp) % b);
              vp = ve + 1;
            }
            out.mv_lens[row * out.nm + mi] = cnt;
            ++mi;
            break;
          }
          default:
            return -3;
        }
      }
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Pass 1: count data lines (excluding the header line). Returns < 0 on error.
int64_t glt_count_rows(const char* path) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  // skip header
  const char* first_nl = static_cast<const char*>(
      memchr(m.data, '\n', m.size));
  int64_t rows = 0;
  if (first_nl) {
    const char* p = first_nl + 1;
    const char* end = m.data + m.size;
    while (p < end) {
      const char* q = static_cast<const char*>(memchr(p, '\n', end - p));
      if (!q) { if (end - p > 0) ++rows; break; }
      if (q > p) ++rows;  // skip empty lines
      p = q + 1;
    }
  }
  unmap(m);
  return rows;
}

// Pass 2: parse all rows into caller-allocated buffers.
// Returns 0 on success.
int32_t glt_parse_table(
    const char* path,
    int32_t n_id_cols, int32_t weighted, int32_t labeled, int32_t timestamped,
    int32_t n_attrs, const int32_t* attr_kinds, const int64_t* attr_buckets,
    int32_t mv_max_len, char field_delim, char attr_delim,
    int64_t n_rows,
    int64_t* ids0, int64_t* ids1, float* weights, int32_t* labels,
    int64_t* timestamps, float* float_attrs, int32_t* int_attrs,
    int32_t* mv_attrs, int32_t* mv_lens,
    int32_t nf, int32_t ni, int32_t nm, int32_t n_threads) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;

  // index line starts/ends (sequential; memchr is ~GB/s)
  std::vector<size_t> line_starts, line_ends;
  line_starts.reserve(static_cast<size_t>(n_rows) + 1);
  line_ends.reserve(static_cast<size_t>(n_rows) + 1);
  const char* first_nl = static_cast<const char*>(
      memchr(m.data, '\n', m.size));
  if (!first_nl) { unmap(m); return -4; }
  {
    const char* p = first_nl + 1;
    const char* end = m.data + m.size;
    while (p < end) {
      const char* q = static_cast<const char*>(memchr(p, '\n', end - p));
      const char* line_e = q ? q : end;
      if (line_e > p) {
        line_starts.push_back(p - m.data);
        size_t e = line_e - m.data;
        // trim a trailing '\r' (CRLF tables)
        if (e > 0 && m.data[e - 1] == '\r') --e;
        line_ends.push_back(e);
      }
      if (!q) break;
      p = q + 1;
    }
  }
  if (static_cast<int64_t>(line_starts.size()) != n_rows) {
    unmap(m);
    return -5;
  }

  TableSpec spec{n_id_cols, weighted, labeled, timestamped, n_attrs,
                 attr_kinds, attr_buckets, mv_max_len, field_delim,
                 attr_delim};
  Out out{ids0, ids1, weights, labels, timestamps, float_attrs, int_attrs,
          mv_attrs, mv_lens, nf, ni, nm};

  int nt = n_threads > 0 ? n_threads : 1;
  if (nt > 1 && n_rows > 10000) {
    std::vector<std::thread> workers;
    std::vector<int> rcs(nt, 0);
    int64_t chunk = (n_rows + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      int64_t b = t * chunk;
      int64_t e = std::min(n_rows, b + chunk);
      if (b >= e) break;
      workers.emplace_back([&, t, b, e]() {
        rcs[t] = parse_range(m, spec, out, line_starts.data(),
                             line_ends.data(), b, e);
      });
    }
    for (auto& w : workers) w.join();
    for (int rc : rcs) {
      if (rc != 0) { unmap(m); return rc; }
    }
  } else {
    int rc = parse_range(m, spec, out, line_starts.data(),
                         line_ends.data(), 0, n_rows);
    if (rc != 0) { unmap(m); return rc; }
  }
  unmap(m);
  return 0;
}

}  // extern "C"
