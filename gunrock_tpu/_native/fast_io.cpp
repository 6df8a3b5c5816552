// Native IO hot paths.
//
// Role of the reference's C/C++ host hot paths: the vendored mmio matrix-
// market reader (reference include/gunrock/io/detail/mmio_impl.hxx) and the
// counting-sort COO->CSR conversion (reference include/gunrock/formats/
// csr.hxx:81-140). Multi-GB graph files bottleneck on text parsing and
// sorting; this module mmaps the file and scans it with hand-rolled
// number parsing (~10x numpy's loadtxt), and runs the two-pass stable
// counting sort in C++.
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in the
// build image); gunrock_tpu/_native/__init__.py builds it on demand with
// g++ and falls back to the pure-numpy implementations when unavailable.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct MtxData {
  std::vector<int32_t> rows, cols;
  std::vector<float> vals;
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

inline int64_t parse_int(const char*& p, const char* end) {
  p = skip_ws(p, end);
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
  return neg ? -v : v;
}

inline double parse_float(const char*& p, const char* end) {
  p = skip_ws(p, end);
  // The mmap'd buffer is not NUL-terminated; strtod on `p` could read past
  // the mapping when the file ends exactly at a page boundary. Copy the
  // token into a bounded NUL-terminated buffer first.
  char buf[64];
  int n = 0;
  const char* q = p;
  while (q < end && n < 63 && *q != ' ' && *q != '\t' && *q != '\r' &&
         *q != '\n') {
    buf[n++] = *q++;
  }
  buf[n] = '\0';
  char* e = buf;
  double v = strtod(buf, &e);
  p += (e - buf);
  return v;
}

void set_err(char* err, int errlen, const std::string& msg) {
  if (err && errlen > 0) {
    snprintf(err, (size_t)errlen, "%s", msg.c_str());
  }
}

}  // namespace

extern "C" {

// Parse a .mtx file. Returns an opaque handle (or nullptr on error, with
// `err` filled). Outputs the *expanded* edge count (symmetric off-diagonal
// entries duplicated, matching reference matrix_market.hxx:203-246).
void* gr_mtx_parse(const char* path, int64_t* n_rows, int64_t* n_cols,
                   int64_t* nnz_out, int* symmetric, int* pattern,
                   char* err, int errlen) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) { set_err(err, errlen, "cannot open file"); return nullptr; }
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    set_err(err, errlen, "cannot stat file / empty file");
    return nullptr;
  }
  const char* base =
      (const char*)mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (base == MAP_FAILED) { set_err(err, errlen, "mmap failed"); return nullptr; }
  const char* p = base;
  const char* end = base + st.st_size;

  // banner: %%MatrixMarket matrix coordinate <field> <symmetry>
  if (strncmp(p, "%%MatrixMarket", 14) != 0) {
    munmap((void*)base, (size_t)st.st_size);
    set_err(err, errlen, "missing MatrixMarket banner");
    return nullptr;
  }
  const char* line_end = p;
  while (line_end < end && *line_end != '\n') ++line_end;
  std::string banner(p, line_end);
  for (auto& c : banner) c = (char)tolower((unsigned char)c);
  bool is_pattern = banner.find("pattern") != std::string::npos;
  bool is_skew = banner.find("skew-symmetric") != std::string::npos;
  // Reference parity (mmio mm_is_symmetric excludes skew): skew-symmetric
  // is treated as general/directed with NO mirror expansion.
  bool is_sym = !is_skew && (banner.find("symmetric") != std::string::npos ||
                             banner.find("hermitian") != std::string::npos);
  if (banner.find("coordinate") == std::string::npos) {
    munmap((void*)base, (size_t)st.st_size);
    set_err(err, errlen, "only coordinate matrices supported");
    return nullptr;
  }
  if (banner.find("complex") != std::string::npos) {
    munmap((void*)base, (size_t)st.st_size);
    set_err(err, errlen, "complex matrices not supported");
    return nullptr;
  }
  p = next_line(p, end);
  while (p < end && *p == '%') p = next_line(p, end);

  int64_t nr = parse_int(p, end);
  int64_t nc = parse_int(p, end);
  int64_t nnz = parse_int(p, end);
  p = next_line(p, end);

  auto* data = new MtxData();
  data->rows.reserve((size_t)(is_sym ? 2 * nnz : nnz));
  data->cols.reserve((size_t)(is_sym ? 2 * nnz : nnz));
  data->vals.reserve((size_t)(is_sym ? 2 * nnz : nnz));

  for (int64_t i = 0; i < nnz; ++i) {
    if (p >= end) {
      delete data;
      munmap((void*)base, (size_t)st.st_size);
      set_err(err, errlen, "unexpected end of file");
      return nullptr;
    }
    int32_t r = (int32_t)(parse_int(p, end) - 1);
    int32_t c = (int32_t)(parse_int(p, end) - 1);
    float v = is_pattern ? 1.0f : (float)parse_float(p, end);
    p = next_line(p, end);
    data->rows.push_back(r);
    data->cols.push_back(c);
    data->vals.push_back(v);
    if (is_sym && r != c) {
      data->rows.push_back(c);
      data->cols.push_back(r);
      data->vals.push_back(v);
    }
  }
  munmap((void*)base, (size_t)st.st_size);

  *n_rows = nr;
  *n_cols = nc;
  *nnz_out = (int64_t)data->rows.size();
  *symmetric = is_sym ? 1 : 0;
  *pattern = is_pattern ? 1 : 0;
  return data;
}

void gr_mtx_copy(void* h, int32_t* rows, int32_t* cols, float* vals) {
  auto* d = (MtxData*)h;
  memcpy(rows, d->rows.data(), d->rows.size() * sizeof(int32_t));
  memcpy(cols, d->cols.data(), d->cols.size() * sizeof(int32_t));
  memcpy(vals, d->vals.data(), d->vals.size() * sizeof(float));
}

void gr_mtx_free(void* h) { delete (MtxData*)h; }

// Stable two-pass counting sort by (major, minor): the exact semantics of
// np.lexsort((minor, major)) in formats._counting_sort_to_compressed.
// Outputs compressed offsets, sorted minor/vals, and the permutation
// (sorted position -> original index).
void gr_coo_to_compressed(int64_t nnz, int32_t n_major, int32_t n_minor,
                          const int32_t* major, const int32_t* minor,
                          const float* vals, int64_t* offsets,
                          int32_t* minor_out, float* vals_out,
                          int64_t* perm_out) {
  // pass 1: stable counting sort by minor
  std::vector<int64_t> count((size_t)n_minor + 1, 0);
  for (int64_t i = 0; i < nnz; ++i) ++count[(size_t)minor[i] + 1];
  for (int32_t k = 0; k < n_minor; ++k) count[(size_t)k + 1] += count[(size_t)k];
  std::vector<int64_t> perm1((size_t)nnz);
  for (int64_t i = 0; i < nnz; ++i) perm1[(size_t)count[(size_t)minor[i]]++] = i;

  // pass 2: stable counting sort (of the minor-sorted order) by major
  std::vector<int64_t> count2((size_t)n_major + 1, 0);
  for (int64_t i = 0; i < nnz; ++i) ++count2[(size_t)major[i] + 1];
  for (int32_t k = 0; k < n_major; ++k)
    count2[(size_t)k + 1] += count2[(size_t)k];
  for (int32_t k = 0; k <= n_major; ++k) offsets[k] = count2[(size_t)k];
  for (int64_t i = 0; i < nnz; ++i) {
    int64_t src = perm1[(size_t)i];
    int64_t dst = count2[(size_t)major[src]]++;
    perm_out[dst] = src;
    minor_out[dst] = minor[src];
    vals_out[dst] = vals[src];
  }
}

}  // extern "C"
