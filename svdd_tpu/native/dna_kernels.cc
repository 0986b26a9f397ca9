// Native data-pipeline kernels: DNA tokenization, detokenization,
// k-mer counting, and CSV sequence-column parsing.
//
// The reference's data path is pure-python pandas/torch
// (/root/reference/dataloader_gosai.py:74-85 CSV -> tokens;
// oracle.py:75-85 python-dict k-mer counting). On a TPU host the data
// pipeline must keep up with the device without stealing host cores
// from the XLA runtime, so the hot string work lives here and is
// exposed through ctypes (svdd_tpu/native/bindings.py). Python
// fallbacks exist for every entry point.
//
// Build: see svdd_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>

extern "C" {

// ---------------------------------------------------------------------------
// Tokenize: ASCII 'A','C','G','T' (upper or lower) -> 0..3; others -> 4.
// seqs: n_seqs concatenated fixed-length strings (len each); out int32.
// ---------------------------------------------------------------------------
void dna_tokenize(const char* seqs, int64_t n_seqs, int64_t len,
                  int32_t* out) {
  static int8_t lut[256];
  static bool init = false;
  if (!init) {
    memset(lut, 4, sizeof(lut));
    lut[(unsigned char)'A'] = 0; lut[(unsigned char)'a'] = 0;
    lut[(unsigned char)'C'] = 1; lut[(unsigned char)'c'] = 1;
    lut[(unsigned char)'G'] = 2; lut[(unsigned char)'g'] = 2;
    lut[(unsigned char)'T'] = 3; lut[(unsigned char)'t'] = 3;
    init = true;
  }
  const int64_t total = n_seqs * len;
  for (int64_t i = 0; i < total; ++i) {
    out[i] = lut[(unsigned char)seqs[i]];
  }
}

// ---------------------------------------------------------------------------
// Detokenize: 0..3 -> 'A','C','G','T'; anything else -> 'N'.
// ---------------------------------------------------------------------------
void dna_detokenize(const int32_t* tokens, int64_t n_seqs, int64_t len,
                    char* out) {
  static const char kAlpha[5] = {'A', 'C', 'G', 'T', 'N'};
  const int64_t total = n_seqs * len;
  for (int64_t i = 0; i < total; ++i) {
    int32_t t = tokens[i];
    out[i] = kAlpha[(t >= 0 && t < 4) ? t : 4];
  }
}

// ---------------------------------------------------------------------------
// k-mer counting over token arrays. Counts land in a dense 4^k table
// (k <= 12); windows containing non-ACGT tokens are skipped. Returns
// the number of table slots (4^k) or -1 on invalid k.
// ---------------------------------------------------------------------------
int64_t kmer_count(const int32_t* tokens, int64_t n_seqs, int64_t len,
                   int32_t k, int64_t* table) {
  if (k < 1 || k > 12) return -1;
  const int64_t slots = ((int64_t)1) << (2 * k);
  memset(table, 0, slots * sizeof(int64_t));
  const int64_t mask = slots - 1;
  for (int64_t s = 0; s < n_seqs; ++s) {
    const int32_t* row = tokens + s * len;
    int64_t code = 0;
    int valid = 0;  // length of current run of ACGT tokens
    for (int64_t i = 0; i < len; ++i) {
      int32_t t = row[i];
      if (t < 0 || t > 3) {
        valid = 0;
        code = 0;
        continue;
      }
      code = ((code << 2) | t) & mask;
      if (++valid >= k) table[code] += 1;
    }
  }
  return slots;
}

// ---------------------------------------------------------------------------
// CSV sequence-column extraction: find `column` in the header, then
// copy each row's field (must be exactly seq_len chars) into out.
// Returns rows parsed, or -1 on error. Minimal CSV: no quoted commas
// in the sequence column (true for the Gosai files).
// ---------------------------------------------------------------------------
int64_t csv_read_seq_column(const char* path, const char* column,
                            int64_t seq_len, char* out,
                            int64_t max_rows) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char* line = nullptr;
  size_t cap = 0;
  // header
  if (getline(&line, &cap, f) <= 0) { fclose(f); free(line); return -1; }
  int col = -1;
  {
    int idx = 0;
    char* save = nullptr;
    for (char* tok = strtok_r(line, ",\r\n", &save); tok;
         tok = strtok_r(nullptr, ",\r\n", &save), ++idx) {
      if (strcmp(tok, column) == 0) { col = idx; break; }
    }
  }
  if (col < 0) { fclose(f); free(line); return -1; }
  int64_t rows = 0;
  while (rows < max_rows && getline(&line, &cap, f) > 0) {
    char* save = nullptr;
    char* tok = strtok_r(line, ",\r\n", &save);
    for (int idx = 0; tok && idx < col; ++idx) {
      tok = strtok_r(nullptr, ",\r\n", &save);
    }
    if (!tok || (int64_t)strlen(tok) != seq_len) continue;
    memcpy(out + rows * seq_len, tok, seq_len);
    ++rows;
  }
  fclose(f);
  free(line);
  return rows;
}


// ---------------------------------------------------------------------------
// Row count (data rows, excluding header). For computing contiguous
// per-host shards before a sharded read.
// ---------------------------------------------------------------------------
int64_t csv_count_rows(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t lines = 0;
  char buf[1 << 16];
  size_t got;
  char last = '\n';
  while ((got = fread(buf, 1, sizeof(buf), f)) > 0) {
    for (size_t i = 0; i < got; ++i) {
      if (buf[i] == '\n') ++lines;
    }
    last = buf[got - 1];
  }
  fclose(f);
  if (last != '\n') ++lines;        // unterminated final line
  return lines > 0 ? lines - 1 : 0; // minus header
}

// ---------------------------------------------------------------------------
// One-pass Gosai reader: sequence column + n_cls float columns, with a
// contiguous row range [row_offset, row_offset + max_rows) for sharded
// multi-host loading (each host reads only its slice of the file).
// cls_cols: comma-separated column names. Rows whose sequence field is
// not exactly seq_len chars are skipped (consistently for both
// outputs). Returns rows parsed or -1 on error.
// ---------------------------------------------------------------------------
int64_t csv_read_gosai(const char* path, const char* seq_col,
                       const char* cls_cols, int64_t seq_len,
                       int64_t row_offset, int64_t max_rows,
                       char* seq_out, float* cls_out, int32_t n_cls) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char* line = nullptr;
  size_t cap = 0;
  if (getline(&line, &cap, f) <= 0) { fclose(f); free(line); return -1; }

  // resolve column indices from the header
  int seq_idx = -1;
  int cls_idx[16];
  for (int i = 0; i < n_cls && i < 16; ++i) cls_idx[i] = -1;
  {
    // split requested class names
    char want[512];
    strncpy(want, cls_cols, sizeof(want) - 1);
    want[sizeof(want) - 1] = 0;
    char* names[16];
    int n_names = 0;
    char* save0 = nullptr;
    for (char* t = strtok_r(want, ",", &save0); t && n_names < 16;
         t = strtok_r(nullptr, ",", &save0)) {
      names[n_names++] = t;
    }
    if (n_names != n_cls) { fclose(f); free(line); return -1; }
    int idx = 0;
    char* save = nullptr;
    for (char* tok = strtok_r(line, ",\r\n", &save); tok;
         tok = strtok_r(nullptr, ",\r\n", &save), ++idx) {
      if (strcmp(tok, seq_col) == 0) seq_idx = idx;
      for (int i = 0; i < n_cls; ++i) {
        if (strcmp(tok, names[i]) == 0) cls_idx[i] = idx;
      }
    }
    if (seq_idx < 0) { fclose(f); free(line); return -1; }
    for (int i = 0; i < n_cls; ++i) {
      if (cls_idx[i] < 0) { fclose(f); free(line); return -1; }
    }
  }

  // skip to the shard's first row
  for (int64_t i = 0; i < row_offset; ++i) {
    if (getline(&line, &cap, f) <= 0) { fclose(f); free(line); return 0; }
  }

  int64_t rows = 0;
  while (rows < max_rows && getline(&line, &cap, f) > 0) {
    // split the row once, remembering every needed field
    const char* seq_field = nullptr;
    const char* cls_field[16] = {nullptr};
    int idx = 0;
    char* save = nullptr;
    for (char* tok = strtok_r(line, ",\r\n", &save); tok;
         tok = strtok_r(nullptr, ",\r\n", &save), ++idx) {
      if (idx == seq_idx) seq_field = tok;
      for (int i = 0; i < n_cls; ++i) {
        if (idx == cls_idx[i]) cls_field[i] = tok;
      }
    }
    if (!seq_field || (int64_t)strlen(seq_field) != seq_len) continue;
    bool ok = true;
    for (int i = 0; i < n_cls; ++i) {
      if (!cls_field[i]) { ok = false; break; }
    }
    if (!ok) continue;
    memcpy(seq_out + rows * seq_len, seq_field, seq_len);
    for (int i = 0; i < n_cls; ++i) {
      cls_out[rows * n_cls + i] = strtof(cls_field[i], nullptr);
    }
    ++rows;
  }
  fclose(f);
  free(line);
  return rows;
}

}  // extern "C"
