// Fast sequence readers (.seq and FASTA), native equivalent of
// utils/sequence_reader.c.
//
// .seq format: alternating '>pattern' / '<text' lines
// (sequence_reader.c:193-227).  FASTA pair mode: two files, '>'-delimited
// multi-line records (sequence_reader.c:241-392).
//
// The API is two-phase so the Python side can allocate exact buffers:
//   1) *_scan: parse once, return counts + total bytes,
//   2) *_load: fill caller-provided flat buffer + offset/length arrays.
// For simplicity and speed the file is slurped with one read.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <string>

namespace {

struct FileBuf {
  std::vector<char> data;
  bool ok = false;
};

static FileBuf slurp(const char* path) {
  FileBuf fb;
  FILE* f = fopen(path, "rb");
  if (!f) return fb;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  fb.data.resize(sz);
  if (sz && fread(fb.data.data(), 1, sz, f) != static_cast<size_t>(sz)) {
    fclose(f);
    return fb;
  }
  fclose(f);
  fb.ok = true;
  return fb;
}

// Parse a .seq buffer: returns vector of (ptr, len, is_pattern).
struct SeqView {
  const char* p;
  int64_t len;
  char tag;  // '>' or '<'
};

static void parse_seq(const FileBuf& fb, std::vector<SeqView>* out) {
  const char* p = fb.data.data();
  const char* end = p + fb.data.size();
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    const char* eol = nl ? nl : end;
    // Trim trailing CR/space.
    const char* e = eol;
    while (e > p && (e[-1] == '\r' || e[-1] == ' ' || e[-1] == '\t')) --e;
    if (e > p && (*p == '>' || *p == '<')) {
      out->push_back({p + 1, e - (p + 1), *p});
    }
    p = nl ? nl + 1 : end;
  }
}

static void parse_fasta(const FileBuf& fb, std::vector<std::string>* out) {
  const char* p = fb.data.data();
  const char* end = p + fb.data.size();
  std::string cur;
  bool in_record = false;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    const char* eol = nl ? nl : end;
    const char* e = eol;
    while (e > p && (e[-1] == '\r' || e[-1] == ' ')) --e;
    if (e > p) {
      if (*p == '>') {
        if (in_record) out->push_back(std::move(cur));
        cur.clear();
        in_record = true;
      } else if (in_record || true) {
        cur.append(p, e - p);
        in_record = true;
      }
    }
    p = nl ? nl + 1 : end;
  }
  if (in_record && !cur.empty()) out->push_back(std::move(cur));
}

}  // namespace

extern "C" {

// Scan a .seq file: returns number of complete pairs (>= 0) or -1 on error;
// *total_bytes is the sum of all kept sequence lengths.
int64_t wfa_read_seq_scan(const char* path, int64_t* total_bytes) {
  FileBuf fb = slurp(path);
  if (!fb.ok) return -1;
  std::vector<SeqView> views;
  parse_seq(fb, &views);
  int64_t pairs = 0, bytes = 0;
  for (size_t i = 0; i + 1 < views.size(); i += 2) {
    if (views[i].tag != '>' || views[i + 1].tag != '<') return -1;
    ++pairs;
    bytes += views[i].len + views[i + 1].len;
  }
  *total_bytes = bytes;
  return pairs;
}

// Load a .seq file into caller buffers sized from the scan:
//   buf[total_bytes], p_off/t_off[num_pairs] int64, p_len/t_len[num_pairs]
// Returns pairs loaded (capped at max_pairs) or -1.
int64_t wfa_read_seq_load(const char* path, char* buf, int64_t* p_off,
                          int64_t* t_off, int32_t* p_len, int32_t* t_len,
                          int64_t max_pairs) {
  FileBuf fb = slurp(path);
  if (!fb.ok) return -1;
  std::vector<SeqView> views;
  parse_seq(fb, &views);
  int64_t n = 0, pos = 0;
  for (size_t i = 0; i + 1 < views.size() && n < max_pairs; i += 2) {
    const SeqView& a = views[i];
    const SeqView& b = views[i + 1];
    memcpy(buf + pos, a.p, a.len);
    p_off[n] = pos;
    p_len[n] = static_cast<int32_t>(a.len);
    pos += a.len;
    memcpy(buf + pos, b.p, b.len);
    t_off[n] = pos;
    t_len[n] = static_cast<int32_t>(b.len);
    pos += b.len;
    ++n;
  }
  return n;
}

// FASTA pair scan/load: query file -> patterns, target file -> texts.
int64_t wfa_read_fasta_scan(const char* query_path, const char* target_path,
                            int64_t* total_bytes) {
  FileBuf q = slurp(query_path), t = slurp(target_path);
  if (!q.ok || !t.ok) return -1;
  std::vector<std::string> qs, ts;
  parse_fasta(q, &qs);
  parse_fasta(t, &ts);
  int64_t n = std::min(qs.size(), ts.size());
  int64_t bytes = 0;
  for (int64_t i = 0; i < n; ++i) bytes += qs[i].size() + ts[i].size();
  *total_bytes = bytes;
  return n;
}

int64_t wfa_read_fasta_load(const char* query_path, const char* target_path,
                            char* buf, int64_t* p_off, int64_t* t_off,
                            int32_t* p_len, int32_t* t_len,
                            int64_t max_pairs) {
  FileBuf q = slurp(query_path), t = slurp(target_path);
  if (!q.ok || !t.ok) return -1;
  std::vector<std::string> qs, ts;
  parse_fasta(q, &qs);
  parse_fasta(t, &ts);
  int64_t n = std::min<int64_t>(std::min(qs.size(), ts.size()), max_pairs);
  int64_t pos = 0;
  for (int64_t i = 0; i < n; ++i) {
    memcpy(buf + pos, qs[i].data(), qs[i].size());
    p_off[i] = pos;
    p_len[i] = static_cast<int32_t>(qs[i].size());
    pos += qs[i].size();
    memcpy(buf + pos, ts[i].data(), ts[i].size());
    t_off[i] = pos;
    t_len[i] = static_cast<int32_t>(ts[i].size());
    pos += ts[i].size();
  }
  return n;
}

}  // extern "C"
