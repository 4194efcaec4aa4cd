// Batched FASTA/FASTQ reader (plain or gzip), int-encoding bases.
//
// Native replacement for the reference's vendored kseq-style reader
// (libgramtools include/sequence_read/seq_file.h): parses records in
// C++ and hands Python flat encoded buffers, so read ingestion keeps up
// with the batched device mapper. ctypes interface:
//
//   handle = gram_tpu_open_fastx(path)
//   n = gram_tpu_read_batch(handle, max_reads, capacity,
//                           seq_buf, len_buf, qual_sum_buf, qual_len_buf)
//   gram_tpu_close_fastx(handle)
//
// Bases encode A/C/G/T (any case) -> 1..4, anything else -> 0 (the
// caller skips reads containing 0, matching utils.cpp:73-80).
// qual_sum = sum of raw quality bytes (caller subtracts 33 per base),
// qual_len = number of quality bytes (0 for FASTA).

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <string>

namespace {

struct FastxFile {
  gzFile fh = nullptr;
  std::string pending_header;  // last seen '>'/'@' line (without prefix)
  bool is_fastq = false;
  bool primed = false;
  char line_buf[1 << 16];
};

int8_t encode_table[256];

void init_table() {
  static bool done = false;
  if (done) return;
  memset(encode_table, 0, sizeof(encode_table));
  encode_table[(unsigned)'A'] = encode_table[(unsigned)'a'] = 1;
  encode_table[(unsigned)'C'] = encode_table[(unsigned)'c'] = 2;
  encode_table[(unsigned)'G'] = encode_table[(unsigned)'g'] = 3;
  encode_table[(unsigned)'T'] = encode_table[(unsigned)'t'] = 4;
  done = true;
}

// Reads one line (strips trailing newline); returns false on EOF.
bool get_line(FastxFile* f, std::string& out) {
  out.clear();
  while (true) {
    if (gzgets(f->fh, f->line_buf, sizeof(f->line_buf)) == nullptr)
      return !out.empty();
    size_t len = strlen(f->line_buf);
    bool complete = len > 0 && f->line_buf[len - 1] == '\n';
    if (complete) f->line_buf[--len] = '\0';
    if (len > 0 && f->line_buf[len - 1] == '\r') f->line_buf[--len] = '\0';
    out.append(f->line_buf, len);
    if (complete) return true;
  }
}

}  // namespace

extern "C" {

void* gram_tpu_open_fastx(const char* path) {
  init_table();
  gzFile fh = gzopen(path, "rb");
  if (!fh) return nullptr;
  auto* f = new FastxFile;
  f->fh = fh;
  gzbuffer(fh, 1 << 20);
  return f;
}

void gram_tpu_close_fastx(void* handle) {
  auto* f = (FastxFile*)handle;
  if (!f) return;
  if (f->fh) gzclose(f->fh);
  delete f;
}

// Returns number of reads parsed (0 at EOF; -1 on malformed input or if
// the next read would not fit in seq_buf).
int64_t gram_tpu_read_batch(void* handle, int64_t max_reads,
                            int64_t seq_capacity, uint8_t* seq_buf,
                            int32_t* len_buf, int64_t* qual_sum_buf,
                            int32_t* qual_len_buf) {
  auto* f = (FastxFile*)handle;
  if (!f) return -1;
  std::string line;
  int64_t n_reads = 0;
  int64_t seq_cursor = 0;

  if (!f->primed) {
    if (!get_line(f, line)) return 0;
    if (line.empty()) return -1;
    if (line[0] == '@')
      f->is_fastq = true;
    else if (line[0] != '>')
      return -1;
    f->pending_header = line;
    f->primed = true;
  }

  while (n_reads < max_reads && !f->pending_header.empty()) {
    std::string seq;
    std::string qual;
    if (f->is_fastq) {
      if (!get_line(f, seq)) break;   // sequence line
      if (!get_line(f, line)) break;  // '+' line
      if (!get_line(f, qual)) break;  // quality line
      // next header (or EOF)
      if (!get_line(f, f->pending_header)) f->pending_header.clear();
    } else {
      // FASTA: accumulate until next '>' or EOF
      f->pending_header.clear();
      while (get_line(f, line)) {
        if (!line.empty() && line[0] == '>') {
          f->pending_header = line;
          break;
        }
        seq += line;
      }
    }

    if ((int64_t)seq.size() > seq_capacity - seq_cursor) return -1;
    int64_t qual_sum = 0;
    for (unsigned char c : qual) qual_sum += c;
    for (size_t i = 0; i < seq.size(); ++i)
      seq_buf[seq_cursor + i] = (uint8_t)encode_table[(unsigned char)seq[i]];
    seq_cursor += seq.size();
    len_buf[n_reads] = (int32_t)seq.size();
    qual_sum_buf[n_reads] = qual_sum;
    qual_len_buf[n_reads] = (int32_t)qual.size();
    ++n_reads;
  }
  return n_reads;
}
}
