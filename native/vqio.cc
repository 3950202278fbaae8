// vqio: native IO for videoquery.
//
// Fast feature-CSV parsing (the ingest hot path — the reference parses these
// row-by-row in Python csv.reader, api_load_records.py:41-61). Whole-file
// read into a NUL-terminated buffer (strtod/strtol require a terminator; an
// mmap of an exactly page-sized file without a trailing newline would be
// read past) + manual float parsing + pthread row sharding; exposed to
// Python via a plain C ABI loaded with ctypes (no pybind11 here).
//
// CSV contract (calcSig_wOF.py:116-134): one header line, then rows
// "clip,f1,...,fD" with ASCII floats.

#include <cerrno>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Parsed {
  std::string header;
  std::vector<int64_t> clips;
  std::vector<double> values;  // row-major [n, dim]
  int64_t dim = 0;
  std::string error;
};

// Parse rows in [begin, end); each thread writes into its own buffers.
// Every row must have exactly `dim` comma-separated values after the clip
// number and stop at its own line end — a short/garbled row fails the parse
// (the Python fallback then raises) instead of silently consuming the next
// row's values.
void parse_rows(const char* begin, const char* end, int64_t dim,
                std::vector<int64_t>* clips, std::vector<double>* values,
                bool* ok) {
  *ok = true;
  const char* p = begin;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    const char* line_end = nl ? nl : end;
    if (line_end > p) {
      char* next = nullptr;
      long clip = strtol(p, &next, 10);
      if (next == p || next >= line_end || *next != ',') {
        *ok = false;
        return;
      }
      clips->push_back(clip);
      const char* q = next + 1;
      for (int64_t i = 0; i < dim; ++i) {
        char* after = nullptr;
        double v = strtod(q, &after);
        if (after == q || after > line_end) {
          *ok = false;
          return;
        }
        values->push_back(v);
        q = after;
        if (q < line_end && *q == ',') {
          ++q;
        } else if (i != dim - 1) {
          *ok = false;  // fewer fields than dim
          return;
        }
      }
      if (q != line_end) {
        *ok = false;  // more fields than dim
        return;
      }
    }
    p = line_end + 1;
  }
}

Parsed* parse_file(const char* path, int n_threads) {
  auto out = new Parsed();
  int fd = open(path, O_RDONLY);
  if (fd < 0) {
    out->error = "open failed";
    return out;
  }
  struct stat st;
  fstat(fd, &st);
  size_t size = st.st_size;
  if (size == 0) {
    close(fd);
    out->error = "empty file";
    return out;
  }
  // whole-file read with a NUL terminator: strtod/strtol need one, and an
  // mmap of a page-multiple-sized file without a final newline would be
  // overread at the last field
  std::vector<char> buf(size + 1);
  size_t got = 0;
  while (got < size) {
    ssize_t r = read(fd, buf.data() + got, size - got);
    if (r <= 0) break;
    got += static_cast<size_t>(r);
  }
  close(fd);
  if (got != size) {
    out->error = "short read";
    return out;
  }
  buf[size] = '\0';
  const char* data = buf.data();
  const char* end = data + size;
  const char* hdr_end = static_cast<const char*>(memchr(data, '\n', size));
  if (!hdr_end) {
    out->error = "no header line";
    return out;
  }
  out->header.assign(data, hdr_end - data);

  // infer dim from the first data row
  const char* first = hdr_end + 1;
  const char* first_end =
      static_cast<const char*>(memchr(first, '\n', end - first));
  if (!first_end) first_end = end;
  int64_t dim = 0;
  for (const char* c = first; c < first_end; ++c)
    if (*c == ',') ++dim;
  out->dim = dim;
  if (dim <= 0) {
    out->error = "no data rows";
    return out;
  }

  // shard the body across threads at line boundaries
  if (n_threads < 1) n_threads = 1;
  const char* body = first;
  size_t body_size = end - body;
  std::vector<const char*> starts{body};
  for (int t = 1; t < n_threads; ++t) {
    const char* cut = body + body_size * t / n_threads;
    const char* nl = static_cast<const char*>(memchr(cut, '\n', end - cut));
    starts.push_back(nl ? nl + 1 : end);
  }
  starts.push_back(end);

  std::vector<std::vector<int64_t>> tclips(n_threads);
  std::vector<std::vector<double>> tvals(n_threads);
  std::vector<char> oks(n_threads, 1);
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&, t] {
      bool ok = true;
      parse_rows(starts[t], starts[t + 1], dim, &tclips[t], &tvals[t], &ok);
      oks[t] = ok ? 1 : 0;
    });
  }
  for (auto& th : threads) th.join();
  for (int t = 0; t < n_threads; ++t) {
    if (!oks[t]) {
      out->error = "row parse failed";
      return out;
    }
    out->clips.insert(out->clips.end(), tclips[t].begin(), tclips[t].end());
    out->values.insert(out->values.end(), tvals[t].begin(), tvals[t].end());
  }
  return out;
}

}  // namespace

extern "C" {

void* vqio_parse(const char* path, int n_threads) {
  return parse_file(path, n_threads);
}

const char* vqio_error(void* h) {
  auto p = static_cast<Parsed*>(h);
  return p->error.empty() ? nullptr : p->error.c_str();
}

const char* vqio_header(void* h) { return static_cast<Parsed*>(h)->header.c_str(); }

int64_t vqio_rows(void* h) {
  return static_cast<int64_t>(static_cast<Parsed*>(h)->clips.size());
}

int64_t vqio_dim(void* h) { return static_cast<Parsed*>(h)->dim; }

const int64_t* vqio_clips(void* h) { return static_cast<Parsed*>(h)->clips.data(); }

const double* vqio_values(void* h) { return static_cast<Parsed*>(h)->values.data(); }

void vqio_free(void* h) { delete static_cast<Parsed*>(h); }

}  // extern "C"
