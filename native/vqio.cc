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
#include <locale.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

#include "vqio_pow5.h"

namespace {

// The slow path must parse with C-locale numerics regardless of the host
// process's LC_NUMERIC (an embedding GUI app may setlocale to a
// comma-decimal locale): plain strtod would then disagree with both the
// fast path above it and Python float(), which is always C-semantics.
inline double strtod_c(const char* s, char** end) {
  static locale_t c_loc = newlocale(LC_ALL_MASK, "C", (locale_t)0);
  if (c_loc) return strtod_l(s, end, c_loc);
  return strtod(s, end);  // newlocale failed (OOM): best effort
}

// ---------------------------------------------------------------------------
// Correctly-rounded decimal -> double (Eisel-Lemire), with strtod fallback.
//
// strtod was the measured ingest bottleneck (~6k rows/s/core of 1024-d
// features = ~160 ns/value in glibc's arbitrary-precision path). The
// Eisel-Lemire algorithm (Lemire, "Number Parsing at a Gigabyte per
// Second", SP&E 2021) computes the correctly-rounded IEEE-754 double for a
// (mantissa, 10^q) pair with one or two 64x64->128 multiplies against a
// precomputed 128-bit powers-of-ten table, DETECTING every case it cannot
// certify (truncated 20+ digit mantissas, subnormals, exact-halfway
// ambiguity) so those fall back to strtod. Result: bit-identical to
// strtod/Python float() on every input by construction — the fast path
// either proves its rounding or declines.
// ---------------------------------------------------------------------------

// SWAR 8-digit scan (classic public-domain bit tricks): check that all 8
// bytes of a little-endian load are ASCII digits, and convert them to a
// number with three multiply-shift reductions instead of 8 scalar steps.
inline bool eight_digits(uint64_t chunk) {
  return ((chunk & 0xF0F0F0F0F0F0F0F0ULL)
          | (((chunk + 0x0606060606060606ULL) & 0xF0F0F0F0F0F0F0F0ULL) >> 4))
         == 0x3333333333333333ULL;
}

inline uint32_t parse_eight_digits(uint64_t chunk) {
  chunk = (chunk & 0x0F0F0F0F0F0F0F0FULL) * 2561 >> 8;
  chunk = (chunk & 0x00FF00FF00FF00FFULL) * 6553601 >> 16;
  return static_cast<uint32_t>(
      (chunk & 0x0000FFFF0000FFFFULL) * 42949672960001ULL >> 32);
}

// Returns true and writes the correctly-rounded double for w * 10^q
// (w != 0); returns false when correct rounding cannot be certified.
inline bool eisel_lemire(uint64_t w, int64_t q, double* out) {
  if (q < kPow5Smallest || q > kPow5Largest) return false;
  int lz = __builtin_clzll(w);
  w <<= lz;
  const uint64_t* pow = kPow5Table[q - kPow5Smallest];
  __uint128_t prod = static_cast<__uint128_t>(w) * pow[0];
  uint64_t hi = static_cast<uint64_t>(prod >> 64);
  uint64_t lo = static_cast<uint64_t>(prod);
  // 9 low bits of hi feed the round/sticky decision; if they are all ones
  // the truncated 128-bit table value may not determine them — refine with
  // the second 64 bits of the power.
  if ((hi & 0x1FF) == 0x1FF) {
    __uint128_t prod2 = static_cast<__uint128_t>(w) * pow[1];
    uint64_t hi2 = static_cast<uint64_t>(prod2 >> 64);
    uint64_t old_lo = lo;
    lo += hi2;
    if (lo < old_lo) {
      ++hi;
    }
    if ((hi & 0x1FF) == 0x1FF && lo + 1 == 0) return false;  // still unsure
  }
  int upperbit = static_cast<int>(hi >> 63);
  uint64_t mantissa = hi >> (upperbit + 9);  // 53 bits + round bit (54)
  // Unbiased exponent of the value: the product w<<lz times the table's
  // high word approximates value * 2^(lz - s - 64) with
  // s = floor(log2(10^q)) - 127, so E = L + 63 - lz + upperbit where
  // L = floor(q * log2(10)); 217706/2^16 approximates log2(10)=3.3219...,
  // exact over the table's q range.
  int power2 = static_cast<int>((217706 * q) >> 16) + 63 - lz + upperbit;
  if (power2 <= -1022) return false;  // subnormal/underflow: strtod handles
  if (power2 > 1023) return false;    // overflow: strtod yields inf
  // Round-to-even halfway ambiguity (published algorithm's condition):
  // only q in [-4, 23] can produce a value exactly between two doubles,
  // signalled by an all-zero tail below the round bit. Defer to strtod.
  if (lo <= 1 && q >= -4 && q <= 23 && (mantissa & 3) == 1
      && (mantissa << (upperbit + 9)) == hi) {
    return false;
  }
  mantissa += mantissa & 1;  // round half up (ambiguous cases deferred)
  mantissa >>= 1;
  if (mantissa >= (1ULL << 53)) {
    mantissa = 1ULL << 52;
    ++power2;
    if (power2 > 1023) return false;
  }
  mantissa &= (1ULL << 52) - 1;
  uint64_t bits = mantissa | (static_cast<uint64_t>(power2 + 1023) << 52);
  memcpy(out, &bits, sizeof(double));
  return true;
}

// Parse one decimal number in [p, line_end). Advances *pp past the number.
// Bit-identical to strtod on the same token (fast path certifies its
// rounding or defers to strtod). Returns false if no number was parsed.
inline bool parse_value(const char** pp, const char* line_end, double* out) {
  const char* p = *pp;
  const char* start = p;
  bool neg = false;
  if (p < line_end && (*p == '-' || *p == '+')) {
    neg = (*p == '-');
    ++p;
  }
  uint64_t mant = 0;
  int digits = 0;        // significant digits accumulated in mant
  int64_t exp10 = 0;
  bool truncated = false;
  bool any = false;
  while (p < line_end && *p >= '0' && *p <= '9') {
    any = true;
    if (digits < 19) {
      mant = mant * 10 + static_cast<uint64_t>(*p - '0');
      if (mant) ++digits;  // leading zeros are free
    } else {
      truncated = true;
      ++exp10;  // dropped integer digit shifts the exponent up
    }
    ++p;
  }
  if (p < line_end && *p == '.') {
    ++p;
    // SWAR: consume 8 fraction digits at a time while they fit in the
    // 19-significant-digit budget (the scalar loop finishes the tail).
    // digits may overcount past leading zeros — that only makes the
    // truncation cutoff conservative, never wrong (truncated values are
    // certified by double-rounding or fall back to strtod). Loads stay
    // inside [p, line_end], which parse_file's buffer fully contains.
    while (line_end - p >= 8 && digits <= 11) {
      uint64_t chunk;
      memcpy(&chunk, p, 8);
      if (!eight_digits(chunk)) break;
      mant = mant * 100000000ULL + parse_eight_digits(chunk);
      if (mant) digits += 8;
      exp10 -= 8;
      any = true;
      p += 8;
    }
    while (p < line_end && *p >= '0' && *p <= '9') {
      any = true;
      if (digits < 19) {
        mant = mant * 10 + static_cast<uint64_t>(*p - '0');
        if (mant) ++digits;
        --exp10;
      } else {
        truncated = true;  // dropped fraction digit: exponent unchanged
      }
      ++p;
    }
  }
  // hex floats ("0x10", "0x1.8p3"): the decimal scan above consumed the
  // leading 0 and would mis-stop at 'x'; strtod owns hex syntax. !any
  // covers inf/nan/garbage — both defer to the shared strtod tail below.
  bool hexlike = (mant == 0 && !truncated && p < line_end
                  && (*p == 'x' || *p == 'X'));
  double v;
  if (any && !hexlike) {
    if (p < line_end && (*p == 'e' || *p == 'E')) {
      const char* ep = p + 1;
      bool eneg = false;
      if (ep < line_end && (*ep == '-' || *ep == '+')) {
        eneg = (*ep == '-');
        ++ep;
      }
      if (ep < line_end && *ep >= '0' && *ep <= '9') {
        int64_t e = 0;
        while (ep < line_end && *ep >= '0' && *ep <= '9') {
          if (e < 10000) e = e * 10 + (*ep - '0');
          ++ep;
        }
        exp10 += eneg ? -e : e;
        p = ep;
      }
      // trailing bare 'e' is not part of the number (strtod semantics)
    }
    if (mant == 0) {
      *out = neg ? -0.0 : 0.0;
      *pp = p;
      return true;
    }
    if (!truncated) {
      // Clinger fast path: both mant and 10^|exp10| exactly representable
      // — one IEEE multiply/divide is correctly rounded.
      static const double kPow10[] = {1e0,  1e1,  1e2,  1e3,  1e4,  1e5,
                                      1e6,  1e7,  1e8,  1e9,  1e10, 1e11,
                                      1e12, 1e13, 1e14, 1e15, 1e16, 1e17,
                                      1e18, 1e19, 1e20, 1e21, 1e22};
      if (mant < (1ULL << 53) && exp10 >= -22 && exp10 <= 22) {
        v = static_cast<double>(mant);
        v = exp10 < 0 ? v / kPow10[-exp10] : v * kPow10[exp10];
        *out = neg ? -v : v;
        *pp = p;
        return true;
      }
      if (eisel_lemire(mant, exp10, &v)) {
        *out = neg ? -v : v;
        *pp = p;
        return true;
      }
    } else {
      // 20+ significant digits: try both truncated and truncated+1 — when
      // they round to the SAME double the dropped tail cannot matter.
      double v2;
      if (eisel_lemire(mant, exp10, &v)
          && eisel_lemire(mant + 1, exp10, &v2) && v == v2) {
        *out = neg ? -v : v;
        *pp = p;
        return true;
      }
    }
  }
  // shared slow path: strtod needs a NUL-terminated buffer, which
  // parse_file guarantees; forced C locale (see strtod_c)
  char* after = nullptr;
  v = strtod_c(start, &after);
  if (after == start || after > line_end) return false;
  *out = v;
  *pp = after;
  return true;
}

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
                int64_t row_bytes_hint, std::vector<int64_t>* clips,
                std::vector<double>* values, bool* ok) {
  *ok = true;
  if (row_bytes_hint > 0) {
    // estimate rows from the first row's byte length, capped by the hard
    // floor of 2 bytes/value ("0,") so a compact first row cannot
    // over-reserve multi-GB buffers on files whose later rows are long
    int64_t est = (end - begin) / row_bytes_hint + 2;
    int64_t cap = (end - begin) / (2 * dim) + 2;
    est = est < cap ? est : cap;
    clips->reserve(est);
    values->reserve(est * dim);
  }
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
        double v;
        if (!parse_value(&q, line_end, &v)) {
          *ok = false;
          return;
        }
        values->push_back(v);
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
      parse_rows(starts[t], starts[t + 1], dim,
                 static_cast<int64_t>(first_end - first) + 1, &tclips[t],
                 &tvals[t], &ok);
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
